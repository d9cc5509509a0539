"""HO3D dataset reader (host side).

Parity: /root/reference/datasets/HO3D_dataset.py. Decodes the 2-channel PNG
depth encoding (read_depth_img :38-45), back-projects to a camera-frame cloud
with the y/z sign flip (:66-86, :104-105), splits hand/object by the RGB seg
mask (:98-111), rejects outliers by radius around the object translation /
middle-finger MCP (:163-170), and reads sequence segments from the
finalv2_test_<cat>.npy split dicts (:265-281). All downsampling/jitter/MANO
runs on device (pipeline.prepare_batch with template_with_theta=True).
"""

from __future__ import annotations

import os
import pickle
from os.path import join as pjoin

import numpy as np

from .schema import (PRESUBSAMPLE_FACTOR, RawFrame, empty_frame,
                     frame_rng, pad_points)

HEIGHT, WIDTH = 480, 640
DEPTH_SCALE = 0.00012498664727900177  # (HO3D_dataset.py:41)
# annotation joints -> 21-kp convention (HO3D_dataset.py:158)
KP_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20)


def read_depth_img(path: str) -> np.ndarray:
    """Decode HO3D's depth PNG: depth = (B + G*256) * scale
    (HO3D_dataset.py:38-45)."""
    import cv2
    img = cv2.imread(path)
    return (img[:, :, 2] + img[:, :, 1] * 256) * DEPTH_SCALE


def get_intrinsics(path: str) -> np.ndarray:
    """Parse fx/fy/ppx/ppy from a calibration line (HO3D_dataset.py:47-63)."""
    with open(path, "r") as f:
        items = f.readline().strip().split(",")
    vals = {}
    for item in items:
        for key in ("fx", "fy", "ppx", "ppy"):
            if key in item:
                vals[key] = float(item.split(":")[1].strip())
    return np.array([[vals["fx"], 0, vals["ppx"]],
                     [0, vals["fy"], vals["ppy"]], [0, 0, 1]])


def depth_to_cloud(dpt: np.ndarray, k: np.ndarray):
    """Back-project depth -> camera cloud; returns (cld (M,3), choose (M,))
    (dpt_2_cld, HO3D_dataset.py:66-86: note x from column index vs cx/fx,
    y from row index vs cy/fy)."""
    if dpt.ndim > 2:
        dpt = dpt[:, :, 0]
    mask = dpt > 1e-6
    choose = mask.flatten().nonzero()[0]
    if len(choose) < 1:
        return None, None
    rows, cols = np.divmod(choose, dpt.shape[1])
    z = dpt.flatten()[choose].astype(np.float32)
    x = (cols.astype(np.float32) - k[0][2]) * z / k[0][0]
    y = (rows.astype(np.float32) - k[1][2]) * z / k[1][1]
    return np.stack([x, y, z], axis=1), choose


def _rodrigues(rvec: np.ndarray) -> np.ndarray:
    angle = np.linalg.norm(rvec)
    if angle < 1e-12:
        return np.eye(3)
    axis = np.asarray(rvec).reshape(3) / angle
    k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


class HO3DDataset:
    """Indexable host reader -> (RawFrame, meta). Exposes `seq_start` so
    SequenceData groups frames by annotated segments (HO3D_dataset.py:273-281).
    """

    def __init__(self, cfg, mode: str):
        self.cfg = cfg
        self.root = cfg["data_cfg"]["basepath"]
        self.num_points = cfg["num_points"]
        self.budget = PRESUBSAMPLE_FACTOR * self.num_points
        self.load_pred_obj_pose = cfg.get("use_pred_obj_pose", False)
        self.pred_obj_pose_dir = cfg.get("pred_obj_pose_dir")
        self.seed = cfg.get("seed", 0)  # per-frame RNGs: thread-safe + order-deterministic
        # presample: fresh -> redraw the 5*num_points presubsample every
        # draw (the reference GPU pipeline's per-epoch augmentation)
        self.fresh_presample = cfg.get("presample") == "fresh"

        self.seq_lst, self.fid_lst, self.start_frame_lst = [], [], []
        self.seq_start = []
        test_data = {}
        for category in cfg["obj_category"]:
            split_pth = pjoin(self.root, "splits", f"finalv2_test_{category}.npy")
            test_data.update(np.load(split_pth, allow_pickle=True).item())
        for seq, segments in test_data.items():
            for segment, idx_lst in segments.items():
                self.seq_start.append(len(self.fid_lst))
                self.seq_lst.extend([seq] * len(idx_lst))
                self.fid_lst.extend(idx_lst)
                self.start_frame_lst.extend([idx_lst[0]] * len(idx_lst))
        print(f"HO3D mode {mode}: {len(self.fid_lst)} frames")

    def __len__(self):
        return len(self.fid_lst)

    def _anno(self, seq: str, fid: str) -> dict:
        with open(pjoin(self.root, f"train/{seq}/meta/{fid}.pkl"), "rb") as f:
            return pickle.load(f, encoding="latin1")

    def _clouds(self, seq: str, fid: str):
        """(hand_pcld, obj_pcld, camMat, anno) (HO3D_dataset.py:88-112).

        Uses the native fused decode/backproject/split when available
        (hotrack_tpu/native): one pass over the image instead of the
        reference's decode -> full-frame cloud -> mask-gather pipeline."""
        import cv2
        from .. import native
        anno = self._anno(seq, fid)
        if seq[-2].isnumeric():
            calib = pjoin(self.root, "calibration", seq[:-1], "calibration",
                          f"cam_{seq[-1]}_intrinsics.txt")
            k = get_intrinsics(calib).tolist()
        else:
            k = anno["camMat"]
        depth_img = cv2.imread(pjoin(self.root, f"train/{seq}/depth/{fid}.png"))
        depth = native.decode_ho3d_depth(depth_img, DEPTH_SCALE)
        mask = cv2.imread(pjoin(self.root, f"train/{seq}/seg/{fid}.png"))
        mask = cv2.resize(mask, (WIDTH, HEIGHT),
                          interpolation=cv2.INTER_NEAREST)
        fx, fy = k[0][0], k[1][1]
        cx, cy = k[0][2], k[1][2]
        hand_mask = (mask[:, :, 0] == 255).astype("uint8")
        obj_mask = (mask[:, :, 1] == 255).astype("uint8")
        # sign flips y/z like the reference (HO3D_dataset.py:104-105)
        hand = native.backproject_filter(depth, hand_mask, 1, fx, fy, cx, cy,
                                         sign_y=-1.0, sign_z=-1.0)
        obj = native.backproject_filter(depth, obj_mask, 1, fx, fy, cx, cy,
                                        sign_y=-1.0, sign_z=-1.0)
        return hand, obj, k, anno

    def _load_pred_obj_pose(self, seq, start_frame, cur_frame):
        pkl = pjoin(self.pred_obj_pose_dir,
                    "%s_%04d.pkl" % (seq.replace("/", "_"), start_frame))
        with open(pkl, "rb") as f:
            pred = pickle.load(f)
        pose = pred["pred_obj_poses"][cur_frame - start_frame]
        return (np.asarray(pose["rotation"], np.float32).reshape(3, 3),
                np.asarray(pose["translation"], np.float32).reshape(3, 1))

    def __getitem__(self, index: int):
        seq = self.seq_lst[index]
        fid = "%04d" % self.fid_lst[index]
        meta = {"file_name": f"{seq}/{fid}", "category": None, "path": None}
        try:
            hand, obj, k, anno = self._clouds(seq, fid)
        except Exception as e:  # missing/corrupt frame -> repairable invalid
            print(f"HO3D frame {seq}/{fid} failed: {e}")
            return empty_frame(self.budget), meta
        meta["category"] = anno["objName"]
        if hand is None or len(hand) == 0 or obj is None or len(obj) == 0:
            return empty_frame(self.budget), meta

        obj_rot = _rodrigues(np.asarray(anno["objRot"]).reshape(3))
        obj_trans = np.asarray(anno["objTrans"], np.float32).reshape(3, 1)
        kp = np.asarray(anno["handJoints3D"], np.float32)[list(KP_REORDER)]

        # outlier rejection by radius (HO3D_dataset.py:163-170)
        obj = obj[np.linalg.norm(obj - obj_trans.T, axis=-1) < 0.25]
        hand = hand[np.linalg.norm(hand - kp[9], axis=-1) < 0.15]
        if len(hand) == 0 or len(obj) == 0:
            return empty_frame(self.budget), meta

        rng = frame_rng(self.seed, index, self.fresh_presample)
        hand_pts, hand_valid = pad_points(hand.astype(np.float32),
                                          self.budget, rng)
        obj_pts, obj_valid = pad_points(obj.astype(np.float32),
                                        self.budget, rng)

        # object scale from SDF normalization (HO3D_dataset.py:138-139)
        scale = np.float32(1.0)
        scale_pth = pjoin(self.root, "../YCB/SDF/NormalizationParameters",
                          anno["objName"], "textured_simple.npz")
        if os.path.exists(scale_pth):
            scale = np.float32(2.0 / np.load(scale_pth)["scale"][0])

        pred_r, pred_t = np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)
        if self.load_pred_obj_pose and self.pred_obj_pose_dir:
            pred_r, pred_t = self._load_pred_obj_pose(
                seq, self.start_frame_lst[index], self.fid_lst[index])

        cam_fx, cam_fy = k[0][0], k[1][1]
        cam_cx, cam_cy = k[0][2], k[1][2]
        return RawFrame(
            hand_points=hand_pts, hand_valid=hand_valid,
            obj_points=obj_pts, obj_valid=obj_valid,
            mano_pose=np.asarray(anno["handPose"], np.float32).reshape(48),
            mano_trans=np.asarray(anno["handTrans"], np.float32).reshape(3),
            mano_beta=np.asarray(anno["handBeta"], np.float32).reshape(10),
            obj_rotation=obj_rot.astype(np.float32),
            obj_translation=obj_trans,
            obj_scale=scale,
            pred_obj_rotation=pred_r, pred_obj_translation=pred_t,
            # fx negated like the reference projection dict (HO3D_dataset.py:220)
            projection=np.array([-cam_fx, cam_fy, cam_cx, cam_cy,
                                 WIDTH, HEIGHT], np.float32),
            valid=np.bool_(True),
            annot_hand_kp=kp,
            annot_palm_template=np.zeros((6, 3), np.float32),
            has_annot_kp=np.bool_(True),
        ), meta
