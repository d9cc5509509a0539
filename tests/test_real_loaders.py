"""Fixture-driven tests for the HO3D and DexYCB readers.

Real assets are absent in this environment, so these tests synthesize tiny
on-disk dataset trees in the exact file formats the readers consume (HO3D's
R+G*256 depth PNGs, BGR seg masks, latin1 meta pkls, finalv2 split npys;
DexYCB's 16-bit depth PNGs, labels_*.npz, meta.yml, calibration ymls, split
npys) and drive reader -> SequenceData -> prepare_batch -> a HandTrackNet
forward through them. The HO3D decode/backproject/split path is additionally
cross-checked bit-for-bit against the reference's own `load_point_clouds`
(/root/reference/datasets/HO3D_dataset.py:89-112).
"""

import os
import pickle
from os.path import join as pjoin

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from hotrack_tpu.mano.layer import mano_forward
from hotrack_tpu.mano.model import synthetic_mano_model

FX = FY = 600.0
CX, CY = 320.0, 240.0
DEPTH_SCALE = 0.00012498664727900177

# pixel blobs (rows, cols, depth m) for the two scene parts
HAND_BLOB = (slice(200, 260), slice(380, 440), 0.45)
OBJ_BLOB = (slice(210, 250), slice(280, 330), 0.5)


def _blob_cloud(blob, flip=False, stride=1, quant=DEPTH_SCALE):
    """Expected camera-frame points of a pixel blob (row-major order).
    `quant` is the on-disk depth quantum (HO3D: DEPTH_SCALE counts;
    DexYCB: 1 mm)."""
    rs, cs, z = blob
    rows = np.arange(rs.start, rs.stop)
    cols = np.arange(cs.start, cs.stop)
    if stride > 1:
        rows = rows[(rows % stride) == 0]
        cols = cols[(cols % stride) == 0]
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    # quantize depth exactly like the png encoding round-trip
    zq = np.full(rr.shape, np.float32(round(z / quant) * quant), np.float32)
    x = (cc - CX) * zq / FX
    y = (rr - CY) * zq / FY
    pts = np.stack([x, y, zq], -1).reshape(-1, 3)
    if flip:
        pts[:, 1] *= -1
        pts[:, 2] *= -1
    return pts.astype(np.float32)


# ------------------------------------------------------------------- HO3D

def _make_ho3d_tree(root, mano, seqs=("ABF10", "BOXY"), n_frames=3):
    """Two sequences: 'ABF10' exercises the calibration-file intrinsics path
    (seq[-2] numeric, HO3D_dataset.py:94-96), 'BOXY' the anno camMat path."""
    import cv2

    from hotrack_tpu.data.ho3d import KP_REORDER

    cam_mat = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    inv_reorder = np.argsort(np.asarray(KP_REORDER))

    # depth png: counts = z / scale, R = low byte, G = high byte (BGR on disk)
    depth = np.zeros((480, 640), np.int32)
    for rs, cs, z in (HAND_BLOB, OBJ_BLOB):
        depth[rs, cs] = int(round(z / DEPTH_SCALE))
    depth_img = np.zeros((480, 640, 3), np.uint8)
    depth_img[:, :, 2] = depth % 256
    depth_img[:, :, 1] = depth // 256

    seg = np.zeros((480, 640, 3), np.uint8)
    seg[HAND_BLOB[0], HAND_BLOB[1], 0] = 255   # hand = blue channel
    seg[OBJ_BLOB[0], OBJ_BLOB[1], 1] = 255     # obj = green channel

    obj_cloud = _blob_cloud(OBJ_BLOB, flip=True)
    obj_trans = obj_cloud.mean(0)
    hand_center = _blob_cloud(HAND_BLOB, flip=True).mean(0)

    rng = np.random.RandomState(0)
    for seq in seqs:
        for d in ("depth", "seg", "meta"):
            os.makedirs(pjoin(root, "train", seq, d), exist_ok=True)
        for fid in range(n_frames):
            name = "%04d" % fid
            cv2.imwrite(pjoin(root, "train", seq, "depth", name + ".png"),
                        depth_img)
            cv2.imwrite(pjoin(root, "train", seq, "seg", name + ".png"), seg)

            pose = (rng.randn(48) * 0.1).astype(np.float64)
            beta = (rng.randn(10) * 0.3).astype(np.float64)
            _, kp21 = mano_forward(mano, jnp.asarray(pose, jnp.float32)[None],
                                   betas=jnp.asarray(beta, jnp.float32)[None],
                                   trans=jnp.asarray(hand_center)[None],
                                   original_version=True)
            anno = {
                "camMat": cam_mat,
                "objName": "box",
                "objRot": (rng.randn(3, 1) * 0.2),
                "objTrans": obj_trans.astype(np.float64),
                "handJoints3D": np.asarray(kp21[0])[inv_reorder],
                "handPose": pose, "handTrans": hand_center.astype(np.float64),
                "handBeta": beta,
            }
            with open(pjoin(root, "train", seq, "meta", name + ".pkl"), "wb") as f:
                pickle.dump(anno, f)

    calib_dir = pjoin(root, "calibration", "ABF1", "calibration")
    os.makedirs(calib_dir, exist_ok=True)
    with open(pjoin(calib_dir, "cam_0_intrinsics.txt"), "w") as f:
        f.write(f"fx: {FX}, fy: {FY}, ppx: {CX}, ppy: {CY}\n")

    os.makedirs(pjoin(root, "splits"), exist_ok=True)
    np.save(pjoin(root, "splits", "finalv2_test_box.npy"),
            {seq: {0: list(range(n_frames))} for seq in seqs})

    # YCB SDF normalization (HO3D_dataset.py:138-139 loads it relative to
    # basepath/../): scale=2.0 -> obj_scale = 2/scale = 1.0, the same value
    # the readers default to when the npz is absent
    ycb = pjoin(root, "..", "YCB", "SDF", "NormalizationParameters", "box")
    os.makedirs(ycb, exist_ok=True)
    np.savez(pjoin(ycb, "textured_simple.npz"), scale=np.array([2.0]))


@pytest.fixture(scope="module")
def ho3d_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ho3d_root"))
    mano = synthetic_mano_model()
    _make_ho3d_tree(root, mano)
    cfg = {"data_cfg": {"basepath": root, "dataset_name": "HO3D"},
           "num_points": 64, "obj_category": ["box"]}
    return cfg, mano, root


def test_ho3d_reader_geometry(ho3d_env):
    from hotrack_tpu.data.ho3d import HO3DDataset, KP_REORDER

    cfg, mano, root = ho3d_env
    ds = HO3DDataset(cfg, "test")
    assert len(ds) == 6 and ds.seq_start == [0, 3]

    for index in (0, 3):  # one frame of each sequence (both intrinsics paths)
        frame, meta = ds[index]
        assert bool(frame.valid) and meta["category"] == "box"
        hand = frame.hand_points[frame.hand_valid]
        obj = frame.obj_points[frame.obj_valid]
        want_hand = _blob_cloud(HAND_BLOB, flip=True)
        want_obj = _blob_cloud(OBJ_BLOB, flip=True)
        # the reader permutes and presubsamples to the 5x budget; every
        # surviving point must be one of the blob's back-projections
        assert hand.shape[0] == min(len(want_hand), 5 * cfg["num_points"])
        assert obj.shape[0] == min(len(want_obj), 5 * cfg["num_points"])
        d = np.abs(hand[:, None] - want_hand[None]).sum(-1).min(1)
        assert d.max() < 1e-6
        d = np.abs(obj[:, None] - want_obj[None]).sum(-1).min(1)
        assert d.max() < 1e-6

        # annotation plumbing: kp reorder, mano fields, flipped-fx projection
        with open(pjoin(root, "train", ds.seq_lst[index], "meta",
                        "%04d.pkl" % ds.fid_lst[index]), "rb") as f:
            anno = pickle.load(f, encoding="latin1")
        np.testing.assert_allclose(
            frame.annot_hand_kp, anno["handJoints3D"][list(KP_REORDER)],
            atol=1e-6)
        np.testing.assert_allclose(frame.mano_pose, anno["handPose"], atol=1e-6)
        np.testing.assert_allclose(frame.projection,
                                   [-FX, FY, CX, CY, 640, 480], atol=1e-6)


def test_ho3d_decode_matches_reference(ho3d_env):
    """_clouds (native fused decode path) vs the reference's own
    load_point_clouds: identical clouds, order included."""
    from reference_loader import reference_module

    from hotrack_tpu.data.ho3d import HO3DDataset

    cfg, _, root = ho3d_env
    ref_ho3d = reference_module("HO3D_dataset")

    # the reference's decode (`img[:,:,2] + img[:,:,1] * 256` on uint8,
    # HO3D_dataset.py:43) relies on numpy 1.x value-based promotion to int16;
    # numpy 2 raises OverflowError. Substitute the numerically identical
    # widened form so the reference path runs under the installed numpy.
    def _read_depth_img(path):
        import cv2
        img = cv2.imread(path)
        return (img[:, :, 2].astype(np.int32)
                + img[:, :, 1].astype(np.int32) * 256) * 0.00012498664727900177

    ref_ho3d.read_depth_img = _read_depth_img

    ds = HO3DDataset(cfg, "test")
    for seq in ("ABF10", "BOXY"):
        hand, obj, k, anno = ds._clouds(seq, "0000")
        ref_hand, ref_obj, ref_k, _ = ref_ho3d.load_point_clouds(
            root, seq, "0000")
        np.testing.assert_allclose(hand, ref_hand, atol=1e-6)
        np.testing.assert_allclose(obj, ref_obj, atol=1e-6)
        np.testing.assert_allclose(np.asarray(k), np.asarray(ref_k), atol=1e-9)


def test_ho3d_pred_obj_pose_pickles(ho3d_env, tmp_path):
    """use_pred_obj_pose consumption: the objopt stage's trajectory pickles
    feed the hand stage (HO3D_dataset.py:223-234)."""
    from hotrack_tpu.data.ho3d import HO3DDataset

    cfg, _, root = ho3d_env
    rng = np.random.RandomState(1)
    poses = [{"rotation": np.linalg.qr(rng.randn(3, 3))[0],
              "translation": rng.randn(3, 1) * 0.1} for _ in range(3)]
    for seq in ("ABF10", "BOXY"):
        with open(tmp_path / ("%s_0000.pkl" % seq), "wb") as f:
            pickle.dump({"pred_obj_poses": poses}, f)

    cfg2 = dict(cfg, use_pred_obj_pose=True, pred_obj_pose_dir=str(tmp_path))
    ds = HO3DDataset(cfg2, "test")
    frame, _ = ds[1]  # frame 1 of ABF10 -> poses[1]
    np.testing.assert_allclose(frame.pred_obj_rotation,
                               poses[1]["rotation"].astype(np.float32))
    np.testing.assert_allclose(frame.pred_obj_translation,
                               poses[1]["translation"].astype(np.float32))


def test_ho3d_sequence_to_tracking_step(ho3d_env):
    """SequenceData grouping by annotated segments -> prepare_batch
    (template_with_theta) -> one HandTrackNet forward."""
    from hotrack_tpu.data import SequenceData, prepare_batch
    from hotrack_tpu.data.ho3d import HO3DDataset
    from hotrack_tpu.models import HandTrackNet
    from hotrack_tpu.models.hand_utils import handkp2palmkp

    cfg, mano, _ = ho3d_env
    seq_data = SequenceData(HO3DDataset(cfg, "test"))
    assert len(seq_data) == 2
    raw, metas = seq_data[0]
    assert raw.hand_points.shape[0] == 3 and len(metas) == 3

    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, raw),
                          jax.random.PRNGKey(0), 64,
                          template_with_theta=True)
    # annotated keypoints win over the MANO-derived ones (has_annot_kp)
    np.testing.assert_allclose(np.asarray(batch["gt_hand_kp"]),
                               raw.annot_hand_kp, atol=1e-6)
    # rest template keeps finger pose, zeroes global rot (HO3D_dataset.py:186-191)
    tpl_pose = jnp.asarray(raw.mano_pose).at[:, :3].set(0.0)
    _, tpl_kp = mano_forward(mano, tpl_pose, betas=jnp.asarray(raw.mano_beta))
    np.testing.assert_allclose(
        np.asarray(batch["gt_hand_pose"]["palm_template"]),
        np.asarray(handkp2palmkp(tpl_kp)), atol=1e-5)

    net_cfg = {"sa1": {"npoint": 32, "radius_list": [0.1], "nsample_list": [8],
                       "mlp_list": [[16, 16, 32]]},
               "sa2": {"npoint": 16, "radius_list": [0.2], "nsample_list": [8],
                       "mlp_list": [[32, 32, 64]]},
               "sa3": {"mlp": [64, 64, 96]}, "fp3": {"mlp": [64, 64]},
               "fp2": {"mlp": [64, 64]}, "fp1": {"mlp": [64, 64]}}
    model = HandTrackNet(net_cfg=net_cfg, backbone_out_dim=48, handframe="kp")
    variables = model.init(jax.random.PRNGKey(0), batch["hand_points"],
                           batch["jittered_hand_kp"],
                           batch["gt_hand_pose"]["palm_template"])
    out = model.apply(variables, batch["hand_points"],
                      batch["jittered_hand_kp"],
                      batch["gt_hand_pose"]["palm_template"],
                      valid_mask=batch["hand_valid"])
    assert out["pred_kp"].shape == (3, 21, 3)
    assert bool(jnp.all(jnp.isfinite(out["pred_kp"])))


# ------------------------------------------------------------------- DexYCB

def _make_dexycb_tree(root, mano, n_frames=3):
    from PIL import Image

    subject, scene, serial = "20200709-subject-01", "20200709_141754", "836212060125"
    seq = f"{subject}+{scene}+{serial}"
    seq_dir = pjoin(root, subject, scene, serial)
    os.makedirs(seq_dir, exist_ok=True)

    depth = np.zeros((480, 640), np.uint16)
    for rs, cs, z in (HAND_BLOB, OBJ_BLOB):
        depth[rs, cs] = int(round(z * 1000))
    seg = np.zeros((480, 640), np.uint8)
    seg[HAND_BLOB[0], HAND_BLOB[1]] = 255  # hand label
    seg[OBJ_BLOB[0], OBJ_BLOB[1]] = 13     # 024_bowl ycb id

    obj_trans = _blob_cloud(OBJ_BLOB, stride=2, quant=1e-3).mean(0)
    hand_center = _blob_cloud(HAND_BLOB, stride=2, quant=1e-3).mean(0)

    rng = np.random.RandomState(2)
    comps = np.asarray(mano.hands_components)
    for fid in range(n_frames):
        Image.fromarray(depth).save(
            pjoin(seq_dir, "aligned_depth_to_color_%06d.png" % fid))
        pose_y = np.zeros((2, 3, 4), np.float32)
        pose_y[1, :, :3] = np.linalg.qr(rng.randn(3, 3))[0]
        pose_y[1, :, 3] = obj_trans
        pca = (rng.randn(45) * 0.1).astype(np.float32)
        pose_m = np.zeros((1, 51), np.float32)
        pose_m[0, :3] = rng.randn(3) * 0.1
        pose_m[0, 3:48] = pca
        pose_m[0, 48:51] = hand_center
        np.savez(pjoin(seq_dir, "labels_%06d.npz" % fid), seg=seg,
                 pose_y=pose_y, pose_m=pose_m)
    del comps

    with open(pjoin(root, subject, scene, "meta.yml"), "w") as f:
        yaml.safe_dump({"ycb_ids": [3, 13], "ycb_grasp_ind": 1,
                        "mano_calib": ["subject-01"]}, f)
    os.makedirs(pjoin(root, "calibration", "intrinsics"), exist_ok=True)
    with open(pjoin(root, "calibration", "intrinsics",
                    f"{serial}_640x480.yml"), "w") as f:
        yaml.safe_dump({"color": {"fx": FX, "fy": FY, "ppx": CX, "ppy": CY}}, f)
    os.makedirs(pjoin(root, "calibration", "mano_subject-01"), exist_ok=True)
    with open(pjoin(root, "calibration", "mano_subject-01", "mano.yml"), "w") as f:
        yaml.safe_dump({"betas": (np.arange(10) * 0.01).tolist()}, f)
    os.makedirs(pjoin(root, "splits"), exist_ok=True)
    np.save(pjoin(root, "splits", "test_bowl.npy"),
            {seq: ["%06d.jpg" % i for i in range(n_frames)]})

    # YCB SDF normalization (DexYCB_dataset.py:132-134): scale=2.0 keeps the
    # effective obj_scale at the readers' default 1.0 (radius filter 0.5)
    ycb = pjoin(root, "..", "YCB", "SDF", "NormalizationParameters", "024_bowl")
    os.makedirs(ycb, exist_ok=True)
    np.savez(pjoin(ycb, "textured_simple.npz"), scale=np.array([2.0]))
    return seq


@pytest.fixture(scope="module")
def dexycb_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dexycb_root"))
    mano = synthetic_mano_model()
    seq = _make_dexycb_tree(root, mano)
    cfg = {"data_cfg": {"basepath": root, "dataset_name": "DexYCB"},
           "num_points": 64, "obj_category": ["bowl"]}
    return cfg, mano, root, seq


def test_dexycb_reader_geometry(dexycb_env):
    from hotrack_tpu.data.dexycb import DexYCBDataset, pca_pose_to_axisangle

    cfg, mano, root, seq = dexycb_env
    ds = DexYCBDataset(cfg, "test")
    assert len(ds) == 3 and ds.seq_start == [0]

    frame, meta = ds[0]
    assert bool(frame.valid) and meta["category"] == "024_bowl"
    # stride-2 back-projection of the labeled blobs, radius filters pass
    hand = frame.hand_points[frame.hand_valid]
    want_hand = _blob_cloud(HAND_BLOB, stride=2, quant=1e-3)
    assert hand.shape[0] == min(len(want_hand), 5 * cfg["num_points"])
    d = np.abs(hand[:, None] - want_hand[None]).sum(-1).min(1)
    assert d.max() < 1e-6
    # obj cloud is radius-filtered around pose_y translation at scale/2=0.5
    want_obj = _blob_cloud(OBJ_BLOB, stride=2, quant=1e-3)
    assert frame.obj_valid.sum() == min(len(want_obj), 5 * cfg["num_points"])

    # PCA -> axis-angle conversion with the rig's true components
    anno = np.load(pjoin(root, seq.replace("+", "/"), "labels_000000.npz"))
    pose_m = anno["pose_m"][0]
    want_pose = pca_pose_to_axisangle(mano, pose_m[:48])
    np.testing.assert_allclose(frame.mano_pose, want_pose, atol=1e-6)
    np.testing.assert_allclose(
        frame.mano_pose[3:],
        np.asarray(mano.hands_mean) + pose_m[3:48] @ np.asarray(mano.hands_components),
        atol=1e-5)
    np.testing.assert_allclose(frame.mano_beta, np.arange(10) * 0.01, atol=1e-6)
    np.testing.assert_allclose(frame.obj_translation[:, 0],
                               anno["pose_y"][1][:, 3], atol=1e-6)


def test_dexycb_blacklist_and_sequence(dexycb_env, tmp_path):
    """Blacklisted sequences are dropped; SequenceData drives prepare_batch."""
    from hotrack_tpu.data import SequenceData, prepare_batch
    from hotrack_tpu.data.dexycb import INVALID_SEQUENCES, DexYCBDataset

    cfg, mano, root, seq = dexycb_env
    # add a blacklisted sequence to the split: it must be skipped entirely
    bad = "20200820-subject-03+20200820_143206+839512060362"
    assert bad in INVALID_SEQUENCES
    split = {seq: ["%06d.jpg" % i for i in range(3)], bad: ["000000.jpg"]}
    np.save(pjoin(root, "splits", "test_bowl.npy"), split)
    ds = DexYCBDataset(cfg, "test")
    assert len(ds) == 3

    raw, metas = SequenceData(ds)[0]
    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, raw),
                          jax.random.PRNGKey(0), 64, template_with_theta=True)
    assert batch["hand_points"].shape == (3, 64, 3)
    assert bool(jnp.all(jnp.isfinite(batch["gt_hand_kp"])))


def test_dexycb_bad_frame_repair(dexycb_env):
    """Pinned deviation from the reference: a corrupt frame yields an invalid
    RawFrame repaired by SequenceData with the nearest LATER good frame
    (dataset.py:86-99 semantics), instead of the reference DexYCB loader's
    retry-of-the-NEXT-INDEX inside __getitem__ (DexYCB_dataset.py:287-297).
    Both fill the slot with a neighboring frame; the repair path keeps the
    reader exception-free and the sequence length static."""
    from hotrack_tpu.data import SequenceData
    from hotrack_tpu.data.dexycb import DexYCBDataset

    cfg, _, root, seq = dexycb_env
    seq_dir = pjoin(root, seq.replace("+", "/"))
    npz1 = pjoin(seq_dir, "labels_000001.npz")
    good = open(npz1, "rb").read()
    try:
        with open(npz1, "wb") as f:
            f.write(b"corrupt")
        ds = DexYCBDataset(cfg, "test")
        frame1, _ = ds[1]
        assert not bool(frame1.valid)

        raw, _ = SequenceData(ds)[0]
        assert raw.hand_points.shape[0] == 3
        # slot 1 repaired with frame 2 (nearest later good frame)
        np.testing.assert_array_equal(raw.hand_points[1], raw.hand_points[2])
        np.testing.assert_array_equal(raw.mano_pose[1], raw.mano_pose[2])
    finally:
        with open(npz1, "wb") as f:
            f.write(good)


def test_simgrasp_format_consumed_by_reference_loader(tmp_path):
    """Format-compatibility both ways: the reference's own SimGrasp consumer
    (generate_shapenet_data, SimGrasp_dataset.py:38-147) reads the synthetic
    generator's npz files and produces the same annotations (gt kps, palm
    template, poses) as this package's reader + device prepare_batch.
    Clouds are not compared index-for-index: the reference's CPU FPS fallback
    degrades to random sampling (data_utils.py:246-249)."""
    import torch

    from reference_loader import reference_module, write_fake_mano_pkl

    from hotrack_tpu.data import prepare_batch, stack_frames
    from hotrack_tpu.data.simgrasp import SimGraspDataset
    from hotrack_tpu.data.synthetic import generate_simgrasp_dataset

    mano = synthetic_mano_model()
    root = str(tmp_path / "root")
    generate_simgrasp_dataset(root, num_instances=2, num_frames=3,
                              points_per_part=200, mano_model=mano)
    mano_dir = str(tmp_path / "mano")
    write_fake_mano_pkl(mano_dir, seed=0)

    sg = reference_module("SimGrasp_dataset")
    our_mano = reference_module("third_party.mano.our_mano")
    ref_layer = our_mano.OurManoLayer(side="right", mano_root=mano_dir)

    import glob
    npz = sorted(glob.glob(os.path.join(
        root, "SimGrasp", "preproc", "*", "seq", "*.npz")))
    assert npz, "synthetic generator produced no npz files"

    full = sg.generate_shapenet_data(
        npz[0], "bottle_sim", 1, 64,
        {"type": "normal", "s": 0.0, "t": 0.0, "r": 0.0},
        {"rand_scale": 0.0, "rand_type": "normal"},
        "cpu", "kp", ref_layer)
    assert full is not None

    from hotrack_tpu.config import get_config
    os.environ["HOTRACK_DATA_ROOT"] = root
    cfg = get_config({"config": "handtracknet_train_SimGrasp.yml",
                      "num_points": 64}, save=False)
    ds = SimGraspDataset(cfg, "train")
    # find the reader index matching the same npz file
    idx = next(i for i in range(len(ds))
               if ds[i][1]["path"] == npz[0])
    raw, meta = ds[idx]
    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, stack_frames([raw])),
                          jax.random.PRNGKey(0), 64)

    np.testing.assert_allclose(np.asarray(batch["gt_hand_kp"][0]),
                               np.asarray(full["gt_hand_kp"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(batch["gt_hand_pose"]["palm_template"][0]),
        np.asarray(full["gt_hand_pose"]["palm_template"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(batch["gt_obj_pose"]["rotation"][0]),
        np.asarray(full["gt_obj_pose"]["rotation"][0]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(batch["gt_obj_pose"]["translation"][0]),
        np.asarray(full["gt_obj_pose"]["translation"][0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(raw.mano_beta),
                               np.asarray(full["gt_hand_pose"]["mano_beta"]),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(batch["gt_hand_pose"]["rotation"][0]),
        np.asarray(full["gt_hand_pose"]["rotation"]), atol=1e-5)


# ------------------------------------------------- full-sample __getitem__

def _sorted_rows(pts):
    pts = np.asarray(pts, np.float32)
    return pts[np.lexsort(pts.T)]


def _zero_jitter():
    return ({"type": "normal", "s": 0, "t": 0, "r": 0},
            {"rand_scale": 0.0, "rand_type": "normal"})


def test_ho3d_full_sample_parity(tmp_path):
    """Every key of the reference's full_data (generate_HO3D_data,
    HO3D_dataset.py:131-240) vs this package's reader + prepare_batch on one
    fixture tree, with outlier pixels injected so the radius filters
    (HO3D_dataset.py:163-170) demonstrably bite: clouds compared as exact
    sets (the reference FPS is asked for >= the full filtered cloud, so its
    CPU 'sampling' — np.random.permutation[:n] — returns the whole set), and
    every annotation (kp reorder, rest-template-from-gt-theta palm template,
    rodrigues, SDF scale, projection, pred_obj_pose plumbing, sym flag)
    numerically."""
    import cv2
    import torch  # noqa: F401  (reference module needs it imported)

    from reference_loader import reference_module, write_fake_mano_pkl

    from hotrack_tpu.data import prepare_batch, stack_frames
    from hotrack_tpu.data.ho3d import HO3DDataset

    mano = synthetic_mano_model()
    root = str(tmp_path / "ho3d")
    _make_ho3d_tree(root, mano, seqs=("ABF10",), n_frames=1)

    # inject far outliers into both masks: a 20x20 hand-labeled blob and a
    # 20x20 obj-labeled blob at z=2.0 m, far outside the 0.15/0.25 radii
    dpth_pth = pjoin(root, "train", "ABF10", "depth", "0000.png")
    seg_pth = pjoin(root, "train", "ABF10", "seg", "0000.png")
    depth_img = cv2.imread(dpth_pth)
    seg = cv2.imread(seg_pth)
    far = int(round(2.0 / DEPTH_SCALE))
    for sl, ch in (((slice(0, 20), slice(0, 20)), 0),
                   ((slice(0, 20), slice(30, 50)), 1)):
        depth_img[sl[0], sl[1], 2] = far % 256
        depth_img[sl[0], sl[1], 1] = far // 256
        seg[sl[0], sl[1], ch] = 255
    cv2.imwrite(dpth_pth, depth_img)
    cv2.imwrite(seg_pth, seg)

    ref_ho3d = reference_module("HO3D_dataset")
    # numpy-2 uint8 promotion fix (see test_ho3d_decode_matches_reference)
    ref_ho3d.read_depth_img = lambda p: (
        (cv2.imread(p)[:, :, 2].astype(np.int32)
         + cv2.imread(p)[:, :, 1].astype(np.int32) * 256) * DEPTH_SCALE)

    mano_dir = str(tmp_path / "mano")
    write_fake_mano_pkl(mano_dir, seed=0)
    our_mano = reference_module("third_party.mano.our_mano")
    ref_layer = our_mano.OurManoLayer(side="right", mano_root=mano_dir)

    rng = np.random.RandomState(7)
    poses = [{"rotation": np.linalg.qr(rng.randn(3, 3))[0],
              "translation": rng.randn(3, 1) * 0.1}]
    pred_dir = tmp_path / "pred"
    pred_dir.mkdir()
    with open(pred_dir / "ABF10_0000.pkl", "wb") as f:
        pickle.dump({"pred_obj_poses": poses}, f)

    obj_jit, hand_jit = _zero_jitter()
    big = 4096
    full = ref_ho3d.generate_HO3D_data(
        ref_layer, root, "ABF10", "0000", big, obj_jit, hand_jit,
        "cpu", True, str(pred_dir), 0, 0)

    cfg = {"data_cfg": {"basepath": root, "dataset_name": "HO3D"},
           "num_points": big, "obj_category": ["box"],
           "use_pred_obj_pose": True, "pred_obj_pose_dir": str(pred_dir)}
    ds = HO3DDataset(cfg, "test")
    frame, meta = ds[0]
    assert bool(frame.valid)

    # ---- clouds through the radius filters, as exact sets ----
    hand_raw, obj_raw, _, _ = ds._clouds("ABF10", "0000")
    my_hand = np.asarray(frame.hand_points)[np.asarray(frame.hand_valid)]
    my_obj = np.asarray(frame.obj_points)[np.asarray(frame.obj_valid)]
    assert len(hand_raw) > len(my_hand), "hand outliers must be filtered"
    assert len(obj_raw) > len(my_obj), "obj outliers must be filtered"
    assert full["hand_points"].shape == my_hand.shape
    assert full["obj_points"].shape == my_obj.shape
    np.testing.assert_allclose(_sorted_rows(full["hand_points"]),
                               _sorted_rows(my_hand), atol=1e-6)
    np.testing.assert_allclose(_sorted_rows(full["obj_points"]),
                               _sorted_rows(my_obj), atol=1e-6)

    # ---- annotation assembly ----
    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, stack_frames([frame])),
                          jax.random.PRNGKey(0), 64, template_with_theta=True)
    np.testing.assert_allclose(np.asarray(batch["gt_hand_kp"][0]),
                               full["gt_hand_kp"], atol=1e-6)
    # zero jitter: both sides pass the gt through the jitter code unchanged
    np.testing.assert_array_equal(full["jittered_hand_kp"], full["gt_hand_kp"])
    np.testing.assert_allclose(np.asarray(batch["jittered_hand_kp"][0]),
                               np.asarray(batch["gt_hand_kp"][0]), atol=0)

    ghp, rhp = batch["gt_hand_pose"], full["gt_hand_pose"]
    np.testing.assert_allclose(np.asarray(ghp["translation"][0]).ravel(),
                               np.asarray(rhp["translation"]).ravel(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ghp["rotation"][0]),
                               np.asarray(rhp["rotation"]), atol=1e-5)
    assert abs(float(ghp["scale"][0]) - rhp["scale"]) < 1e-7 and rhp["scale"] == 0.2
    np.testing.assert_allclose(np.asarray(ghp["mano_pose"][0]),
                               rhp["mano_pose"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ghp["mano_trans"][0]),
                               rhp["mano_trans"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ghp["mano_beta"][0]),
                               rhp["mano_beta"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ghp["palm_template"][0]),
                               np.asarray(rhp["palm_template"]), atol=2e-5)

    gop, rop = batch["gt_obj_pose"], full["gt_obj_pose"]
    np.testing.assert_allclose(np.asarray(gop["rotation"][0]),
                               np.asarray(rop["rotation"]).reshape(3, 3),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gop["translation"][0]),
                               np.asarray(rop["translation"]).reshape(3, 1),
                               atol=1e-6)
    np.testing.assert_allclose(float(gop["scale"][0]),
                               float(np.asarray(rop["scale"]).ravel()[0]),
                               atol=1e-6)
    # up/down symmetry flag: reference hardcodes can/box (HO3D_dataset.py:236)
    cat = meta["category"]
    assert rop["up_and_down_sym"] == (("can" in cat) or ("box" in cat)) is True
    # zero obj jitter passes the pose through unchanged
    np.testing.assert_allclose(
        np.asarray(full["jittered_obj_pose"]["rotation"]).reshape(3, 3),
        np.asarray(rop["rotation"]).reshape(3, 3), atol=1e-6)
    jop = batch["jittered_obj_pose"]
    np.testing.assert_allclose(np.asarray(jop["rotation"][0]),
                               np.asarray(gop["rotation"][0]), atol=0)

    proj = full["projection"]
    np.testing.assert_allclose(
        np.asarray(batch["projection"][0]),
        [proj["fx"], proj["fy"], proj["cx"], proj["cy"], proj["w"], proj["h"]],
        atol=1e-6)

    pred = full["pred_obj_pose"]
    np.testing.assert_allclose(np.asarray(batch["pred_obj_pose"]["rotation"][0]),
                               pred["rotation"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(batch["pred_obj_pose"]["translation"][0]).ravel(),
        np.asarray(pred["translation"]).ravel(), atol=1e-6)
    assert meta["file_name"] == full["file_name"] == "ABF10/0000"
    assert meta["category"] == full["category"] == "box"


def test_dexycb_full_sample_parity(tmp_path):
    """DexYCB flavor: generate_dexycb_data (DexYCB_dataset.py:113-240) vs
    this package's reader + prepare_batch on one fixture tree. The reference
    runs the real manopth ManoLayer (mm outputs, PCA+hands_mean pose mapping
    — reference_loader's stub reproduces those semantics on the reference's
    own OurManoLayer) and its open3d stride-2 backprojection (behavior-
    complete stub). Pins: metric hand kp / palm template / filter centers,
    the obj_scale/2 + 0.15 radius filters (with injected outliers), and one
    documented deviation — the reference stores the RAW PCA coefficients as
    gt_hand_pose['mano_pose'] (DexYCB_dataset.py:201) while this package
    stores the converted axis-angle (the form every MANO consumer needs)."""
    from reference_loader import reference_module, write_fake_mano_pkl

    from hotrack_tpu.data import prepare_batch, stack_frames
    from hotrack_tpu.data.dexycb import DexYCBDataset, pca_pose_to_axisangle

    mano = synthetic_mano_model()
    root = str(tmp_path / "dexycb")
    os.makedirs(root)
    seq = _make_dexycb_tree(root, mano, n_frames=1)
    seq_dir = pjoin(root, seq.replace("+", "/"))

    # inject far outliers into both labels at z=2.0 m
    npz0 = pjoin(seq_dir, "labels_000000.npz")
    anno = dict(np.load(npz0))
    seg = anno["seg"]
    seg[0:20, 0:20] = 255   # far hand-labeled blob
    seg[0:20, 30:50] = 13   # far obj-labeled blob
    anno["seg"] = seg
    np.savez(npz0, **anno)
    from PIL import Image
    dpth_pth = pjoin(seq_dir, "aligned_depth_to_color_000000.png")
    depth = np.array(Image.open(dpth_pth))
    depth[0:20, 0:50] = 2000  # 2.0 m
    Image.fromarray(depth).save(dpth_pth)

    ref_dex = reference_module("DexYCB_dataset")
    mano_dir = str(tmp_path / "mano")
    write_fake_mano_pkl(mano_dir, seed=0)
    from manopth.manolayer import ManoLayer  # reference_loader stub
    ref_layer = ManoLayer(mano_root=mano_dir, side="right", use_pca=True,
                          ncomps=45, flat_hand_mean=False)

    rng = np.random.RandomState(8)
    poses = [{"rotation": np.linalg.qr(rng.randn(3, 3))[0],
              "translation": rng.randn(3, 1) * 0.1}]
    pred_dir = tmp_path / "pred"
    pred_dir.mkdir()
    with open(pred_dir / ("%s+000000.pkl" % seq), "wb") as f:
        pickle.dump({"pred_obj_poses": poses}, f)

    obj_jit, hand_jit = _zero_jitter()
    big = 4096
    full = ref_dex.generate_dexycb_data(
        root, seq.replace("+", "/"), 0, big, "cpu", ref_layer, obj_jit,
        str(pred_dir), 0, True, hand_jit, "kp")
    assert full is not None

    cfg = {"data_cfg": {"basepath": root, "dataset_name": "DexYCB"},
           "num_points": big, "obj_category": ["bowl"],
           "use_pred_obj_pose": True, "pred_obj_pose_dir": str(pred_dir)}
    ds = DexYCBDataset(cfg, "test")
    frame, meta = ds[0]
    assert bool(frame.valid)

    # ---- clouds through the obj_scale/2 and 0.15 radius filters ----
    my_hand = np.asarray(frame.hand_points)[np.asarray(frame.hand_valid)]
    my_obj = np.asarray(frame.obj_points)[np.asarray(frame.obj_valid)]
    n_hand_blob = len(_blob_cloud(HAND_BLOB, stride=2, quant=1e-3))
    assert my_hand.shape[0] == n_hand_blob  # outliers filtered, blob kept
    assert full["hand_points"].shape == my_hand.shape
    assert full["obj_points"].shape == my_obj.shape
    np.testing.assert_allclose(_sorted_rows(full["hand_points"]),
                               _sorted_rows(my_hand), atol=1e-6)
    np.testing.assert_allclose(_sorted_rows(full["obj_points"]),
                               _sorted_rows(my_obj), atol=1e-6)

    # ---- annotation assembly ----
    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, stack_frames([frame])),
                          jax.random.PRNGKey(0), 64, template_with_theta=True)
    np.testing.assert_allclose(np.asarray(batch["gt_hand_kp"][0]),
                               full["gt_hand_kp"], atol=2e-5)
    np.testing.assert_array_equal(full["jittered_hand_kp"], full["gt_hand_kp"])

    ghp, rhp = batch["gt_hand_pose"], full["gt_hand_pose"]
    np.testing.assert_allclose(np.asarray(ghp["translation"][0]).ravel(),
                               np.asarray(rhp["translation"]).ravel(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ghp["rotation"][0]),
                               np.asarray(rhp["rotation"]).reshape(3, 3),
                               atol=1e-5)
    assert abs(float(ghp["scale"][0]) - rhp["scale"]) < 1e-7 and rhp["scale"] == 0.2
    # documented deviation: reference keeps PCA coeffs, we store axis-angle
    np.testing.assert_allclose(
        np.asarray(ghp["mano_pose"][0]),
        pca_pose_to_axisangle(mano, np.asarray(rhp["mano_pose"],
                                               np.float32)[:48]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ghp["mano_trans"][0]),
                               rhp["mano_trans"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ghp["mano_beta"][0]),
                               rhp["mano_beta"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ghp["palm_template"][0]),
                               np.asarray(rhp["palm_template"]), atol=2e-5)

    gop, rop = batch["gt_obj_pose"], full["gt_obj_pose"]
    np.testing.assert_allclose(np.asarray(gop["rotation"][0]),
                               np.asarray(rop["rotation"]).reshape(3, 3),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gop["translation"][0]).ravel(),
                               np.asarray(rop["translation"]).ravel(),
                               atol=1e-6)
    np.testing.assert_allclose(float(gop["scale"][0]),
                               float(np.asarray(rop["scale"]).ravel()[0]),
                               atol=1e-6)
    cat = meta["category"]
    assert rop["up_and_down_sym"] == (("can" in cat) or ("box" in cat)) is False

    proj = full["projection"]
    np.testing.assert_allclose(
        np.asarray(batch["projection"][0]),
        [proj["fx"], proj["fy"], proj["cx"], proj["cy"], proj["w"], proj["h"]],
        atol=1e-6)

    pred = full["pred_obj_pose"]
    np.testing.assert_allclose(np.asarray(batch["pred_obj_pose"]["rotation"][0]),
                               pred["rotation"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(batch["pred_obj_pose"]["translation"][0]).ravel(),
        np.asarray(pred["translation"]).ravel(), atol=1e-6)
    assert meta["file_name"] == full["file_name"]
