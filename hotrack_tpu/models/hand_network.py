"""HandTrackNet and IKNet — the two learned models of the pipeline.

Parity: /root/reference/network/models/hand_network.py. HandTrackNet (:45-157)
refines the previous frame's 21 hand keypoints against the current point
cloud: canonicalize into a palm-Procrustes "hand frame" at scale 0.2, run a
PointNet++ backbone over the cloud, query point features at the keypoint
locations (two GivenCenterPoints SA layers sharing group indices), mix through
skeleton-rearrange modules and the FFN-mode TransT stack, and regress a
per-keypoint delta. IKNet (:246-322) maps canonical keypoints + bones to 15
joint quaternions (MANO theta).

All channels-last; every forward is jittable; the SVD canonicalization stays
on device (the reference round-trips to CPU, hand_utils.py:55-59).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.backbones import PointNet2Msg
from ..nn.blocks import RearrangeModule, position_embedding_sine
from ..nn.norm import BatchNorm
from ..nn.pointnet2 import SetAbstractionAtCenters
from ..nn.transformer import AttnModule, TransT
from ..ops.pointops import knn_point
from ..pose.rotations import matrix_to_unit_quaternion, mano_quat2axisang
from ..mano.layer import mano_forward
from .hand_utils import (
    CanonPose,
    camera_frame,
    canonicalize,
    decanonicalize,
    kp_bones,
    solve_hand_frame,
)


def precompute_backbone_indices(net_cfg, hand_points, canon_scale: float = 0.2,
                                valid_mask=None) -> dict:
    """Hoist the backbone's geometry indices out of a tracking scan.

    FPS / knn / ball-query indices depend only on pairwise distances, and the
    per-frame hand-frame canonicalization (hand_utils.py:30-32) is a rigid
    transform plus the constant scale 0.2 — so the sa1/sa2 indices computed on
    the *raw* camera-frame cloud (with ball radii scaled by canon_scale) equal
    those computed inside the scan on canonicalized clouds. Computing them
    here runs every frame in parallel instead of serializing ~384 FPS argmax
    steps per frame through the scan carry.

    hand_points: (T, N, 3) raw clouds. Returns the `pre_indices` dict for
    HandTrackNet/PointNet2Msg: {'sa1': (fps_idx, [group_idx]), 'sa2': ...}.
    """
    from ..ops.pointops import (farthest_point_sample, index_points, knn_point,
                                query_ball_point)

    out = {}
    xyz = hand_points
    mask = valid_mask
    for name in ("sa1", "sa2"):
        c = net_cfg[name]
        fps_idx = farthest_point_sample(xyz, c["npoint"], mask)
        new_xyz = index_points(xyz, fps_idx)
        groups = []
        for radius, k in zip(c["radius_list"], c["nsample_list"]):
            if c.get("knn"):
                _, gi = knn_point(k, new_xyz, xyz)
            else:
                gi = query_ball_point(radius * canon_scale, k, xyz, new_xyz,
                                      mask)
            groups.append(gi)
        out[name] = (fps_idx, groups)
        xyz, mask = new_xyz, None
    return out


def l2_loss(x, y, mask=None):
    """Mean per-point L2 distance; x, y (B, N, 3), mask (B, N)
    (hand_network.py:23-31, transposed to channels-last)."""
    d = jnp.linalg.norm(x - y, axis=-1)
    if mask is None:
        return jnp.mean(d)
    num = jnp.sum(d * mask, axis=-1)
    den = jnp.clip(jnp.sum(mask, axis=-1), min=1.0)
    return jnp.mean(num / den)


def l1_loss(x, y, mask=None):
    """Mean absolute difference (hand_network.py:34-42)."""
    if mask is None:
        return jnp.mean(jnp.abs(x - y))
    d = jnp.mean(jnp.abs(x - y), axis=-1)
    num = jnp.sum(d * mask, axis=-1)
    den = jnp.clip(jnp.sum(mask, axis=-1), min=1.0)
    return jnp.mean(num / den)


def rotation_diff_deg(r1, r2):
    """Mean geodesic angle between rotation batches, degrees
    (hand_network.py:194-202)."""
    m = jnp.matmul(jnp.swapaxes(r1, -1, -2), r2)
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    return jnp.mean(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))) * 180.0 / jnp.pi


class HandTrackNet(nn.Module):
    """Per-frame hand keypoint refiner (hand_network.py:45-157).

    __call__ inputs (channels-last):
      hand_points (B, N, 3), jittered_kp (B, 21, 3),
      palm_template (B, 6, 3) [handframe='kp'],
      obb_pose: optional precomputed CanonPose [handframe='OBB'],
      valid_mask (B, N) optional padded-point mask (TPU static shapes).
    Returns dict with pred_kp (B, 21, 3), pred_kp_handframe,
    init_kp_handframe, points_handframe, canon_pose, and (if
    compute_visibility) pred_kp_vis_mask.
    """

    net_cfg: Mapping[str, Any]          # pointnet backbone config
    backbone_out_dim: int = 384
    handframe: str = "kp"               # 'kp' | 'OBB' | 'camera'
    use_attention: bool = False         # enable the MHA paths (the reference
                                        # ships them disabled, attn=False)
    procrustes_solver: str | None = None  # 'svd' | 'horn' | None (env default)
                                        # — cfg network/procrustes_solver;
                                        # 'svd' for converted torch ckpts
    compute_dtype: str | None = None    # e.g. 'bfloat16': MXU work in bf16
                                        # (params/BN/LN/canonicalization f32)

    @nn.compact
    def __call__(self, hand_points, jittered_kp, palm_template=None,
                 obb_pose: CanonPose | None = None, valid_mask=None,
                 compute_visibility: bool = False, train: bool = False,
                 bn_momentum=0.1, pre_indices=None):
        b, kp_num = jittered_kp.shape[0], jittered_kp.shape[1]
        d = self.backbone_out_dim
        assert d % 6 == 0

        # ---- hand frame (hand_network.py:95-115) ----
        if self.handframe == "kp":
            canon_pose = solve_hand_frame(palm_template, jittered_kp,
                                          solver=self.procrustes_solver)
        elif self.handframe == "OBB":
            canon_pose = obb_pose
        elif self.handframe == "camera":
            canon_pose = camera_frame(b, hand_points.dtype)
        else:
            raise NotImplementedError(self.handframe)

        # ---- canonicalize cloud + kps together (hand_network.py:117-119) ----
        cam = canonicalize(
            jnp.concatenate([hand_points, jittered_kp], axis=1), canon_pose)
        xyz2 = cam[:, :-kp_num]   # cloud in hand frame
        xyz1 = cam[:, -kp_num:]   # kps in hand frame

        # positional embeddings: computed-then-unused in FFN mode, kept for
        # the attention-enabled path (hand_network.py:122-125)
        pos = position_embedding_sine(cam, num_pos_feats=d // 6)
        pos2, pos1 = pos[:, :-kp_num], pos[:, -kp_num:]

        # ---- backbone over the cloud (hand_network.py:130) ----
        src2 = PointNet2Msg(self.net_cfg, d, dtype=self.compute_dtype,
                            name="bhand")(xyz2, valid_mask, train, bn_momentum,
                                          pre_indices=pre_indices)

        # ---- keypoint-centred feature queries (hand_network.py:61-69,132-134)
        q_kwargs = dict(radius_list=(0.2, 0.2), nsample_list=(16, 64),
                        mlp_list=((128, 128, d // 2), (128, 128, d // 2)),
                        knn=True, dtype=self.compute_dtype)
        f11, pre_group_idx = SetAbstractionAtCenters(**q_kwargs, name="q1")(
            xyz2, src2, xyz1, None, return_group_idx=True,
            valid_mask=valid_mask, train=train, bn_momentum=bn_momentum)
        f12 = RearrangeModule(d, dtype=self.compute_dtype, name="r1")(f11)
        f13 = SetAbstractionAtCenters(**q_kwargs, name="q2")(
            xyz2, src2, xyz1, f12, pre_group_idx=pre_group_idx,
            train=train, bn_momentum=bn_momentum)
        f14 = RearrangeModule(d, dtype=self.compute_dtype, name="r2")(f13)

        # ---- fusion: FFN-mode by default (hand_network.py:137-140) ----
        f15, f251 = TransT(d, dtype=self.compute_dtype, name="transt")(
            f14, pos1, src2, pos2, attn=self.use_attention, train=train)
        fused = AttnModule(d, dtype=self.compute_dtype, name="c3")(
            f15, pos1, f251, pos2, attn=self.use_attention, train=train)

        # ---- delta head (hand_network.py:74-76,142): f32 for the residual ----
        h = nn.relu(nn.Dense(256, name="final_mlp_0")(fused.astype(jnp.float32)))
        pred_kp_handframe = nn.Dense(3, name="final_mlp_2")(h) + xyz1

        ret = {
            "canon_pose": canon_pose,
            "init_kp_handframe": xyz1,
            "points_handframe": xyz2,
            "pred_kp_handframe": pred_kp_handframe,
            "pred_kp": decanonicalize(pred_kp_handframe, canon_pose),
        }

        if compute_visibility:
            # visibility via mean 4-NN distance < 2 cm, with a 1 cm discount
            # on the wrist + thumb-base kps (hand_network.py:149-155)
            dist4, _ = knn_point(4, ret["pred_kp"], hand_points)
            avg = jnp.mean(dist4, axis=-1)
            avg = avg.at[:, 0].add(-0.01).at[:, 1].add(-0.01)
            ret["pred_kp_vis_mask"] = avg < 0.02
        return ret


def hand_tracknet_loss(ret: dict, gt_kp, gt_palm_template=None,
                       gt_hand_pose: dict | None = None,
                       track_flag: bool = False):
    """HandTrackNet losses/diagnostics (hand_network.py:159-221).

    gt_kp (B, 21, 3). Returns (loss_dict, ret). The headline metric is
    hand_pred_kp_diff = MPJPE in meters.
    """
    canon_pose: CanonPose = ret["canon_pose"]
    gt_kp_handframe = canonicalize(gt_kp, canon_pose)
    ret["gt_kp_handframe"] = gt_kp_handframe
    s = canon_pose.scale.reshape(-1)[:, None, None]
    init_scaled = ret["init_kp_handframe"] * s
    pred_scaled = ret["pred_kp_handframe"] * s
    gt_scaled = gt_kp_handframe * s

    loss = {
        "hand_pred_kp_loss": l1_loss(pred_scaled, gt_scaled),
        "hand_pred_kp_diff": l2_loss(ret["pred_kp"], gt_kp),
        "hand_init_kp_diff": l2_loss(init_scaled, gt_scaled),
    }

    if gt_palm_template is not None:
        # global R/t recovered by palm Procrustes on scaled hand-frame kps
        # (hand_network.py:180-183)
        gt_frame = solve_hand_frame(gt_palm_template, gt_scaled)
        pred_frame = solve_hand_frame(gt_palm_template, pred_scaled)
        loss["hand_pred_r_loss"] = l1_loss(pred_frame.rotation, gt_frame.rotation)
        loss["hand_pred_t_loss"] = l1_loss(pred_frame.translation, gt_frame.translation)
        loss["hand_pred_r_diff"] = rotation_diff_deg(pred_frame.rotation,
                                                     gt_frame.rotation)
        loss["hand_pred_t_diff"] = l2_loss(
            jnp.swapaxes(pred_frame.translation, -1, -2),
            jnp.swapaxes(gt_frame.translation, -1, -2))

    if track_flag and gt_hand_pose is not None:
        # canonicalization-error diagnostics (hand_network.py:206-215)
        loss["hand_canon_r_diff"] = rotation_diff_deg(
            canon_pose.rotation, gt_hand_pose["rotation"])
        loss["hand_canon_t_diff"] = l2_loss(
            jnp.swapaxes(gt_hand_pose["translation"], -1, -2),
            jnp.swapaxes(canon_pose.translation, -1, -2))
    return loss, ret


class IKNet(nn.Module):
    """Inverse kinematics net (hand_network.py:246-322): canonical 21 kps +
    21 parent-relative bones -> 15 joint quaternions (B, 60).

    NOTE on flattening: inputs flatten kp-major (B, 21*3) from channels-last,
    vs. the reference's coordinate-major flatten of (B, 3, 21)
    (hand_network.py:292); torch checkpoint converters must permute the first
    Linear's input weights accordingly.
    """

    layer_num: int = 6
    width: int = 1024
    iknetframe: str = "kp"  # 'kp' | 'camera'
    procrustes_solver: str | None = None  # see HandTrackNet.procrustes_solver
    # torch_init matches torch.nn.Linear's reset_parameters exactly in
    # distribution: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) kernels
    # (variance 1/(3 fan_in) vs flax lecun_normal's 1/fan_in) and
    # U(+-1/sqrt(fan_in)) bias (vs flax zeros). NOTE: every shipped config
    # sets `weight_init: xavier`, and the trainer's xavier re-init pass
    # (mirroring reference trainer.py:20-39, zeroed biases) OVERWRITES this
    # — so under shipped configs the two frameworks' inits already match in
    # distribution and this knob is inert (measured bit-identical results,
    # round-5 quat-L1 bisect). It matters only with `weight_init: default`.
    torch_init: bool = False

    def _dense(self, features, fan_in, name):
        if not self.torch_init:
            return nn.Dense(features, name=name)
        k = 1.0 / float(fan_in) ** 0.5
        return nn.Dense(
            features, name=name,
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"),
            bias_init=lambda key, shape, dtype=jnp.float32:
                jax.random.uniform(key, shape, dtype, -k, k))

    @nn.compact
    def __call__(self, init_kp, palm_template, train: bool = False,
                 bn_momentum=0.1):
        """init_kp (B, 21, 3), palm_template (B, 6, 3) -> dict."""
        b = init_kp.shape[0]
        canon_pose = solve_hand_frame(palm_template, init_kp,
                                      solver=self.procrustes_solver)
        if self.iknetframe == "kp":
            init_kp_handframe = canonicalize(init_kp, canon_pose)
        elif self.iknetframe == "camera":
            init_kp_handframe = init_kp * 5.0
        else:
            raise NotImplementedError(self.iknetframe)

        bones = kp_bones(init_kp_handframe)
        pack = jnp.concatenate(
            [init_kp_handframe.reshape(b, -1), bones.reshape(b, -1)], axis=-1)
        for i in range(self.layer_num):
            pack = self._dense(self.width, pack.shape[-1],
                               f"linear_{i}")(pack)
            pack = BatchNorm(name=f"bn_{i}")(pack, train=train,
                                             momentum=bn_momentum)
            pack = nn.relu(pack)
        raw_quat = self._dense(15 * 4, pack.shape[-1],
                               f"linear_{self.layer_num}")(pack)

        return {
            "raw_quat": raw_quat,
            "init_kp": init_kp,
            "init_kp_handframe": init_kp_handframe,
            "global_pose": canon_pose,
            "MANO_theta": mano_quat2axisang(raw_quat),
        }


def iknet_predict_kp(mano_model, ret: dict, beta):
    """Compose the IKNet joint quats with the estimated global pose and run
    MANO to get predicted keypoints (hand_network.py:313-318).
    beta (B, 10) -> pred_kp (B, 21, 3)."""
    canon_pose: CanonPose = ret["global_pose"]
    b = ret["raw_quat"].shape[0]
    root_quat = matrix_to_unit_quaternion(canon_pose.rotation)
    full_quat = jnp.concatenate([root_quat, ret["raw_quat"]], axis=-1)
    pose_coeffs = mano_quat2axisang(full_quat)
    _, pred_kp = mano_forward(mano_model, pose_coeffs,
                              betas=beta.reshape(b, -1),
                              trans=canon_pose.translation.reshape(b, 3))
    return pred_kp


def iknet_loss(ret: dict, gt_quat, gt_kp):
    """IKNet losses (hand_network.py:324-335). gt_quat (B, 60) = annotated
    MANO joint quats (global quat stripped); gt_kp (B, 21, 3)."""
    return {
        "quat_loss": jnp.mean(jnp.abs(ret["raw_quat"] - gt_quat)),
        "init_gt_kp_diff": l2_loss(ret["init_kp"], gt_kp),
    }, ret
