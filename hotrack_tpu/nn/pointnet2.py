"""PointNet++ set-abstraction / feature-propagation modules, TPU-native.

Functional parity with the reference module set
(/root/reference/network/models/pointnet_utils.py:190-590) with one deliberate
layout change: everything here is **channels-last** — points (B, N, 3),
features (B, N, C), groups (B, S, K, C) — so the per-point shared MLPs are
`nn.Dense` matmuls that tile directly onto the MXU, instead of torch's
(B, C, N) Conv1d/Conv2d-with-kernel-1 layout.

The reference's `*_fast` variants (pointnet_utils.py:346-512) carry an extra
part dimension P but are called with P=1 by every shipped config
(backbones.py:114-133, "exactly the same behaviour") — here there is a single
implementation; a part axis, when needed, is a `vmap`.

BatchNorm momentum is a call-time argument threaded down from the trainer's
momentum schedule (see nn/norm.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pointops import (
    farthest_point_sample,
    index_points,
    knn_point,
    query_ball_point,
    three_nn,
)
from .norm import BatchNorm


class SharedMLP(nn.Module):
    """Per-point MLP: [Dense -> BN -> ReLU] x len(features).

    Matches the conv(1x1)+BN+ReLU stacks built inline by every reference SA/FP
    module (e.g. pointnet_utils.py:199-209, 242-246). `dtype` sets the
    computation dtype (bf16 halves MXU time; params/BN stats stay f32)."""

    features: Sequence[int]
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.1):
        import jax.numpy as jnp
        cd = jnp.dtype(self.dtype) if self.dtype else None
        if cd is not None:
            x = x.astype(cd)
        for f in self.features:
            x = nn.Dense(f, dtype=cd)(x)
            # BN statistics in f32 for stability, output back in compute dtype
            x = BatchNorm()(x.astype(jnp.float32), train=train,
                            momentum=bn_momentum)
            if cd is not None:
                x = x.astype(cd)
            x = nn.relu(x)
        return x


@jax.custom_vjp
def max_pool_neighbors(x):
    """max over the K-neighbor axis (B, S, K, C) -> (B, S, C) with the torch
    backward tie rule: the cotangent goes to the FIRST maximal element only
    (torch.max(dim)'s scatter into its argmax, pointnet_utils.py:260).
    jnp.max's default VJP splits the cotangent evenly among ties — and
    pad-with-first ball queries make ties the common case — which is an
    equally valid subgradient but diverges from reference training step for
    step (caught by test_train_step_parity's gradient comparison)."""
    return jnp.max(x, axis=2)


def _max_pool_fwd(x):
    return jnp.max(x, axis=2), x


def _max_pool_bwd(x, g):
    first = jax.nn.one_hot(jnp.argmax(x, axis=2), x.shape[2],
                           dtype=g.dtype, axis=2)
    return (first * jnp.expand_dims(g, 2),)


max_pool_neighbors.defvjp(_max_pool_fwd, _max_pool_bwd)


def _group_indices(xyz, centers, radius_list, nsample_list, knn, valid_mask):
    """Per-scale neighborhood indices with one shared top-k where exact.

    Both `knn_point` (lax.top_k: ties to lower index) and `query_ball_point`
    (first-K-in-index-order, pad-with-first) produce results where the
    k-neighbor list is a strict prefix of the K>k list for the same query —
    so scales sharing a query (all knn scales; ball scales with equal radius)
    can slice one max-k computation instead of re-running the top-k.
    HandTrackNet's q1/q2 layers (k=16 and k=64 at the same 21 centers) hit
    this path every frame of the tracking scan.
    """
    if knn:
        kmax = max(nsample_list)
        _, idx = knn_point(kmax, centers, xyz)
        return [idx[..., :k] for k in nsample_list]
    out = [None] * len(radius_list)
    by_radius = {}
    for i, r in enumerate(radius_list):
        by_radius.setdefault(float(r), []).append(i)
    for r, scale_ids in by_radius.items():
        kmax = max(nsample_list[i] for i in scale_ids)
        idx = query_ball_point(r, kmax, xyz, centers, valid_mask)
        for i in scale_ids:
            out[i] = idx[..., :nsample_list[i]]
    return out


def _group(xyz, feats, centers, group_idx):
    """Gather neighborhoods and build grouped features.

    Returns (grouped_feats (B,S,K,D+3), grouped_xyz_rel (B,S,K,3)). Channel
    order [feats, rel_xyz] mirrors the reference concat
    (pointnet_utils.py:236-240) so checkpoint conversion stays index-stable.
    """
    grouped_xyz = index_points(xyz, group_idx) - centers[:, :, None, :]
    if feats is None:
        return grouped_xyz, grouped_xyz
    grouped_feats = index_points(feats, group_idx)
    return jnp.concatenate([grouped_feats, grouped_xyz], axis=-1), grouped_xyz


class SetAbstractionMsg(nn.Module):
    """Multi-scale-grouping SA layer: FPS -> (ball|knn) group -> MLP -> max.

    Parity: PointNetSetAbstractionMsg (pointnet_utils.py:190-250) and its
    `_fast` twin (:346-409)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    knn: bool = False
    dtype: str | None = None

    @nn.compact
    def __call__(self, xyz, feats=None, valid_mask=None, train: bool = False,
                 bn_momentum=0.1, pre_indices=None):
        """xyz (B, N, 3), feats (B, N, D) or None ->
        new_xyz (B, npoint, 3), new_feats (B, npoint, sum(mlp[-1])).

        `pre_indices`: optional (fps_idx (B, npoint), [group_idx (B, S, K)])
        precomputed outside (e.g. hoisted out of a tracking scan — FPS/knn/
        ball indices are invariant to the per-frame rigid canonicalization)."""
        if pre_indices is not None:
            fps_idx, pre_groups = pre_indices
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint, valid_mask)
            pre_groups = None
        new_xyz = index_points(xyz, fps_idx)
        if pre_groups is None:
            pre_groups = _group_indices(xyz, new_xyz, self.radius_list,
                                        self.nsample_list, self.knn, valid_mask)
        outs = []
        for i, radius in enumerate(self.radius_list):
            group_idx = pre_groups[i]
            grouped, _ = _group(xyz, feats, new_xyz, group_idx)
            h = SharedMLP(self.mlp_list[i], dtype=self.dtype)(grouped, train, bn_momentum)
            outs.append(max_pool_neighbors(h))  # max over K neighbors
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SetAbstractionAll(nn.Module):
    """group_all SA: one global group over all points -> MLP -> max
    (PointNetSetAbstraction with group_all=True, pointnet_utils.py:302-343)."""

    mlp: Sequence[int]
    dtype: str | None = None

    @nn.compact
    def __call__(self, xyz, feats=None, train: bool = False, bn_momentum=0.1):
        """xyz (B, N, 3), feats (B, N, D) -> new_xyz (B, 1, 3) zeros,
        new_feats (B, 1, mlp[-1])."""
        grouped = xyz if feats is None else jnp.concatenate([xyz, feats], -1)
        h = SharedMLP(self.mlp, dtype=self.dtype)(grouped[:, None], train,
                                                  bn_momentum)  # (B,1,N,C)
        new_feats = max_pool_neighbors(h)
        return jnp.zeros_like(xyz[:, :1, :]), new_feats


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN feature upsampling + MLP
    (PointNetFeaturePropagation, pointnet_utils.py:253-299)."""

    mlp: Sequence[int]
    dtype: str | None = None

    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2, train: bool = False,
                 bn_momentum=0.1):
        """xyz1 (B, N, 3) dense points, xyz2 (B, S, 3) sparse points,
        feats1 (B, N, D1) or None, feats2 (B, S, D2) -> (B, N, mlp[-1])."""
        n = xyz1.shape[1]
        if xyz2.shape[1] == 1:
            interpolated = jnp.broadcast_to(feats2, (feats2.shape[0], n, feats2.shape[-1]))
        else:
            dist2, idx = three_nn(xyz1, xyz2)  # squared dists, ascending
            recip = 1.0 / (dist2 + 1e-8)
            weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
            gathered = index_points(feats2, idx)  # (B, N, 3, D2)
            interpolated = jnp.sum(gathered * weight[..., None], axis=2)
        if feats1 is not None:
            interpolated = jnp.concatenate([feats1, interpolated], axis=-1)
        return SharedMLP(self.mlp, dtype=self.dtype)(interpolated, train, bn_momentum)


class SetAbstractionAtCenters(nn.Module):
    """SA at *given* center points (no FPS): query neighborhoods of the 21
    keypoints in the cloud, optionally concat a per-center feature, optionally
    reuse a previous group index
    (PointNetSetAbstractionMsg_GivenCenterPoints, pointnet_utils.py:515-590).
    """

    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    knn: bool = False
    dtype: str | None = None

    @nn.compact
    def __call__(self, xyz, feats, centers, center_feats=None,
                 pre_group_idx=None, return_4nn: bool = False,
                 return_group_idx: bool = False, valid_mask=None,
                 train: bool = False, bn_momentum=0.1):
        """xyz (B, N, 3), feats (B, N, D), centers (B, S, 3),
        center_feats (B, S, Dc) or None -> new_feats (B, S, sum(mlp[-1]))
        [, group_idx_list | avg-4nn-dist (B, S)]."""
        if pre_group_idx is None:
            pre_group_idx = _group_indices(xyz, centers, self.radius_list,
                                           self.nsample_list, self.knn,
                                           valid_mask)
        outs, group_idx_list = [], []
        grouped_xyz = None
        for i, radius in enumerate(self.radius_list):
            group_idx = pre_group_idx[i]
            group_idx_list.append(group_idx)
            grouped, grouped_xyz = _group(xyz, feats, centers, group_idx)
            if center_feats is not None:
                tiled = jnp.broadcast_to(
                    center_feats[:, :, None, :],
                    grouped.shape[:3] + (center_feats.shape[-1],))
                grouped = jnp.concatenate([grouped, tiled], axis=-1)
            h = SharedMLP(self.mlp_list[i], dtype=self.dtype)(grouped, train, bn_momentum)
            outs.append(max_pool_neighbors(h))
        new_feats = jnp.concatenate(outs, axis=-1)
        if return_4nn:
            # mean distance to the 4 nearest grouped neighbors of the last
            # scale (pointnet_utils.py:585-586) — the visibility heuristic
            avg4 = jnp.linalg.norm(grouped_xyz[:, :, :4, :], axis=-1).mean(-1)
            return new_feats, avg4
        if return_group_idx:
            return new_feats, group_idx_list
        return new_feats
