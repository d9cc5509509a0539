"""PointTransformer module set (alternate backbone family).

Parity: /root/reference/network/models/pointnet_lib/point_transformer_modules
.py — the reference ships these as an unused-by-the-pipeline alternate module
set (SURVEY §2.2); they are part of the public component inventory, so the
TPU build carries equivalents: vector-attention PointTransformer layers with
knn neighborhoods (the reference's variant omits the relative positional
embedding, point_transformer_modules.py:143-155), residual blocks, and FPS/
knn transition down + 3-NN interpolation transition up blocks.

Channels-last like the rest of the nn package.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pointops import (
    farthest_point_sample,
    index_points,
    knn_point,
    three_nn,
)
from .norm import BatchNorm
from .pointnet2 import SharedMLP


class PointTransformerLayer(nn.Module):
    """Vector attention over knn neighborhoods
    (point_transformer_modules.py:110-156, rel-pos embedding omitted like the
    reference's modified variant)."""

    dim: int
    attn_mlp_hidden_mult: int = 4
    num_neighbors: int = 16

    @nn.compact
    def __call__(self, xyz, points, train: bool = False, bn_momentum=0.1):
        """xyz (B, N, 3), points (B, N, D) -> (B, N, D)."""
        _, group_idx = knn_point(self.num_neighbors, xyz, xyz)
        qkv = nn.Dense(self.dim * 3, use_bias=False)(points)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        k_g = index_points(k, group_idx)   # (B, N, K, D)
        v_g = index_points(v, group_idx)
        qk_rel = q[:, :, None, :] - k_g
        sim = nn.Dense(self.dim * self.attn_mlp_hidden_mult)(qk_rel)
        sim = nn.Dense(self.dim)(nn.relu(sim))
        attn = nn.softmax(sim, axis=2)     # over neighbors
        return jnp.sum(attn * v_g, axis=2)


class PointTransformerResBlock(nn.Module):
    """bottleneck -> transformer -> expand + residual
    (point_transformer_modules.py:159-180)."""

    dim: int
    div: int = 4
    attn_mlp_hidden_mult: int = 4
    num_neighbors: int = 16

    @nn.compact
    def __call__(self, xyz, points, train: bool = False, bn_momentum=0.1):
        mid = self.dim // self.div
        h = nn.Dense(mid)(points)
        h = PointTransformerLayer(mid, self.attn_mlp_hidden_mult,
                                  self.num_neighbors)(xyz, h, train, bn_momentum)
        h = nn.Dense(self.dim)(h)
        return points + h


class PointTransformerTransitionDown(nn.Module):
    """FPS -> knn group -> MLP -> max (point_transformer_modules.py:39-72)."""

    npoint: int
    nsample: int
    out_channel: int

    @nn.compact
    def __call__(self, xyz, points=None, valid_mask=None, train: bool = False,
                 bn_momentum=0.1):
        fps_idx = farthest_point_sample(xyz, self.npoint, valid_mask)
        new_xyz = index_points(xyz, fps_idx)
        _, group_idx = knn_point(self.nsample, new_xyz, xyz)
        grouped_xyz = index_points(xyz, group_idx) - new_xyz[:, :, None, :]
        if points is not None:
            grouped = jnp.concatenate(
                [index_points(points, group_idx), grouped_xyz], axis=-1)
        else:
            grouped = grouped_xyz
        h = SharedMLP((self.out_channel,))(grouped, train, bn_momentum)
        return new_xyz, jnp.max(h, axis=2)


class PointTransformerTransitionUp(nn.Module):
    """MLP on the coarse features + 3-NN interpolation + skip sum
    (point_transformer_modules.py:75-108)."""

    high_channel: int

    @nn.compact
    def __call__(self, xyz_low, xyz_high, points_low, points_high,
                 train: bool = False, bn_momentum=0.1):
        """xyz_low (B, S, 3) coarse, xyz_high (B, N, 3) dense."""
        n = xyz_high.shape[1]
        h = SharedMLP((self.high_channel,))(points_low, train, bn_momentum)
        if xyz_low.shape[1] == 1:
            interpolated = jnp.broadcast_to(h, (h.shape[0], n, h.shape[-1]))
        else:
            dist2, idx = three_nn(xyz_high, xyz_low)
            recip = 1.0 / (dist2 + 1e-8)
            weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
            interpolated = jnp.sum(
                index_points(h, idx) * weight[..., None], axis=2)
        return interpolated + points_high


class PointTransformerDownBlock(nn.Module):
    """transition down + num_attn residual transformer blocks
    (point_transformer_modules.py:183-197)."""

    npoint: int
    nsample: int
    out_channel: int
    num_attn: int = 1
    div: int = 4

    @nn.compact
    def __call__(self, xyz, points=None, valid_mask=None, train: bool = False,
                 bn_momentum=0.1):
        xyz, points = PointTransformerTransitionDown(
            self.npoint, self.nsample, self.out_channel)(
                xyz, points, valid_mask, train, bn_momentum)
        for _ in range(self.num_attn):
            points = PointTransformerResBlock(
                self.out_channel, self.div,
                num_neighbors=self.nsample)(xyz, points, train, bn_momentum)
        return xyz, points


class PointTransformerUpBlock(nn.Module):
    """transition up + num_attn residual transformer blocks
    (point_transformer_modules.py:200-215)."""

    nsample: int
    high_channel: int
    num_attn: int = 1
    div: int = 4

    @nn.compact
    def __call__(self, xyz_low, xyz_high, points_low, points_high,
                 train: bool = False, bn_momentum=0.1):
        points = PointTransformerTransitionUp(self.high_channel)(
            xyz_low, xyz_high, points_low, points_high, train, bn_momentum)
        for _ in range(self.num_attn):
            points = PointTransformerResBlock(
                self.high_channel, self.div,
                num_neighbors=self.nsample)(xyz_high, points, train, bn_momentum)
        return points
