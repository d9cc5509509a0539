"""PointNet++ backbones.

Parity: /root/reference/network/models/backbones.py. `PointNet2Msg` covers
both the reference's PointNet2Msg (:17) and PointNet2Msg_fast (:74) — the
_fast variant's extra part dim is always 1 in shipped configs and the two are
documented as behaviourally identical (:76-77). `PointNet2Encoder` (:135) is
the SA-only global encoder.

Channels-last: input (B, N, 3 [+D]), output per-point features (B, N, out_dim).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm
from .pointnet2 import (
    FeaturePropagation,
    SetAbstractionAll,
    SetAbstractionMsg,
)


class PointNet2Msg(nn.Module):
    """sa1 -> sa2 -> sa3(group_all) -> fp3 -> fp2 -> fp1 -> dense+bn+relu
    (backbones.py:57-72, :114-133).

    `net_cfg` is the pointnet config dict (configs/pointnet_config/*.yml):
    keys sa1/sa2 {npoint, radius_list, nsample_list, mlp_list},
    sa3 {mlp}, fp1/fp2/fp3 {mlp}.
    """

    net_cfg: Mapping[str, Any]
    out_dim: int
    use_xyz_feat: bool = False
    dtype: str | None = None

    @nn.compact
    def __call__(self, points, valid_mask=None, train: bool = False,
                 bn_momentum=0.1, pre_indices=None):
        """`pre_indices`: optional {'sa1': (fps_idx, [group_idx]), 'sa2': ...}
        hoisted geometry indices (see models/hand_network.
        precompute_backbone_indices)."""
        xyz = points[..., :3]
        if self.use_xyz_feat:
            feats = points
        else:
            feats = points[..., 3:] if points.shape[-1] > 3 else None

        c = self.net_cfg
        sa1 = SetAbstractionMsg(npoint=c["sa1"]["npoint"],
                                radius_list=tuple(c["sa1"]["radius_list"]),
                                nsample_list=tuple(c["sa1"]["nsample_list"]),
                                mlp_list=tuple(map(tuple, c["sa1"]["mlp_list"])), dtype=self.dtype, name="sa1")
        sa2 = SetAbstractionMsg(npoint=c["sa2"]["npoint"],
                                radius_list=tuple(c["sa2"]["radius_list"]),
                                nsample_list=tuple(c["sa2"]["nsample_list"]),
                                mlp_list=tuple(map(tuple, c["sa2"]["mlp_list"])), dtype=self.dtype, name="sa2")
        sa3 = SetAbstractionAll(mlp=tuple(c["sa3"]["mlp"]), dtype=self.dtype, name="sa3")
        fp3 = FeaturePropagation(mlp=tuple(c["fp3"]["mlp"]), dtype=self.dtype, name="fp3")
        fp2 = FeaturePropagation(mlp=tuple(c["fp2"]["mlp"]), dtype=self.dtype, name="fp2")
        fp1 = FeaturePropagation(mlp=tuple(c["fp1"]["mlp"]), dtype=self.dtype, name="fp1")

        pre = pre_indices or {}
        l1_xyz, l1 = sa1(xyz, feats, valid_mask, train, bn_momentum,
                         pre_indices=pre.get("sa1"))
        l2_xyz, l2 = sa2(l1_xyz, l1, None, train, bn_momentum,
                         pre_indices=pre.get("sa2"))
        l3_xyz, l3 = sa3(l2_xyz, l2, train, bn_momentum)
        l2 = fp3(l2_xyz, l3_xyz, l2, l3, train, bn_momentum)
        l1 = fp2(l1_xyz, l2_xyz, l1, l2, train, bn_momentum)
        l0_in = xyz if feats is None else jnp.concatenate([xyz, feats], -1)
        l0 = fp1(xyz, l1_xyz, l0_in, l1, train, bn_momentum)

        import jax.numpy as jnp
        cd = jnp.dtype(self.dtype) if self.dtype else None
        out = nn.Dense(self.out_dim, dtype=cd, name="conv1")(l0)
        out = BatchNorm(name="bn1")(out.astype(jnp.float32), train=train,
                                    momentum=bn_momentum)
        return nn.relu(out)


class PointNet2Encoder(nn.Module):
    """SA-only global encoder (backbones.py:135-186): sa1 -> sa2 ->
    sa3(group_all) -> dense 256 + dropout 0.5 -> dense out_dim.
    Output (B, 1, out_dim)."""

    net_cfg: Mapping[str, Any]
    out_dim: int
    use_xyz_feat: bool = False

    @nn.compact
    def __call__(self, points, valid_mask=None, train: bool = False,
                 bn_momentum=0.1):
        xyz = points[..., :3]
        if self.use_xyz_feat:
            feats = points
        else:
            feats = points[..., 3:] if points.shape[-1] > 3 else None
        c = self.net_cfg
        sa1 = SetAbstractionMsg(npoint=c["sa1"]["npoint"],
                                radius_list=tuple(c["sa1"]["radius_list"]),
                                nsample_list=tuple(c["sa1"]["nsample_list"]),
                                mlp_list=tuple(map(tuple, c["sa1"]["mlp_list"])), name="sa1")
        sa2 = SetAbstractionMsg(npoint=c["sa2"]["npoint"],
                                radius_list=tuple(c["sa2"]["radius_list"]),
                                nsample_list=tuple(c["sa2"]["nsample_list"]),
                                mlp_list=tuple(map(tuple, c["sa2"]["mlp_list"])), name="sa2")
        sa3 = SetAbstractionAll(mlp=tuple(c["sa3"]["mlp"]), name="sa3")

        l1_xyz, l1 = sa1(xyz, feats, valid_mask, train, bn_momentum)
        l2_xyz, l2 = sa2(l1_xyz, l1, None, train, bn_momentum)
        _, l3 = sa3(l2_xyz, l2, train, bn_momentum)

        h = nn.Dense(256)(l3)
        h = BatchNorm()(h, train=train, momentum=bn_momentum)
        h = nn.Dropout(0.5, deterministic=not train)(nn.relu(h))
        h = nn.Dense(self.out_dim)(h)
        h = BatchNorm()(h, train=train, momentum=bn_momentum)
        return nn.relu(h)
