"""Symmetry-aware pose-error metrics.

Mirrors /root/reference/pose_utils/metrics.py:6-152. `axis` encodes the object
symmetry class used at evaluation (from data_config ymls): 0/1/2 = continuous
rotational symmetry about that column axis (angle between axis columns,
optionally up/down symmetric); 3 = box 4-fold symmetry (min over 4 flips);
-1 = bottle 2-fold (min over identity and xz flip); anything else = full SO(3)
geodesic distance.
"""

from __future__ import annotations

import jax.numpy as jnp


def _geodesic(rot1, rot2, pre=None):
    r1 = rot1 if pre is None else jnp.matmul(rot1, pre)
    mat_diff = jnp.matmul(r1, jnp.swapaxes(rot2, -1, -2))
    diff = mat_diff[..., 0, 0] + mat_diff[..., 1, 1] + mat_diff[..., 2, 2]
    diff = jnp.clip((diff - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(diff)


def _flip(i, j):
    d = jnp.ones(3).at[i].set(-1.0).at[j].set(-1.0)
    return jnp.diag(d)


def rot_diff_rad(rot1: jnp.ndarray, rot2: jnp.ndarray, axis: int,
                 up_and_down_sym: bool = False) -> jnp.ndarray:
    """Rotation error in radians under symmetry class `axis`
    (metrics.py:6-136). `axis` and `up_and_down_sym` must be static."""
    if 0 <= axis <= 2:
        y1, y2 = rot1[..., axis], rot2[..., axis]
        diff = jnp.clip(jnp.sum(y1 * y2, axis=-1), -1.0, 1.0)
        if up_and_down_sym:
            diff = jnp.abs(diff)
        return jnp.arccos(diff)
    if axis == 3:  # box: identity + xy/xz/yz flips
        cands = [_geodesic(rot1, rot2)]
        for i, j in ((0, 1), (0, 2), (1, 2)):
            cands.append(_geodesic(rot1, rot2, _flip(i, j).astype(rot1.dtype)))
        return jnp.min(jnp.stack(cands, axis=-1), axis=-1)
    if axis == -1:  # bottle: identity + xz flip
        cands = [
            _geodesic(rot1, rot2),
            _geodesic(rot1, rot2, _flip(0, 2).astype(rot1.dtype)),
        ]
        return jnp.min(jnp.stack(cands, axis=-1), axis=-1)
    return _geodesic(rot1, rot2)


def rot_diff_degree(rot1, rot2, axis, up_and_down_sym=False):
    return rot_diff_rad(rot1, rot2, axis, up_and_down_sym) / jnp.pi * 180.0


def trans_diff(trans1, trans2):
    """L2 translation error (metrics.py:142-143)."""
    return jnp.linalg.norm(trans1 - trans2, axis=-1)


def scale_diff(scale1, scale2):
    return jnp.abs(scale1 - scale2)


def theta_diff(theta1, theta2):
    return jnp.abs(theta1 - theta2)
