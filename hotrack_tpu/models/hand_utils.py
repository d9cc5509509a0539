"""Hand-frame canonicalization utilities.

Parity: /root/reference/network/models/hand_utils.py. The reference ships its
SVDs to the CPU (hand_utils.py:55-59) and has a RANSAC code path that shipped
configs never enable (ransac_rt is always called with n=0, degenerating to a
single Procrustes solve, hand_utils.py:68-109). Here everything is on-device
batched XLA; canonicalize/decanonicalize are channels-last: points (B, N, 3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

import os

from ..mano.model import PALM_KP_IDS
from ..pose.procrustes import solve_rot_and_trans, solve_rot_and_trans_fast


class CanonPose(NamedTuple):
    """Hand-frame pose: camera = s * R @ handframe + t. A valid pytree, so it
    threads through jit/scan carries."""

    rotation: jnp.ndarray      # (B, 3, 3)
    translation: jnp.ndarray   # (B, 3, 1)
    scale: jnp.ndarray         # (1,) or (B,)


def handkp2palmkp(kp: jnp.ndarray) -> jnp.ndarray:
    """Select the 6 palm keypoints [wrist + 5 MCPs] from 21-kp hands
    (hand_utils.py:111-124). kp (B, 21, 3) -> (B, 6, 3)."""
    if kp.shape[-2] == 21:
        return kp[..., list(PALM_KP_IDS), :]
    if kp.shape[-2] == 29:
        idx = [0, 1, 5, 6, 7, 11, 12, 13, 17, 18, 19, 23, 24, 25]
        return kp[..., idx, :]
    raise NotImplementedError(f"unsupported kp count {kp.shape[-2]}")


def solve_hand_frame(palm_template: jnp.ndarray, kp: jnp.ndarray,
                     scale: float = 0.2, solver: str | None = None) -> CanonPose:
    """Procrustes of the palm template against the current palm keypoints
    (ransac_rt with n=0, hand_utils.py:68-81; scale 0.2 per
    hand_network.py:99). palm_template (6, 3) or (B, 6, 3); kp (B, 21, 3).

    `solver` selects the canonicalization solver explicitly:
      - 'svd': the reference's SVD Procrustes (hand_utils.py:42-66) — REQUIRED
        when evaluating checkpoints converted from the torch release, which
        were trained with this canonicalization;
      - 'horn': the Horn-quaternion fast path (same R to ~1e-6 rad, ~28% of
        HandTrackNet scan latency saved vs the 3x3 SVD);
      - None/'auto': HOTRACK_EXACT_PROCRUSTES=1 -> 'svd', else 'horn'.
    The networks thread cfg['network']['procrustes_solver'] through their
    `procrustes_solver` attribute so the choice travels with the experiment
    config instead of process-wide env state. Train and eval must use the
    SAME solver: switching solvers for a net trained with the other one can
    flip FPS sampling ties downstream (measured +15% tracking MPJPE; see the
    index-hoisting note in BENCHMARKS.md).
    """
    if solver in (None, "auto"):
        solver = ("svd" if os.environ.get("HOTRACK_EXACT_PROCRUSTES")
                  else "horn")
    if solver == "svd":
        fn = solve_rot_and_trans
    elif solver == "horn":
        fn = solve_rot_and_trans_fast
    else:
        raise ValueError(f"unknown procrustes solver {solver!r}")
    rotation, translation = fn(palm_template, handkp2palmkp(kp))
    return CanonPose(rotation=rotation, translation=translation,
                     scale=jnp.full((1,), scale, kp.dtype))


def camera_frame(batch: int, dtype=jnp.float32, scale: float = 0.2) -> CanonPose:
    """Identity canonicalization (handframe='camera', hand_network.py:107-113)."""
    return CanonPose(
        rotation=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (batch, 3, 3)),
        translation=jnp.zeros((batch, 3, 1), dtype),
        scale=jnp.full((1,), scale, dtype),
    )


def _scale_col(pose: CanonPose):
    s = pose.scale.reshape(-1)
    return s[:, None, None]


def canonicalize(points: jnp.ndarray, pose: CanonPose) -> jnp.ndarray:
    """camera -> hand frame: R^T (x - t) / s (hand_utils.py:30-32).
    points (B, N, 3) rows."""
    t = jnp.swapaxes(pose.translation, -1, -2)  # (B, 1, 3)
    return jnp.matmul(points - t, pose.rotation) / _scale_col(pose)


def decanonicalize(points: jnp.ndarray, pose: CanonPose) -> jnp.ndarray:
    """hand -> camera frame: s * R x + t (hand_utils.py:34-36)."""
    t = jnp.swapaxes(pose.translation, -1, -2)
    return _scale_col(pose) * jnp.matmul(points, jnp.swapaxes(pose.rotation, -1, -2)) + t


def obb_frame(points: jnp.ndarray) -> CanonPose:
    """Oriented-bounding-box canonical frame via PCA (data_utils.py:169-202).

    points (B, N, 3) -> CanonPose with R = principal axes (max-eigval as x,
    min as z, y by cross product), translation such that R^-1 (X - T)/s is the
    centred normalized cloud, and scale = 1.2 * x-extent.
    """
    trans = jnp.mean(points, axis=-2, keepdims=True)  # (B, 1, 3)
    x = points - trans
    n = points.shape[-2]
    c = jnp.matmul(jnp.swapaxes(x, -1, -2), x) / (n - 1)
    eigvals, eigvecs = jnp.linalg.eigh(c)  # ascending eigenvalues
    r0 = eigvecs[..., :, 2]   # max eigval -> x axis
    r2 = eigvecs[..., :, 0]   # min eigval -> z axis
    r1 = jnp.cross(r2, r0)
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r = jnp.stack([r0, r1, r2], axis=-1)  # columns

    rotated = jnp.matmul(x, r)
    bbox_len = 1.2 * (jnp.max(rotated, axis=-2) - jnp.min(rotated, axis=-2))
    scale = bbox_len[..., 0]
    t_local = jnp.mean(rotated / scale[..., None, None], axis=-2)  # (B, 3)
    translation = jnp.swapaxes(trans, -1, -2) + jnp.matmul(
        r, t_local[..., None]) * scale[..., None, None]
    return CanonPose(rotation=r, translation=translation, scale=scale)


def jitter_hand_mano(key, rot_mat, theta, trans, beta, cfg: dict):
    """Jitter full MANO parameters (data_utils.py:150-167). cfg keys:
    global_rotation (rad), global_translation, beta, x/y/z per-axis theta
    stds. Returns (noisy_mano (48,), trans (3,), beta (10,))."""
    import jax
    from ..pose.rotations import matrix_to_rotvec, noisy_rot_matrix
    k1, k2, k3, k4 = jax.random.split(key, 4)
    noisy_rot = noisy_rot_matrix(k1, rot_mat, cfg["global_rotation"])
    noisy_aa = matrix_to_rotvec(noisy_rot)
    new_trans = trans + jax.random.normal(k2, trans.shape) * cfg["global_translation"]
    new_beta = beta + jax.random.normal(k3, beta.shape) * cfg["beta"]
    scale = jnp.tile(jnp.asarray([cfg["x"], cfg["y"], cfg["z"]]), 15)
    new_theta = theta + jax.random.normal(k4, theta.shape) * scale
    return jnp.concatenate([noisy_aa, new_theta], -1), new_trans, new_beta


# parent of each of the 21 keypoints along the skeleton
# (hand_network.py:290) — wrist self-parents
KP_PARENT = (0, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15, 0, 17, 18, 19)


def kp_bones(kp: jnp.ndarray) -> jnp.ndarray:
    """Parent-relative bone vectors (hand_network.py:290-291).
    kp (B, 21, 3) -> (B, 21, 3)."""
    return kp - kp[:, list(KP_PARENT), :]


def kp2bone_lengths(kp: jnp.ndarray) -> jnp.ndarray:
    """Bone lengths of the 20 real bones (optimization_hand.py:24-28).
    kp (..., 21, 3) -> (..., 20)."""
    bones = kp[..., 1:, :] - kp[..., list(KP_PARENT)[1:], :]
    return jnp.linalg.norm(bones, axis=-1)
