"""MANO shape (beta) optimizer from predicted keypoint bone lengths.

Parity: gf_optimize_hand_shape (/root/reference/network/models/
optimization_hand.py:31-124): 20 iterations x 5120 particles over the 10-D
beta; the energy is the mean |bone length difference| between the candidate
shape's rest-pose bone lengths and the (history of) predicted keypoint bone
lengths. History accumulation across re-optimizations (set_init_para use_old,
:63-72) is the caller's concern — pass all rows in `pred_lengths`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..mano.layer import mano_forward
from ..mano.model import ManoModel
from .particle import ParticleSpec, run_particle_opt

SHAPE_SPEC = ParticleSpec(iterations=20, scaling_coefficient2=2000.0, beta=0.9)
INITIAL_SCALE = 5.0  # (optimization_hand.py:42)

# the 15 non-tip bones (kp2length, optimization_hand.py:24-28)
BONE_IDX = (1, 2, 3, 5, 6, 7, 9, 10, 11, 13, 14, 15, 17, 18, 19)
BONE_PARENT = (0, 1, 2, 0, 5, 6, 0, 9, 10, 0, 13, 14, 0, 17, 18)


def kp2length(kp: jnp.ndarray) -> jnp.ndarray:
    """(..., 21, 3) keypoints -> (..., 15) bone lengths."""
    bones = kp[..., list(BONE_IDX), :] - kp[..., list(BONE_PARENT), :]
    return jnp.linalg.norm(bones, axis=-1)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_hand_shape(
    mano_model: ManoModel,
    presampled: jnp.ndarray,        # (P, 10) fixed particle bank
    pred_lengths: jnp.ndarray,      # (H, 15) bone-length targets (history rows)
    init_shape: jnp.ndarray | None = None,  # (1, 10), default zeros
    iterations: int = SHAPE_SPEC.iterations,
):
    """Returns (hand_shape (1, 10), final_energy)."""
    spec = SHAPE_SPEC._replace(iterations=iterations)
    p = presampled.shape[0]
    if init_shape is None:
        init_shape = jnp.zeros((1, 10), presampled.dtype)
    zero_pose = jnp.zeros((p, 48), presampled.dtype)

    def energy_fn(shape, sample_ext):
        betas = shape + sample_ext  # (P, 10)
        _, kp = mano_forward(mano_model, zero_pose, betas=betas)
        # mean |bone diff| over bones and history (optimization_hand.py:54-56)
        diff = jnp.abs(kp2length(kp)[:, None, :] - pred_lengths[None])
        energy = jnp.mean(diff, axis=(-1, -2))
        return energy, energy

    def apply_mean(shape, mean_ext):
        return shape + mean_ext

    shape, last_energy = run_particle_opt(
        spec, presampled, INITIAL_SCALE, init_shape, energy_fn, apply_mean)
    return shape, last_energy
