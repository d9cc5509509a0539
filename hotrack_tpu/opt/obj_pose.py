"""Object 6-DoF pose optimizer (gradient-free particle search over an SDF).

Parity: gf_optimize_obj (/root/reference/network/models/optimization_obj.py:
76-333). Per frame: 10 iterations x 2048 particles; each particle perturbs the
current pose by a small quaternion + translation; the energy is the mean
|trilinear SDF| of the observed cloud transformed into the object frame,
scaled x500; better-than-identity particles are averaged and applied, with the
rotation re-projected onto SO(3) via ortho-6d Gram-Schmidt
(optimization_obj.py:284-289).

The whole optimization is one jitted function of (volume, cloud, pose): the
reference's per-iteration Python loop and .cuda() traffic become a single
lax.fori_loop device program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..pose.rotations import (
    compute_rotation_matrix_from_ortho6d,
    unit_quaternion_to_matrix,
)
from ..sdf.volume import trilinear_sdf
from .particle import (
    ParticleSpec,
    normalize_quat_head,
    quat_extend,
    run_particle_opt,
)

OBJ_SPEC = ParticleSpec(iterations=10, scaling_coefficient2=2.0, beta=0.9,
                        weight_eps=1e-5)
SCALING_COEFFICIENT1 = 0.02  # initial search size (optimization_obj.py:82)


def _use_fused_obj() -> bool:
    # default-on since its first on-device run (2026-08-18): 27.7 -> 25.6
    # ms/frame at the 2048x1024x10 operating point, device energy parity vs
    # the composed path max-rel 2.6e-3 (bf16 MXU rounding order), argmin
    # candidate identical — see BENCHMARKS.md "fused obj energy on device"
    import os
    if os.environ.get("HOTRACK_NO_FUSED_OBJ"):
        return False
    return jax.default_backend() == "tpu"


def _reproject_so3(r: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt the first two rows back onto SO(3)
    (optimization_obj.py:287-288: ortho6d of reshape(9)[:6], transposed)."""
    return jnp.swapaxes(
        compute_rotation_matrix_from_ortho6d(r.reshape(r.shape[:-2] + (9,))[..., :6]),
        -1, -2)


@partial(jax.jit, static_argnames=("iterations", "bbox_res"))
def optimize_obj_pose(
    sdf_volume: jnp.ndarray,        # (V, V, V) instance-frame SDF
    presampled: jnp.ndarray,        # (P, 6) fixed particle bank
    pcld: jnp.ndarray,              # (N, 3) observed object points (camera frame)
    rotation: jnp.ndarray,          # (3, 3) init pose (last frame)
    translation: jnp.ndarray,       # (3, 1)
    voxel_scale: float = 0.002,
    bbox_res: int = 201,
    iterations: int = OBJ_SPEC.iterations,
    distilled=None,                 # DistilledSDF: MXU-bound SDF queries
):
    """Returns (rotation (3,3), translation (3,1), final_sdf_energy).

    With `distilled` (sdf/distill.py), SDF queries run as matmuls instead of
    the trilinear volume gather — random HBM gathers run at ~scalar speed on
    TPU and make the volume path ~1.2 s/frame at the 2048x1024 operating
    point; the distilled path is compute-bound on the MXU."""
    spec = OBJ_SPEC._replace(iterations=iterations)

    pcld_t = jnp.swapaxes(pcld, 0, 1)  # (3, N), hoisted out of the opt loop

    def energy_fn(params, sample_ext):
        r, t = params
        # candidate poses (optimization_obj.py:263-265)
        new_r = jnp.matmul(r, unit_quaternion_to_matrix(sample_ext[:, :4]))
        new_t = t[None] + sample_ext[:, 4:, None]  # (P, 3, 1)
        # cloud into object frame, SDF energy (optimization_obj.py:230-237).
        # Channels-first throughout: (P, 3, N) = R^T (x^T - t) — same math as
        # the reference's (x - t^T) R with the 3-axis kept off the TPU-lane-
        # padded minor position (see sdf/distill.eval_distilled_sdf_cf).
        if distilled is not None and _use_fused_obj():
            # one-kernel path (ops/pallas/obj_energy.py): transform + MLP +
            # |sdf| reduction per particle tile — the (P, 3, N) transformed
            # cloud and the (P, N) sdf never reach HBM
            from ..ops.pallas.obj_energy import fused_obj_sdf_energy
            from ..sdf.distill import sdf_compute_dtype
            sums = fused_obj_sdf_energy(distilled, pcld_t, new_r,
                                        new_t[..., 0],
                                        compute_dtype=sdf_compute_dtype())
            sdf_energy = sums / pcld.shape[0]            # (P,) mean |sdf|
            return sdf_energy * 500.0, sdf_energy
        if distilled is not None:
            from ..sdf.distill import eval_distilled_sdf_cf, sdf_compute_dtype
            flat_cf = jnp.matmul(jnp.swapaxes(new_r, -1, -2),
                                 pcld_t[None] - new_t)   # (P, 3, N)
            sdf = eval_distilled_sdf_cf(distilled, flat_cf,
                                        compute_dtype=sdf_compute_dtype())
        else:
            # bbox_min derived from the grid (== the reference's -0.2 at the
            # 201^3 @ 2mm operating point, optimization_obj.py:186-188)
            flat = jnp.matmul(pcld[None] - jnp.swapaxes(new_t, -1, -2), new_r)
            sdf = trilinear_sdf(sdf_volume, flat, voxel_scale, bbox_res,
                                bbox_min=-(bbox_res // 2) * voxel_scale)
        sdf_energy = jnp.mean(jnp.abs(sdf), axis=-1)  # (P,)
        return sdf_energy * 500.0, sdf_energy

    def apply_mean(params, mean_ext):
        r, t = params
        r = jnp.matmul(r, unit_quaternion_to_matrix(mean_ext[:4]))
        r = _reproject_so3(r)
        return r, t + mean_ext[4:7, None]

    (rotation, translation), last_energy = run_particle_opt(
        spec, presampled, SCALING_COEFFICIENT1, (rotation, translation),
        energy_fn, apply_mean,
        extend_sample=quat_extend,
        postprocess_mean=normalize_quat_head,
        search_slice=lambda m: m[1:],
    )
    return rotation, translation, last_energy
