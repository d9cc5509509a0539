"""Part-DoF pose evaluation: rot/trans error + 5deg5cm / 10deg10cm accuracy.

Mirrors /root/reference/pose_utils/part_dof_utils.py:54-78 and the pose
composition helpers at :121-181. Poses are dicts with 'rotation' (..., P, 3, 3)
and 'translation' (..., P, 3, 1); `eval_part_full` returns per-part scalar
means keyed '<metric>_<part>'.
"""

from __future__ import annotations

import jax.numpy as jnp

from .metrics import rot_diff_degree, trans_diff


def eval_part_model(gt: dict, pred: dict, axis: int, up_and_down_sym: bool = False):
    """(part_dof_utils.py:54-63)"""
    tdiff = trans_diff(
        jnp.squeeze(gt["translation"], axis=-1),
        jnp.squeeze(pred["translation"], axis=-1),
    )
    rdiff = rot_diff_degree(gt["rotation"], pred["rotation"], axis=axis,
                            up_and_down_sym=up_and_down_sym)
    return {"tdiff": tdiff, "rdiff": rdiff}


def eval_part_full(gt: dict, pred: dict, axis: int, up_and_down_sym: bool = False,
                   per_instance: bool = False):
    """(part_dof_utils.py:66-78). Inputs have a trailing part axis P; outputs
    are '<key>_<p>' scalars averaged over batch."""
    pdiff = eval_part_model(gt, pred, axis=axis, up_and_down_sym=up_and_down_sym)
    pdiff["5deg5cm"] = jnp.logical_and(pdiff["rdiff"] <= 5.0,
                                       pdiff["tdiff"] <= 0.05).astype(jnp.float32)
    pdiff["10deg10cm"] = jnp.logical_and(pdiff["rdiff"] <= 10.0,
                                         pdiff["tdiff"] <= 0.10).astype(jnp.float32)
    flat = {f"{key}_{i}": pdiff[key][..., i]
            for key in pdiff for i in range(pdiff[key].shape[-1])}
    per_diff = dict(flat) if per_instance else {}
    mean = {key: jnp.mean(value, axis=0) for key, value in flat.items()}
    return mean, per_diff


def pose_with_part(model: dict, src: jnp.ndarray) -> jnp.ndarray:
    """Apply per-part similarity transforms to canonical points
    (part_dof_utils.py:121-136). src: (..., P, N, 3)."""
    est = jnp.matmul(src, jnp.swapaxes(model["rotation"], -1, -2))
    est = est * model["scale"][..., None, None]
    return est + jnp.swapaxes(model["translation"], -1, -2)


def compute_parts_delta_pose(init: dict, final: dict, canon: dict) -> dict:
    """Relative pose of `final` w.r.t. `init` expressed in the `canon` frame
    (part_dof_utils.py:167-181)."""
    if canon["scale"].ndim < final["scale"].ndim:
        canon = {k: v[:, None] for k, v in canon.items()}
    s_0, s_f, s_c = init["scale"], final["scale"], canon["scale"]
    t_0, t_f, t_c = init["translation"], final["translation"], canon["translation"]
    r_0, r_f, r_c = init["rotation"], final["rotation"], canon["rotation"]

    s_delta = s_f / s_0
    r_delta = jnp.matmul(jnp.matmul(jnp.swapaxes(r_c, -1, -2), r_f),
                         jnp.matmul(jnp.swapaxes(r_0, -1, -2), r_c))
    t = t_f - t_c
    correction = s_delta[..., None, None] * jnp.matmul(
        jnp.matmul(r_f, jnp.swapaxes(r_0, -1, -2)), t_0 - t_c)
    t = jnp.where(jnp.max(jnp.abs(t_0 - t_c)) > 1e-7, t - correction, t)
    t_delta = jnp.matmul(jnp.swapaxes(r_c, -1, -2), t) / s_c[..., None, None]
    return {"scale": s_delta, "rotation": r_delta, "translation": t_delta}


def convert_pred_rtvec_to_matrix(pred: jnp.ndarray, sym: bool,
                                 rotation_kind: str) -> jnp.ndarray:
    """Raw network rotation head -> rotation matrices
    (part_dof_utils.py:157-165): symmetric parts regress a 3-d axis
    (compute_rotation_matrix_from_3d); otherwise a 6-d Gram-Schmidt or a 9-d
    SVD-orthogonalized parameterization. pred (..., D) -> (..., 3, 3)."""
    from .rotations import (
        compute_rotation_matrix_from_3d,
        compute_rotation_matrix_from_9d,
        compute_rotation_matrix_from_ortho6d,
    )

    lead = pred.shape[:-1]
    if sym:
        return compute_rotation_matrix_from_3d(pred.reshape(-1, pred.shape[-1])
                                               ).reshape(lead + (3, 3))
    if rotation_kind == "6d":
        return compute_rotation_matrix_from_ortho6d(pred.reshape(-1, 6)
                                                    ).reshape(lead + (3, 3))
    if rotation_kind == "9d":
        return compute_rotation_matrix_from_9d(pred.reshape(-1, 3, 3)
                                               ).reshape(lead + (3, 3))
    raise NotImplementedError(rotation_kind)
