"""Sequence evaluation: per-frame tracking metrics, fully batched.

The reference accumulates per-frame loss dicts in a Python loop
(track_network.py:228-307); here the whole sequence evaluates in one jit with
a T-sized batch. Metrics match hand_network.py:159-221 (kp diff, palm-
Procrustes global R/t errors) and eval_part_full (part_dof_utils.py:66-78) for
object poses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.hand_utils import canonicalize, solve_hand_frame
from ..pose.part_dof import eval_part_full
from .types import HandTrackResult, ObjTrackResult


@jax.jit
def eval_hand_sequence(result: HandTrackResult, gt_kp: jnp.ndarray,
                       gt_palm_template: jnp.ndarray) -> dict:
    """gt_kp (T, 21, 3); gt_palm_template (6, 3) or (T, 6, 3).
    Returns per-frame arrays (T,) + scalar means."""
    pred_kp = result.pred_kp
    kp_diff = jnp.mean(jnp.linalg.norm(pred_kp - gt_kp, axis=-1), axis=-1)

    scale = 0.2
    canon = solve_hand_frame(gt_palm_template, gt_kp)  # reuse frame at scale .2
    # scaled hand-frame kps as in the loss (hand_network.py:172-183)
    gt_scaled = canonicalize(gt_kp, canon) * scale
    pred_scaled = canonicalize(pred_kp, canon) * scale
    gt_frame = solve_hand_frame(gt_palm_template, gt_scaled)
    pred_frame = solve_hand_frame(gt_palm_template, pred_scaled)
    m = jnp.matmul(jnp.swapaxes(pred_frame.rotation, -1, -2), gt_frame.rotation)
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    r_diff = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)) * 180.0 / jnp.pi
    t_diff = jnp.linalg.norm(
        pred_frame.translation[..., 0] - gt_frame.translation[..., 0], axis=-1)

    baseline_diff = jnp.mean(
        jnp.linalg.norm(result.baseline_pred_kp - gt_kp, axis=-1), axis=-1)

    return {
        "hand_pred_kp_diff": kp_diff,
        "hand_baseline_kp_diff": baseline_diff,
        "hand_pred_r_diff": r_diff,
        "hand_pred_t_diff": t_diff,
        "mean/hand_pred_kp_diff": jnp.mean(kp_diff),
        "mean/hand_baseline_kp_diff": jnp.mean(baseline_diff),
        "mean/hand_pred_r_diff": jnp.mean(r_diff),
        "mean/hand_pred_t_diff": jnp.mean(t_diff),
    }


def eval_obj_sequence(result: ObjTrackResult, gt_rotation, gt_translation,
                      sym_axis: int, up_and_down_sym: bool = False) -> dict:
    """Per-frame symmetry-aware object pose metrics (track_network.py:385-433).
    gt_rotation (T, 3, 3), gt_translation (T, 3, 1)."""
    gt = {"rotation": gt_rotation[:, None], "translation": gt_translation[:, None]}
    pred = {"rotation": result.rotation[:, None],
            "translation": result.translation[:, None]}
    mean, per = eval_part_full(gt, pred, axis=int(sym_axis),
                               up_and_down_sym=up_and_down_sym,
                               per_instance=True)
    out = {f"mean/{k}": v for k, v in mean.items()}
    out.update(per)
    return out
