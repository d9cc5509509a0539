"""Result pytrees for the tracking drivers."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class HandTrackResult(NamedTuple):
    """Per-sequence hand tracking outputs; leading axis T (frames)."""

    pred_kp: jnp.ndarray            # (T, 21, 3) final keypoints
    baseline_pred_kp: jnp.ndarray   # (T, 21, 3) raw HandTrackNet keypoints
    canon_rotation: jnp.ndarray     # (T, 3, 3) hand-frame canonicalization
    canon_translation: jnp.ndarray  # (T, 3, 1)
    global_rotation: jnp.ndarray    # (T, 3, 3) IKNet/opt global pose
    global_translation: jnp.ndarray  # (T, 3, 1)
    mano_theta: jnp.ndarray         # (T, 45)
    pred_beta: jnp.ndarray          # (1, 10)


class ObjTrackResult(NamedTuple):
    """Per-sequence object tracking outputs; leading axis T."""

    rotation: jnp.ndarray       # (T, 3, 3)
    translation: jnp.ndarray    # (T, 3, 1)
    sdf_energy: jnp.ndarray     # (T,) final per-frame SDF energies
