"""Per-part pose fitting from correspondences.

Parity: /root/reference/pose_utils/pose_fit.py:38-52 — masked per-part
similarity fit (scale + translation) given a known rotation, used to recover
part poses from NOCS-style correspondences.
"""

from __future__ import annotations

import jax.numpy as jnp

from .procrustes import transform_pts_mask


def part_fit_st_no_ransac(labels, source, target, rotation, num_parts: int,
                          given_scale=None, sym: bool = False):
    """labels (B, N) int part ids; source/target (B, N, 3);
    rotation (B, P, 3, 3). Returns {'rotation', 'scale' (B, P),
    'translation' (B, P, 3, 1)} (pose_fit.py:38-52)."""
    scales, translations = [], []
    for p in range(num_parts):
        mask = (labels == p).astype(source.dtype)[..., None]  # (B, N, 1)
        gs = None if given_scale is None else given_scale[:, p]
        _, s, t = transform_pts_mask(source, target, mask, mask,
                                     given_scale=gs,
                                     rotation=rotation[:, p], sym=sym)
        scales.append(s)
        translations.append(t)
    return {
        "rotation": rotation,
        "scale": jnp.stack(scales, axis=1),
        "translation": jnp.stack(translations, axis=1),
    }
