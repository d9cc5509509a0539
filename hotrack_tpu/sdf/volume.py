"""SDF volume baking and lookup.

Parity targets in /root/reference/network/models/optimization_obj.py:
 - volume coordinate grid (:95-100): a cube of `size`^3 voxels at `voxel_scale`
   spacing centred on the origin (index - size//2) * scale, xyz-major.
 - volume bake (:133-143): batched decoder queries over the grid, divided by
   the DeepSDF normalization scale. One jitted call here instead of 10 python
   chunks (the grid is ~8.1M points x 259 features — a few MXU matmuls).
 - `Distance` trilinear interpolation with clamp to +-0.05 (:184-228).
 - nearest-voxel lookup used by the hand optimizer
   (optimization_hand.py:252-262).

All lookups are pure gather math: jittable, vmappable, differentiable where it
matters (the bake is; lookups are piecewise).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def volume_coords(size: int, voxel_scale: float, dtype=jnp.float32) -> jnp.ndarray:
    """(size^3, 3) voxel-centre coordinates, xyz-major like the reference's
    index arithmetic (optimization_obj.py:95-99)."""
    r = (jnp.arange(size) - size // 2) * voxel_scale
    x, y, z = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3).astype(dtype)


def bake_sdf_volume(decoder_apply, variables, latent_code: jnp.ndarray,
                    coords: jnp.ndarray, size: int, norm_scale: float,
                    chunk: int = 1 << 18) -> jnp.ndarray:
    """Decode the SDF over a coordinate grid -> (size, size, size) volume.

    `coords` are instance-frame points (CatCS2InsCS-transformed when the
    category frame differs, optimization_obj.py:123). Chunked lax.map keeps
    peak memory bounded like the reference's 10-piece loop
    (optimization_obj.py:133-143) while staying inside one jit.
    """
    n = coords.shape[0]
    pad = (-n) % chunk
    coords_p = jnp.pad(coords, ((0, pad), (0, 0)))
    blocks = coords_p.reshape(-1, chunk, 3)

    def decode_block(xyz):
        latent = jnp.broadcast_to(latent_code.reshape(1, -1),
                                  (xyz.shape[0], latent_code.size))
        return decoder_apply(variables, jnp.concatenate([latent, xyz], -1))[..., 0]

    sdf = jax.lax.map(decode_block, blocks).reshape(-1)[:n]
    return (sdf / norm_scale).reshape(size, size, size)


@partial(jax.jit, static_argnames=("bbox_res",))
def trilinear_sdf(volume: jnp.ndarray, points: jnp.ndarray,
                  voxel_scale: float = 0.002, bbox_res: int = 201,
                  bbox_min: float = -0.2, clamp: float = 0.05) -> jnp.ndarray:
    """Trilinearly interpolated SDF lookup, clamped to [-clamp, clamp].

    points (..., 3) in the volume's frame -> (...,). Mirrors `Distance`
    (optimization_obj.py:184-228) including its flat-index arithmetic at the
    upper boundary (neighbor indices clamp into the flattened array).
    """
    flat = volume.reshape(-1)
    shape = points.shape[:-1]
    p = points.reshape(-1, 3)
    g = jnp.clip((p - bbox_min) / voxel_scale, 0.0, bbox_res - 1.0)
    idx = g.astype(jnp.int32)
    frac = g - idx
    x, y, z = frac[:, 0], frac[:, 1], frac[:, 2]
    i000 = (idx[:, 0] * bbox_res + idx[:, 1]) * bbox_res + idx[:, 2]
    nmax = flat.shape[0] - 1

    def take(i):
        return flat[jnp.clip(i, 0, nmax)]

    r2 = bbox_res * bbox_res
    c00 = take(i000) * (1 - z) + take(i000 + 1) * z
    c01 = take(i000 + bbox_res) * (1 - z) + take(i000 + bbox_res + 1) * z
    c10 = take(i000 + r2) * (1 - z) + take(i000 + r2 + 1) * z
    c11 = take(i000 + r2 + bbox_res) * (1 - z) + take(i000 + r2 + bbox_res + 1) * z
    d = (c00 * (1 - y) + c01 * y) * (1 - x) + (c10 * (1 - y) + c11 * y) * x
    return jnp.clip(d, -clamp, clamp).reshape(shape)


@partial(jax.jit, static_argnames=("volume_size",))
def nearest_sdf(volume: jnp.ndarray, points: jnp.ndarray,
                voxel_scale: float = 0.003, volume_size: int = 151) -> jnp.ndarray:
    """Nearest-voxel SDF lookup (optimization_hand.py:252-262). Uses the
    reference's floor-divide binning (point // scale, clamped to the cube).
    points (..., 3) -> (...,)."""
    half = volume_size // 2
    shape = points.shape[:-1]
    p = points.reshape(-1, 3)
    ind = jnp.clip(jnp.floor(p / voxel_scale), -half, half).astype(jnp.int32) + half
    vals = volume[ind[:, 0], ind[:, 1], ind[:, 2]]
    return vals.reshape(shape)
