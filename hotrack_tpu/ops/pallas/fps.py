"""Pallas TPU kernel for farthest point sampling.

FPS is the one truly sequential point op (npoint dependent argmax steps,
reference CUDA kernel sampling_gpu.cu:95-215). The XLA `lax.fori_loop`
version (ops/pointops.py:farthest_point_sample) re-materializes the cloud
from HBM on every iteration; this kernel pins the cloud, the running
min-distances and the validity mask in VMEM for the whole scan — one HBM read
of the cloud total, all npoint iterations on-chip.

Layout: the cloud is fed as (B, 3, N) with N padded to a lane multiple (128);
the per-iteration "gather current centroid" is a masked lane reduction
(iota == farthest), which the VPU handles without dynamic indexing.

Semantics identical to the XLA version (seed index 0, invalid lanes never
selected); parity is tested in tests/test_pallas_fps.py (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fps_kernel(xyz_ref, mask_ref, idx_ref, *, npoint: int):
    """One batch element per grid step. Block shapes: xyz (1, 3, Np),
    mask (1, 1, Np) f32, idx out (1, 1, npoint_pad) i32.

    Selected indices accumulate in a vector register (out_lanes == i selects
    the slot) and are stored once at the end — Mosaic requires lane-aligned
    vector stores, so a per-iteration 1-lane store won't compile."""
    n = xyz_ref.shape[-1]
    out_pad = idx_ref.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), dimension=1)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, out_pad), dimension=1)
    xyz = xyz_ref[0]      # (3, n)
    valid = mask_ref[0] > 0.5  # (1, n)
    big = jnp.float32(1e10)
    init_dist = jnp.where(valid, big, -1.0)  # (1, n)

    def body(i, state):
        min_dist, farthest, acc = state
        acc = jnp.where(out_lanes == i, farthest, acc)
        onehot = lanes == farthest  # (1, n)
        cur = jnp.sum(jnp.where(onehot, xyz, 0.0), axis=1, keepdims=True)
        diff = xyz - cur
        dist = jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, n)
        min_dist = jnp.minimum(min_dist, jnp.where(valid, dist, -1.0))
        farthest = jnp.argmax(min_dist, axis=1)[0].astype(jnp.int32)
        return min_dist, farthest, acc

    acc0 = jnp.zeros((1, out_pad), jnp.int32)
    _, _, acc = jax.lax.fori_loop(0, npoint, body,
                                  (init_dist, jnp.int32(0), acc0))
    idx_ref[0] = acc


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 valid_mask: jnp.ndarray | None = None,
                                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.pointops.farthest_point_sample.

    xyz (B, N, 3), valid_mask (B, N) bool -> idx (B, npoint) int32."""
    b, n, _ = xyz.shape
    np_pad = _round_up(n, LANE)
    xyz_t = jnp.swapaxes(xyz, -1, -2).astype(jnp.float32)  # (B, 3, N)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, np_pad - n)))
    if valid_mask is None:
        mask = jnp.zeros((b, 1, np_pad), jnp.float32).at[:, :, :n].set(1.0)
    else:
        mask = jnp.pad(valid_mask.astype(jnp.float32)[:, None, :],
                       ((0, 0), (0, 0), (0, np_pad - n)))

    out_pad = _round_up(npoint, LANE)
    kernel = partial(_fps_kernel, npoint=npoint)
    idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, np_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, out_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, out_pad), jnp.int32),
        interpret=interpret,
    )(xyz_t, mask)
    return idx[:, 0, :npoint]
