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
    """BSUB batch elements per grid step, vectorized over sublane rows.
    Block shapes: xyz (BSUB, 3, Np), mask (BSUB, Np) f32, idx out
    (BSUB, npoint_pad) i32 — mask/idx are 2-D so the (BSUB, ·) vectors
    load/store as plain {0,0} tiles (a (BSUB, 1, ·) block's singleton
    sublane dim makes Mosaic demand an invalid replicated relayout).

    The scan is sequential in npoint by problem statement, but each
    iteration's distance update / argmax is row-parallel across the BSUB
    batch elements — one (BSUB, n) VPU op instead of BSUB sequential
    (1, n) grid steps (round 5: FPS was 26% of the train step's device
    time at batch 32 with the one-row version). Selected indices
    accumulate in a vector register (out_lanes == i selects the slot) and
    are stored once at the end — Mosaic requires lane-aligned vector
    stores, so a per-iteration 1-lane store won't compile."""
    bsub = xyz_ref.shape[0]
    n = xyz_ref.shape[-1]
    out_pad = idx_ref.shape[-1]
    # All per-row scalars (the running farthest index, accumulator slots)
    # live as f32: indices < 2^24 are f32-exact, and Mosaic lane-broadcasts
    # f32 (BSUB, 1) row scalars fine where the i32 relayout is rejected
    # ("non-singleton logical dimension is replicated in destination").
    # argmax is expressed as row-max + first-matching-lane (jnp.argmax's
    # lowest-index tie rule, preserved exactly).
    # iotas are built at full (BSUB, ·) shape: Mosaic rejects the sublane
    # broadcast of a (1, ·) row against (BSUB, 1) operands ("invalid
    # relayout ... replicated in destination but not in source"); a
    # concrete (BSUB, ·) iota sidesteps it, and (BSUB, 1) -> (BSUB, ·)
    # lane broadcasts are the well-supported (softmax-class) direction.
    lanes = jax.lax.broadcasted_iota(
        jnp.int32, (bsub, n), dimension=1).astype(jnp.float32)
    out_lanes = jax.lax.broadcasted_iota(
        jnp.int32, (bsub, out_pad), dimension=1).astype(jnp.float32)
    xyz = xyz_ref[...]                      # (BSUB, 3, n)
    valid = mask_ref[...] > 0.5             # (BSUB, n)
    big = jnp.float32(1e10)
    init_dist = jnp.where(valid, big, -1.0)  # (BSUB, n)

    ones_out = (out_lanes * jnp.float32(0.0) + jnp.float32(1.0))[:1]  # (1,out)

    def body(i, state):
        min_dist, farthest, acc = state      # (BSUB,n) (BSUB,1) (BSUB,out)
        # farthest (BSUB,1) -> (BSUB,out): Mosaic rejects both the implicit
        # where-broadcast and broadcast_in_dim of per-sublane scalars here
        # ("invalid relayout ... replicated in destination"); a k=1 MXU dot
        # against ones DOES lower, but runs single-pass bf16 — so split the
        # index into a multiple-of-256 plane + remainder (both bf16-exact
        # for n <= 65536; products x*1 exact, f32 accumulation exact).
        hi = jnp.floor(farthest * jnp.float32(1 / 256)) * jnp.float32(256)
        lo = farthest - hi
        far_wide = (jnp.dot(hi, ones_out, preferred_element_type=jnp.float32)
                    + jnp.dot(lo, ones_out,
                              preferred_element_type=jnp.float32))
        acc = jnp.where(out_lanes == i.astype(jnp.float32), far_wide, acc)
        onehot = lanes == farthest           # (BSUB, n)
        cur = jnp.sum(jnp.where(onehot[:, None, :], xyz, 0.0),
                      axis=2, keepdims=True)  # (BSUB, 3, 1)
        diff = xyz - cur
        dist = jnp.sum(diff * diff, axis=1)  # (BSUB, n)
        min_dist = jnp.minimum(min_dist, jnp.where(valid, dist, -1.0))
        row_max = jnp.max(min_dist, axis=1, keepdims=True)   # (BSUB, 1)
        farthest = jnp.min(jnp.where(min_dist == row_max, lanes,
                                     jnp.float32(n)),
                           axis=1, keepdims=True)            # (BSUB, 1)
        return min_dist, farthest, acc

    # loop carries must NOT be splat constants: Mosaic gives a plain
    # jnp.zeros a fully-replicated layout, and the loop back-edge then
    # needs an invalid concrete->replicated relayout; deriving the inits
    # from the (concrete-layout) iotas pins the carry layout.
    acc0 = out_lanes * jnp.float32(0.0)
    far0 = jnp.min(lanes, axis=1, keepdims=True) * jnp.float32(0.0)
    _, _, acc = jax.lax.fori_loop(0, npoint, body,
                                  (init_dist, far0, acc0))
    idx_ref[...] = acc.astype(jnp.int32)


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 valid_mask: jnp.ndarray | None = None,
                                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.pointops.farthest_point_sample.

    xyz (B, N, 3), valid_mask (B, N) bool -> idx (B, npoint) int32."""
    b, n, _ = xyz.shape
    np_pad = _round_up(n, LANE)
    # batch rows processed together per grid step (sublane-parallel); padded
    # batch rows run on zero clouds with an all-invalid mask and are sliced
    # away (their argmax stays at index 0 — harmless)
    bsub = 8
    b_pad = _round_up(b, bsub)
    xyz_t = jnp.swapaxes(xyz, -1, -2).astype(jnp.float32)  # (B, 3, N)
    xyz_t = jnp.pad(xyz_t, ((0, b_pad - b), (0, 0), (0, np_pad - n)))
    if valid_mask is None:
        mask = jnp.zeros((b_pad, np_pad), jnp.float32)
        mask = mask.at[:b, :n].set(1.0)
    else:
        mask = jnp.pad(valid_mask.astype(jnp.float32),
                       ((0, b_pad - b), (0, np_pad - n)))

    out_pad = _round_up(npoint, LANE)
    kernel = partial(_fps_kernel, npoint=npoint)
    idx = pl.pallas_call(
        kernel,
        grid=(b_pad // bsub,),
        in_specs=[
            pl.BlockSpec((bsub, 3, np_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsub, np_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bsub, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, out_pad), jnp.int32),
        interpret=interpret,
    )(xyz_t, mask)
    return idx[:b, :npoint]
