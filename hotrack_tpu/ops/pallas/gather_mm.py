"""Pallas TPU kernel: batched row-gather as one-hot MXU matmuls, with a
matching MXU scatter-add backward.

The training step's top cost is NOT matmuls: the round-5 device trace
(scripts/trace_train.py) shows the PointNet++ grouping gathers — XLA
`take_along_axis` on (B, N, C) feature tables (ops/pointops.py
index_points, reference counterpart pointnet_utils.py:80-97) — plus their
scatter-add adjoints at ~40% of device time, running at a few % of HBM
bandwidth (random row access is near scalar speed on TPU, the same
pathology as the SDF volume gathers and the silhouette mask lookups).

TPU-native reformulation (the mask_lookup.py trick, generalized to f32
payloads): keep the (N, C) source block VMEM-resident per batch element and
compute each output tile as

    out(TS, C) = onehot(TS, N) @ src(N, C)        # MXU

The one-hot factor is exact 0/1; for f32 sources the kernel splits the
source into three non-overlapping bf16 planes (hi + mid + lo recovers all
24 mantissa bits) and accumulates three MXU passes in f32, making the
result BIT-EXACT vs the gather (each output element receives exactly one
selected value, recomposed exactly; all other products are exact zeros).
bf16 sources need a single pass. Precondition: finite sources — an
Inf/NaN anywhere in a source column would contaminate the whole column
through the 0*x products (activations are finite; the XLA path remains for
anything else).

The backward pass is the transposed one-hot contraction
    dsrc(N, C) += onehot(TS, N)^T @ dout(TS, C)
accumulated across output tiles in f32 — a deterministic MXU scatter-add
(vs. XLA's segment-sum adjoint: same terms, possibly different add order,
so gradients agree to f32 round-off, not bitwise; run-to-run
deterministic either way).

Used by ops/pointops.index_points on TPU for training-scale shapes (the
batch-1 tracking scan stays on XLA gathers — its per-frame gathers are
small and the scan is launch-latency-bound). HOTRACK_NO_PALLAS_GATHER=1
forces the XLA path everywhere. Measured on v5e: train-step DEVICE time
19.0 -> 15.2 ms (1.25x, jax.profiler traces; the gather fusions' 7.5
ms/step drop to ~2.7) at the bench operating point — wall-clock through
the axon relay stays ~22 ms/step (per-call dispatch-bound; a local-PCIe
host realizes the device-side gain). Forward bitwise vs the gather at
every shipped shape (scripts/check_gather_mm_train.py + the round-5
bitwise sweep in BENCHMARKS). NOTE: under multi-chip GSPMD (dp
training) XLA must partition the custom call along batch — if a future
multi-chip run rejects it, set HOTRACK_NO_PALLAS_GATHER=1 for that run
(the CPU-mesh dryrun is unaffected: the kernel is TPU-only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S = 1024         # output rows per grid step; also the 1-D idx block —
                      # XLA lays out s32 1-D arrays in T(1024) tiles and
                      # Mosaic requires the block to match that tiling


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _split3(x):
    """f32 -> three non-overlapping bf16 planes with hi+mid+lo == x exactly
    (8+8+8 mantissa bits cover f32's 24; exact for finite normals)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot_planes(onehot_bf16, x, transpose_onehot: bool = False):
    """onehot @ x with f32 accumulation, exact for f32 x via 3 bf16 planes."""
    def dot(a, b):
        if transpose_onehot:
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    if x.dtype == jnp.bfloat16:
        return dot(onehot_bf16, x)
    hi, mid, lo = _split3(x)
    return dot(onehot_bf16, hi) + dot(onehot_bf16, mid) + dot(onehot_bf16, lo)


def _gather_kernel(idx_ref, src_ref, out_ref):
    ts = idx_ref.shape[0]
    n = src_ref.shape[1]
    idx = idx_ref[:]                                        # (TS,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ts, n), 1)
    onehot = (rows == idx[:, None]).astype(jnp.bfloat16)    # (TS, N)
    out = _dot_planes(onehot, src_ref[0])                   # (TS, C) f32
    out_ref[0] = out.astype(out_ref.dtype)


def _scatter_kernel(idx_ref, g_ref, out_ref):
    ts = idx_ref.shape[0]
    n = out_ref.shape[1]
    s_step = pl.program_id(1)

    @pl.when(s_step == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idx = idx_ref[:]                                        # (TS,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ts, n), 1)
    onehot = (rows == idx[:, None]).astype(jnp.bfloat16)    # (TS, N)
    # (N, C) += onehot^T @ g  (padded rows carry idx -1: no match, no write)
    out_ref[0] += _dot_planes(onehot, g_ref[0], transpose_onehot=True)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_mm(points, flat_idx, interpret=False):
    """points (B, N, C) f32/bf16, flat_idx (B, S) int32 -> (B, S, C).

    Bit-exact vs jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    for finite inputs; gradient matches the take_along_axis adjoint to f32
    round-off."""
    return _gather_fwd_impl(points, flat_idx, interpret)


@partial(jax.jit, static_argnames=("interpret",))
def _gather_fwd_impl(points, flat_idx, interpret=False):
    b, n, c = points.shape
    s = flat_idx.shape[1]
    sp = _round_up(s, TILE_S)
    n_tiles = sp // TILE_S
    # 1-D idx blocks: Mosaic requires 2-D blocks' second-minor dim to be a
    # multiple of 8 or the full array dim; a flat (TILE_S,) block sidesteps it
    idx = jnp.pad(flat_idx.astype(jnp.int32), ((0, 0), (0, sp - s)),
                  constant_values=-1).reshape(b * sp)
    out = pl.pallas_call(
        _gather_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((TILE_S,), lambda bi, si: (bi * n_tiles + si,)),
            pl.BlockSpec((1, n, c), lambda bi, si: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_S, c), lambda bi, si: (bi, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), points.dtype),
        interpret=interpret,
    )(idx, points)
    return out[:, :s]


@partial(jax.jit, static_argnames=("n", "interpret"))
def _gather_bwd_impl(flat_idx, g, n, interpret=False):
    b, s, c = g.shape
    sp = _round_up(s, TILE_S)
    n_tiles = sp // TILE_S
    idx = jnp.pad(flat_idx.astype(jnp.int32), ((0, 0), (0, sp - s)),
                  constant_values=-1).reshape(b * sp)
    g = jnp.pad(g, ((0, 0), (0, sp - s), (0, 0)))
    dsrc = pl.pallas_call(
        _scatter_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((TILE_S,), lambda bi, si: (bi * n_tiles + si,)),
            pl.BlockSpec((1, TILE_S, c), lambda bi, si: (bi, si, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda bi, si: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=interpret,
    )(idx, g)
    return dsrc


def _gather_fwd(points, flat_idx, interpret=False):
    out = _gather_fwd_impl(points, flat_idx, interpret)
    shape_token = jnp.zeros((points.shape[1], 0), points.dtype)
    return out, (flat_idx, shape_token)


def _gather_bwd(interpret, res, g):
    flat_idx, shape_token = res
    n = shape_token.shape[0]
    dsrc = _gather_bwd_impl(flat_idx, g.astype(jnp.float32), n, interpret)
    return dsrc.astype(shape_token.dtype), None


gather_rows_mm.defvjp(_gather_fwd, _gather_bwd)
