"""Pallas TPU kernel: fused Fourier-feature MLP evaluation for the distilled
neural SDF.

The particle optimizers query the distilled SDF at ~2M points per frame
iteration (2048 particles x 1024 points, optimization_obj.py:230-237 scale).
As plain XLA ops the MLP's inter-layer activations ((2M, 128) f32 per layer)
round-trip through HBM — measured 130 ms per 10-iteration frame on v5e,
~17 TFLOP/s, i.e. HBM-bandwidth-bound at a fraction of MXU peak. This kernel
evaluates the whole network per point tile inside VMEM: one HBM read of the
points, one write of the sdf, everything between on-chip.

Layout is transposed throughout — points arrive as (3, M), activations are
(channels, tile) — so the point axis lives on the 128-wide lane dimension
and no array pays the (8, 128) tiling's x128 lane padding (a (M, 1) output
would). Weights are small ((128, in) + 3x(128, 128) + (1, 128) ~ 0.2 MB,
pre-transposed on the host) and stay pinned in VMEM across grid steps.
Feature construction (sin/cos of 3 coords x F frequencies) runs on the VPU
per tile, matching sdf/distill._features' coordinate-major (c, f) order.

Gradient-free by design: the particle optimizers never differentiate through
SDF queries; paths that need autodiff (latent refinement) use the decoder or
the XLA distilled path (HOTRACK_NO_PALLAS_SDF=1 forces it everywhere).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on the real optimizer load (20-frame chained objopt, v5e):
# 2048 -> 35.2 ms/frame, 4096 -> 32.2, 8192 -> 31.6 (but ~11 MB VMEM).
TILE = 4096


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mlp_kernel(scale_ref, clamp_ref, pts_ref, freqs_ref, *refs,
                n_layers: int, compute_dtype=None):
    """Block shapes: pts (3, T), freqs (F, 1), weights (out, in) transposed /
    biases (out, 1), out (T,)."""
    out_ref = refs[-1]
    wb = refs[:-1]   # w0t, b0, w1t, b1, ...
    s = scale_ref[0, 0]
    x = pts_ref[:] * s                       # (3, T)
    f = freqs_ref[:]                         # (F, 1)
    parts = [x]
    for trig in (jnp.sin, jnp.cos):
        for c in range(3):
            parts.append(trig(f * x[c:c + 1, :]))   # (F, T)
    h = jnp.concatenate(parts, axis=0)       # (3 + 6F, T)
    for i in range(n_layers):
        wt = wb[2 * i][:]                    # (out, in)
        b = wb[2 * i + 1][:]                 # (out, 1)
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
            wt = wt.astype(compute_dtype)
        h = jnp.dot(wt, h, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    c = clamp_ref[0, 0]
    out_ref[:] = jnp.clip(h, -c, c)[0]       # (1, T) -> (T,)


@partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def fused_sdf_mlp(weights, biases, freqs, scale, clamp, points,
                  compute_dtype=None, interpret: bool = False):
    """Evaluate the distilled-SDF MLP at `points` (..., 3) -> sdf (...).

    NOTE: pays a (M, 3) -> (3, M) minor-dim transpose at the kernel boundary
    (~8 ms per 2M points on v5e — TPU physical layouts lane-pad size-3 minor
    dims). Hot loops should produce channels-first clouds and call
    `fused_sdf_mlp_cf` instead."""
    shape = points.shape[:-1]
    flat_t = jnp.swapaxes(points.reshape(-1, 3), 0, 1)   # (3, M)
    out = fused_sdf_mlp_cf(weights, biases, freqs, scale, clamp, flat_t,
                           compute_dtype=compute_dtype, interpret=interpret)
    return out.reshape(shape)


def fused_sdf_mlp_cf(weights, biases, freqs, scale, clamp, points_cf,
                     compute_dtype=None, interpret: bool = False):
    """Channels-first entry: points_cf (..., 3, N) -> sdf (..., N).

    Only major-dim moves happen on the way to the kernel's (3, M) operand, so
    no array ever has a size-3 minor dimension (which TPU layouts lane-pad
    x42). weights/biases: tuples as in sdf.distill.DistilledSDF.
    compute_dtype jnp.bfloat16 runs the matmuls on bf16 inputs with f32
    accumulation.

    vmap-safe: batched points fold into the kernel's flat point axis (the
    native pallas batching rule can't block the 1-D output); a batched
    *model* (per-sequence distilled SDFs in multi-sequence tracking) falls
    back to a sequential lax.map over the batch."""
    return _cf_vmapped(compute_dtype, interpret)(
        tuple(weights), tuple(biases), freqs, scale, clamp, points_cf)


@partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def _cf_impl(weights, biases, freqs, scale, clamp, points_cf,
             compute_dtype=None, interpret: bool = False):
    *batch, three, n = points_cf.shape
    assert three == 3, points_cf.shape
    shape = tuple(batch) + (n,)
    flat_t = jnp.moveaxis(points_cf.reshape(-1, 3, n), 1, 0).reshape(3, -1)
    flat_t = flat_t.astype(jnp.float32)
    m = flat_t.shape[1]
    tile = TILE if m >= TILE else _round_up(max(m, 128), 128)
    m_pad = _round_up(m, tile)
    if m_pad != m:
        flat_t = jnp.pad(flat_t, ((0, 0), (0, m_pad - m)))

    n_layers = len(weights)
    freqs2 = freqs.reshape(-1, 1).astype(jnp.float32)
    scale2 = jnp.reshape(scale, (1, 1)).astype(jnp.float32)
    clamp2 = jnp.reshape(clamp, (1, 1)).astype(jnp.float32)
    wb = []
    for w, b in zip(weights, biases):
        wb.append(jnp.swapaxes(w.astype(jnp.float32), 0, 1))   # (out, in)
        wb.append(b.reshape(-1, 1).astype(jnp.float32))        # (out, 1)

    kernel = partial(_mlp_kernel, n_layers=n_layers,
                     compute_dtype=compute_dtype)
    fixed = lambda i: (0, 0)  # noqa: E731 — same block every grid step
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),   # scale
            pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),   # clamp
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),                  # points
            pl.BlockSpec(freqs2.shape, fixed, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(a.shape, fixed, memory_space=pltpu.VMEM)
             for a in wb],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad,), jnp.float32),
        interpret=interpret,
    )(scale2, clamp2, flat_t, freqs2, *wb)
    return out[:m].reshape(shape)


@lru_cache(maxsize=None)
def _cf_vmapped(compute_dtype, interpret):
    """custom_vmap wrapper around _cf_impl for (compute_dtype, interpret)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(weights, biases, freqs, scale, clamp, points_cf):
        return _cf_impl(weights, biases, freqs, scale, clamp, points_cf,
                        compute_dtype=compute_dtype, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, weights, biases, freqs, scale, clamp,
              points_cf):
        model_batched = any(jax.tree.leaves(
            (in_batched[0], in_batched[1], in_batched[2], in_batched[3],
             in_batched[4])))
        pts_batched = in_batched[5]
        if not model_batched:
            pts = (points_cf if pts_batched else jnp.broadcast_to(
                points_cf[None], (axis_size,) + points_cf.shape))
            return fn(weights, biases, freqs, scale, clamp, pts), True

        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        args = jax.tree.map(bcast,
                            (weights, biases, freqs, scale, clamp, points_cf),
                            tuple(in_batched))
        out = _cf_impl_batched(*args, compute_dtype=compute_dtype,
                               interpret=interpret)
        return out, True

    return fn


def _mlp_kernel_b(scale_ref, clamp_ref, pts_ref, freqs_ref, *refs,
                  n_layers: int, compute_dtype=None):
    """Batched-model grid step: same math as _mlp_kernel with the leading
    (1, ...) sequence-block dims squeezed. Blocks: scale/clamp (1, 1, 1) VMEM
    (per-sequence SMEM scalars can't satisfy the (8, 128) block rule),
    pts (1, 3, T), freqs (1, F, 1), weights (1, out, in), biases (1, out, 1),
    out (1, 1, T)."""
    out_ref = refs[-1]
    wb = refs[:-1]
    s = scale_ref[0, 0, 0]
    x = pts_ref[0] * s                       # (3, T)
    f = freqs_ref[0]                         # (F, 1)
    parts = [x]
    for trig in (jnp.sin, jnp.cos):
        for c in range(3):
            parts.append(trig(f * x[c:c + 1, :]))
    h = jnp.concatenate(parts, axis=0)
    for i in range(n_layers):
        wt = wb[2 * i][0]
        b = wb[2 * i + 1][0]
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
            wt = wt.astype(compute_dtype)
        h = jnp.dot(wt, h, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    c = clamp_ref[0, 0, 0]
    out_ref[0] = jnp.clip(h, -c, c)          # (1, T)


@partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def _cf_impl_batched(weights, biases, freqs, scale, clamp, points_cf,
                     compute_dtype=None, interpret: bool = False):
    """Per-sequence models: every arg carries a leading S axis. One kernel
    launch with grid (S, G) — sequence s's grid steps read weight/mask block
    s — instead of the sequential lax.map this replaces."""
    s_axis = points_cf.shape[0]
    *batch, three, n = points_cf.shape[1:]
    assert three == 3, points_cf.shape
    out_shape = (s_axis,) + tuple(batch) + (n,)
    flat = jnp.moveaxis(points_cf.reshape(s_axis, -1, 3, n), 2, 1)
    flat = flat.reshape(s_axis, 3, -1).astype(jnp.float32)   # (S, 3, M)
    m = flat.shape[-1]
    tile = TILE if m >= TILE else _round_up(max(m, 128), 128)
    m_pad = _round_up(m, tile)
    if m_pad != m:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, m_pad - m)))

    n_layers = len(weights)
    freqs3 = freqs.reshape(s_axis, -1, 1).astype(jnp.float32)
    scale2 = jnp.reshape(scale, (s_axis, 1, 1)).astype(jnp.float32)
    clamp2 = jnp.reshape(clamp, (s_axis, 1, 1)).astype(jnp.float32)
    wb = []
    for w, b in zip(weights, biases):
        wb.append(jnp.swapaxes(w.astype(jnp.float32), -1, -2))  # (S, out, in)
        wb.append(b.reshape(s_axis, -1, 1).astype(jnp.float32))

    kernel = partial(_mlp_kernel_b, n_layers=n_layers,
                     compute_dtype=compute_dtype)
    per_seq = lambda s, g: (s, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(s_axis, m_pad // tile),
        in_specs=[
            pl.BlockSpec((1, 1, 1), per_seq,
                         memory_space=pltpu.VMEM),               # scale
            pl.BlockSpec((1, 1, 1), per_seq,
                         memory_space=pltpu.VMEM),               # clamp
            pl.BlockSpec((1, 3, tile), lambda s, g: (s, 0, g),
                         memory_space=pltpu.VMEM),               # points
            pl.BlockSpec((1,) + freqs3.shape[1:], per_seq,
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1,) + a.shape[1:], per_seq,
                          memory_space=pltpu.VMEM) for a in wb],
        out_specs=pl.BlockSpec((1, 1, tile), lambda s, g: (s, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_axis, 1, m_pad), jnp.float32),
        interpret=interpret,
    )(scale2, clamp2, flat, freqs3, *wb)
    return out[:, 0, :m].reshape(out_shape)
