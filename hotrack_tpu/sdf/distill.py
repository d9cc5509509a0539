"""Distilled neural SDF: a tiny Fourier-feature MLP standing in for the
trilinear volume lookup.

Why: the particle optimizers query the SDF at ~2M random positions per
iteration (2048 particles x 1024 points, optimization_obj.py:230-237). On GPU
that's a cheap coalesced gather; on TPU, random HBM gathers run at ~scalar
speed and dominate everything (measured ~1.2 s/frame on v5e — 160M gathered
elements). TPUs want matmuls, so the volume is distilled ONCE per sequence
into a small MLP (Fourier features -> 3x128 relu -> sdf), whose evaluation is
pure MXU work: ~5 ms/frame for the same query load, amortizing a few seconds
of distillation over a 100-2000 frame sequence.

This is an approximation of the baked volume (checked to ~voxel-scale
accuracy by tests); the exact trilinear path remains available
(optimize_obj_pose(..., use the volume) / HOTRACK_OBJ_SDF=volume).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DistilledSDF(NamedTuple):
    """MLP params + input scaling. A valid pytree.

    INVARIANT: freqs must be geometric (f0 * 2^k, as distill_sdf_volume
    produces) — the TPU kernels compute the higher Fourier octaves by
    double-angle recurrence from f0 (ops/pallas/hand_energy.py
    fourier_da_enabled). For a hand-built model with non-geometric freqs set
    HOTRACK_NO_FOURIER_DA=1."""

    weights: tuple          # ((in, h), (h, h), ..., (h, 1)) kernels
    biases: tuple
    freqs: jnp.ndarray      # (F,) fourier frequencies
    scale: jnp.ndarray      # () coordinate normalization (1/extent)
    clamp: jnp.ndarray      # () output clamp (0.05 like `Distance`)


# Architecture defaults, swept on the real TPU (scripts/sweep_distill_arch.py
# + scripts/ab_handopt_incontext.py, BENCHMARKS.md "distilled-SDF architecture"):
# at the production distillation budget (4000 Adam steps) FEWER fourier
# frequencies fit the near-surface band BETTER (3 freqs: 0.45/0.57 mm RMSE on
# the box/compound 151^3 volumes vs 0.78/1.01 mm at 6 freqs — the high bands
# alias), and depth 3 matches depth 4. The cut is also ~40% of the optimizer
# stages' kernel FLOPs: fourier features measured ~2.7 ms/iter and each
# hidden layer ~1.2 ms/iter in-context at the 5120x778 hand-opt load.
MAX_FREQS = 3
HIDDEN = 128
DEPTH = 3


def _features(points: jnp.ndarray, freqs: jnp.ndarray, scale) -> jnp.ndarray:
    """(..., 3) -> (..., 3 + 6*F) Fourier features."""
    x = points * scale
    ang = x[..., None] * freqs  # (..., 3, F)
    feats = jnp.concatenate(
        [x, jnp.sin(ang).reshape(x.shape[:-1] + (-1,)),
         jnp.cos(ang).reshape(x.shape[:-1] + (-1,))], axis=-1)
    return feats


def _raw_sdf(model: DistilledSDF, points: jnp.ndarray,
             compute_dtype=None) -> jnp.ndarray:
    """Unclamped MLP output — used for training (clipping at train time
    zeroes gradients wherever the init lands outside the clamp band).

    `compute_dtype=jnp.bfloat16` makes the bf16 input rounding explicit.
    NOTE: measured on v5e, default-precision f32 matmuls ALREADY run as
    single-pass bf16 on the MXU (identical outputs to explicit bf16 — see
    BENCHMARKS.md "MXU precision reality"), so this knob changes neither
    numerics nor speed there; it matters only under
    jax.default_matmul_precision overrides or on other backends."""
    h = _features(points, model.freqs, model.scale)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    for i, (w, b) in enumerate(zip(model.weights, model.biases)):
        if compute_dtype is not None:
            h = jnp.matmul(h, w.astype(compute_dtype),
                           preferred_element_type=jnp.float32) + b
        else:
            h = h @ w + b
        if i < len(model.weights) - 1:
            h = jax.nn.relu(h)
            if compute_dtype is not None:
                h = h.astype(compute_dtype)
    return h[..., 0].astype(jnp.float32)


def sdf_compute_dtype():
    """Optimizer-energy SDF matmul dtype: HOTRACK_SDF_BF16=1 -> explicit
    bf16 inputs with f32 accumulation. Measured a no-op on v5e (default
    f32 matmuls already run single-pass bf16 on the MXU, bit-identical
    outputs) — kept for backends/precision modes where the default
    differs."""
    import os
    return jnp.bfloat16 if os.environ.get("HOTRACK_SDF_BF16") else None


def eval_distilled_sdf(model: DistilledSDF, points: jnp.ndarray,
                       compute_dtype=None) -> jnp.ndarray:
    """points (..., 3) -> clamped sdf (...,).

    On TPU this dispatches to the fused Pallas kernel
    (ops/pallas/sdf_mlp.py): the XLA op-by-op MLP spills (M, 128) activations
    to HBM between layers and is bandwidth-bound at optimizer query loads;
    the fused kernel keeps the whole network per tile in VMEM.
    HOTRACK_NO_PALLAS_SDF=1 forces the XLA path (also the path to use under
    jax.grad — the particle optimizers never differentiate SDF queries)."""
    import os
    if (jax.default_backend() == "tpu"
            and not os.environ.get("HOTRACK_NO_PALLAS_SDF")):
        from ..ops.pallas.sdf_mlp import fused_sdf_mlp
        return fused_sdf_mlp(model.weights, model.biases, model.freqs,
                             model.scale, model.clamp, points,
                             compute_dtype=compute_dtype)
    return jnp.clip(_raw_sdf(model, points, compute_dtype),
                    -model.clamp, model.clamp)


def eval_distilled_sdf_cf(model: DistilledSDF, points_cf: jnp.ndarray,
                          compute_dtype=None) -> jnp.ndarray:
    """Channels-first variant: points_cf (..., 3, N) -> sdf (..., N).

    The layout hot loops should use: TPU physical layouts lane-pad a size-3
    minor dimension x42, so producing clouds as (..., 3, N) and keeping the 3
    axis off the minor position end-to-end avoids both the padding and the
    minor-dim transpose at the Pallas kernel boundary (measured ~8 ms per 2M
    points per transpose on v5e)."""
    import os
    if (jax.default_backend() == "tpu"
            and not os.environ.get("HOTRACK_NO_PALLAS_SDF")):
        from ..ops.pallas.sdf_mlp import fused_sdf_mlp_cf
        return fused_sdf_mlp_cf(model.weights, model.biases, model.freqs,
                                model.scale, model.clamp, points_cf,
                                compute_dtype=compute_dtype)
    pts = jnp.swapaxes(points_cf, -1, -2)    # (..., N, 3)
    return jnp.clip(_raw_sdf(model, pts, compute_dtype),
                    -model.clamp, model.clamp)


@partial(jax.jit, static_argnames=("steps", "batch", "hidden", "depth",
                                   "max_freqs", "pool_batches"))
def distill_sdf_volume(volume: jnp.ndarray, voxel_scale: float,
                       key: jax.Array, steps: int = 4000, batch: int = 8192,
                       clamp: float = 0.05, lr: float = 2e-3,
                       hidden: int | None = None, depth: int | None = None,
                       max_freqs: int | None = None,
                       pool_batches: int = 64) -> DistilledSDF:
    """Fit the MLP to a baked volume (V, V, V) @ voxel_scale centred at 0.

    Adam on *continuous* minibatches against the trilinear interpolant (the
    exact function being replaced): training on voxel centres alone lets
    high-frequency Fourier features alias between grid points. Near-surface
    importance sampling covers the band the optimizers' energies read — most
    of the clamped volume is a flat +-clamp plateau. Fourier frequencies are
    capped at the grid Nyquist (shortest wavelength >= 4 voxels). One jitted
    fori_loop.

    `pool_batches` (default 64): samples + trilinear targets are drawn as ONE
    vectorized pool of `pool_batches * batch` points up front, and each Adam
    step takes random *contiguous* slices (per half, preserving the exact
    uniform/near-surface mix). Per-step fresh sampling (`pool_batches=0`,
    the pre-round-2 behaviour) pays a 22-deep searchsorted gather chain plus
    8 trilinear gathers per point every step — on TPU those random HBM
    gathers dominated the whole distillation (~4.7 s of the ~5 s); pooling
    does the same gather work once (~1/steps of it) and leaves the loop pure
    MXU/VPU. Statistically the pool revisits each i.i.d. sample ~steps/
    pool_batches times against a deterministic regression target (measured
    accuracy-neutral at the production budget: see BENCHMARKS.md).
    """
    import math

    from .volume import trilinear_sdf

    hidden = HIDDEN if hidden is None else hidden
    depth = DEPTH if depth is None else depth
    max_freqs = MAX_FREQS if max_freqs is None else max_freqs

    v = volume.shape[0]
    half = v // 2
    extent = half * voxel_scale
    scale = jnp.float32(1.0 / extent)
    n_freqs = min(max_freqs, max(2, int(math.log2(max(half / 2.0, 4.0))) + 1))
    freqs = jnp.float32(jnp.pi) * (2.0 ** jnp.arange(n_freqs))

    in_dim = 3 + 6 * n_freqs
    dims = [in_dim] + [hidden] * depth + [1]
    keys = jax.random.split(key, len(dims))
    weights = tuple(
        jax.random.normal(keys[i], (dims[i], dims[i + 1])) *
        jnp.sqrt(2.0 / dims[i]) * (0.01 if i == len(dims) - 2 else 1.0)
        for i in range(len(dims) - 1))  # small head: start inside the clamp
    biases = tuple(jnp.zeros((dims[i + 1],)) for i in range(len(dims) - 1))
    model0 = DistilledSDF(weights, biases, freqs, scale, jnp.float32(clamp))

    flat = jnp.clip(volume.reshape(-1), -clamp, clamp)
    # near-surface sampling weights (renormalized categorical over all voxels)
    near_w = (jnp.abs(flat) < clamp * 0.98).astype(jnp.float32) + 1e-6
    near_cdf = jnp.cumsum(near_w / jnp.sum(near_w))
    bbox_min = -half * voxel_scale

    def draw_uniform(k, n):
        return jax.random.uniform(k, (n, 3), minval=-extent, maxval=extent)

    def draw_near(ka, kb, n):
        # near-surface voxels (inverse-CDF draw) jittered by +-1 voxel
        u = jax.random.uniform(ka, (n,))
        idx_n = jnp.clip(jnp.searchsorted(near_cdf, u), 0, v**3 - 1)
        centres = jnp.stack(
            [(idx_n // (v * v)) - half, (idx_n // v) % v - half,
             idx_n % v - half], axis=-1).astype(jnp.float32) * voxel_scale
        return centres + jax.random.uniform(kb, centres.shape,
                                            minval=-voxel_scale,
                                            maxval=voxel_scale)

    def target_of(coords):
        return trilinear_sdf(volume, coords, voxel_scale, v,
                             bbox_min=bbox_min, clamp=clamp)

    def loss_fn(params, coords, target):
        w, b = params
        m = model0._replace(weights=w, biases=b)
        return jnp.mean((_raw_sdf(m, coords) - target) ** 2)

    b1, b2, eps = 0.9, 0.999, 1e-8

    def adam_step(i, params, m, vv, g):
        m = jax.tree.map(lambda a, gg: b1 * a + (1 - b1) * gg, m, g)
        vv = jax.tree.map(lambda a, gg: b2 * a + (1 - b2) * gg**2, vv, g)
        t = (i + 1).astype(jnp.float32)
        cur_lr = lr * (0.5 ** (i // (steps // 3)))
        upd = jax.tree.map(
            lambda mm, vvv: cur_lr * (mm / (1 - b1**t))
            / (jnp.sqrt(vvv / (1 - b2**t)) + eps), m, vv)
        return jax.tree.map(lambda p, u: p - u, params, upd), m, vv

    pb = min(pool_batches, steps)
    if pb > 0:
        key, ku, kn1, kn2 = jax.random.split(key, 4)
        hp = pb * (batch // 2)          # per-half pool size
        pool_u = draw_uniform(ku, hp)
        pool_n = draw_near(kn1, kn2, hp)
        tgt_u = target_of(pool_u)
        tgt_n = target_of(pool_n)

        def body(i, state):
            params, m, vv, k = state
            k, k1, k2 = jax.random.split(k, 3)
            o_u = jax.random.randint(k1, (), 0, hp - batch // 2 + 1)
            o_n = jax.random.randint(k2, (), 0, hp - batch // 2 + 1)
            coords = jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(pool_u, o_u, batch // 2),
                 jax.lax.dynamic_slice_in_dim(pool_n, o_n, batch // 2)])
            target = jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(tgt_u, o_u, batch // 2),
                 jax.lax.dynamic_slice_in_dim(tgt_n, o_n, batch // 2)])
            g = jax.grad(loss_fn)(params, coords, target)
            params, m, vv = adam_step(i, params, m, vv, g)
            return params, m, vv, k
    else:
        def body(i, state):
            params, m, vv, k = state
            k, k1, k2, k3 = jax.random.split(k, 4)
            coords = jnp.concatenate(
                [draw_uniform(k1, batch // 2),
                 draw_near(k2, k3, batch // 2)])
            g = jax.grad(loss_fn)(params, coords, target_of(coords))
            params, m, vv = adam_step(i, params, m, vv, g)
            return params, m, vv, k

    zeros = jax.tree.map(jnp.zeros_like, (weights, biases))
    params, _, _, _ = jax.lax.fori_loop(
        0, steps, body, ((weights, biases), zeros,
                         jax.tree.map(jnp.zeros_like, zeros), key))
    return model0._replace(weights=params[0], biases=params[1])
