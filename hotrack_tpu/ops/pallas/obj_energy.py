"""Pallas TPU kernel: fused object-pose SDF energy — per-particle cloud
transform + distilled-SDF MLP + |sdf| reduction in one pass.

The object pose optimizer (opt/obj_pose.py, reference
optimization_obj.py:230-237) evaluates mean|SDF(R^T(x - t))| over the
observed cloud for 2048 candidate poses x 10 iterations. The XLA
composition materializes the transformed cloud (P, 3, N) in HBM (~25 MB
f32 per iteration), runs the SDF MLP kernel over it, writes the (P, N)
sdf back to HBM, and reduces — ~50 MB of HBM round-trips per iteration
that this kernel removes entirely: per particle-tile block it

    obj_c(p) = sum_y rts[p, 3c+y] * pcld_y - rts[p, 9+c]   (VPU slabs)
    sdf      = _sdf_mlp_core(obj)                          (MXU, VMEM)
    out[p]   = sum_n |sdf|                                 (lane reduce)

so only the (P,) energy sums ever reach HBM. rts holds the row-major R^T
and R^T t per candidate, laid out role-major per block (row = r*TB + p)
so every per-role access is a sublane-aligned (SUB, 1) slab — the same
layout discipline as the skin kernel's rt_role.

vmap: any batched operand routes to a pure-JAX fallback (transform einsum +
eval_distilled_sdf_cf, which handles batched per-sequence models) — the
kernel itself only runs unbatched. Escape hatch: HOTRACK_NO_FUSED_OBJ=1
keeps the XLA composition in opt/obj_pose.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hand_energy import _sdf_mlp_core, fourier_da_enabled, fourier_da_perm

import os as _os

# particles per block (Mosaic: block second-to-minor dims 8-divisible) and
# particles per in-block MLP batch (SUB*N activation tiles stay ~2 MB VMEM
# at N=1024)
TBLK = int(_os.environ.get("HOTRACK_OBJ_TILE", 8))
SUB = int(_os.environ.get("HOTRACK_OBJ_SUB", 4))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _obj_energy_kernel(scale_ref, clamp_ref, rts_ref, pcld_ref, freqs_ref,
                       *refs, n_layers: int, n_valid: int, tb: int,
                       compute_dtype=None, fourier_da: bool = False):
    """Blocks: rts (1, 12*TB, 1) role-major (row = r*TB + p, r the row-major
    R^T entry 0-8 then R^T t 9-11 — same sublane-aligned slab layout as the
    skin kernel's rt_role); pcld (3, NP) fixed; freqs (F, 1); MLP
    weights/biases; output (TB, 1) energy sums; scratch (3, SUB*NP)
    assembled object-frame points."""
    out_ref, x_ref = refs[-2], refs[-1]
    wb = refs[:-2]
    np_ = pcld_ref.shape[1]
    sub = min(SUB, tb)
    rr = rts_ref[0]                                         # (12*TB, 1)
    pc = [jnp.broadcast_to(pcld_ref[y:y + 1, :], (sub, np_))
          for y in range(3)]                                # 3 x (SUB, NP)
    if n_valid != np_:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
        valid = (lane < n_valid).astype(jnp.float32)        # (1, NP)
    else:
        valid = None

    for g in range(tb // sub):
        lo, hi = g * sub, (g + 1) * sub
        for c in range(3):
            acc = -rr[(9 + c) * tb + lo:(9 + c) * tb + hi, :]   # (SUB, 1)
            acc = jnp.broadcast_to(acc, (sub, np_))
            for y in range(3):
                r = 3 * c + y
                acc = acc + rr[r * tb + lo:r * tb + hi, :] * pc[y]
            for i in range(sub):
                x_ref[c:c + 1, i * np_:(i + 1) * np_] = acc[i:i + 1, :]
        obj = x_ref[:]                                      # (3, SUB*NP)
        sdf = _sdf_mlp_core(obj, scale_ref[0, 0], clamp_ref[0, 0],
                            freqs_ref[:], [r[:] for r in wb],
                            n_layers, compute_dtype,
                            fourier_da=fourier_da)          # (SUB*NP,)
        absd = jnp.abs(sdf)[None]                           # (1, SUB*NP)
        for i in range(sub):
            seg = absd[:, i * np_:(i + 1) * np_]
            if valid is not None:
                seg = seg * valid
            p = g * sub + i
            out_ref[p:p + 1, :] = jnp.sum(seg, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def _obj_impl(weights, biases, freqs, scale, clamp, pcld_cf, rts,
              compute_dtype=None, interpret: bool = False):
    p = rts.shape[0]
    n = pcld_cf.shape[1]
    n_pad = _round_up(n, 128)
    if n_pad != n:
        pcld_cf = jnp.pad(pcld_cf.astype(jnp.float32),
                          ((0, 0), (0, n_pad - n)))
    tb = TBLK
    p_pad = _round_up(p, tb)
    if p_pad != p:
        rts = jnp.concatenate(
            [rts, jnp.broadcast_to(rts[:1], (p_pad - p, 12))])
    # role-major per block: row r*TB + p (see kernel docstring)
    rts_role = (rts.astype(jnp.float32)
                .reshape(p_pad // tb, tb, 12)
                .transpose(0, 2, 1)
                .reshape(p_pad // tb, 12 * tb, 1))

    n_layers = len(weights)
    freqs2 = freqs.reshape(-1, 1).astype(jnp.float32)
    scalars = [jnp.reshape(v, (1, 1)).astype(jnp.float32)
               for v in (scale, clamp)]
    wb = []
    for wgt, bia in zip(weights, biases):
        wb.append(jnp.swapaxes(wgt.astype(jnp.float32), 0, 1))
        wb.append(bia.reshape(-1, 1).astype(jnp.float32))
    da = fourier_da_enabled(freqs2.shape[0])
    if da:
        wb[0] = wb[0][:, fourier_da_perm(freqs2.shape[0])]

    kernel = partial(_obj_energy_kernel, n_layers=n_layers, n_valid=n,
                     tb=tb, compute_dtype=compute_dtype, fourier_da=da)
    fixed = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(p_pad // tb,),
        in_specs=[pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM)] * 2
        + [
            pl.BlockSpec((1, 12 * tb, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # rts_role
            pl.BlockSpec((3, n_pad), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(freqs2.shape, fixed, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(a.shape, fixed, memory_space=pltpu.VMEM)
             for a in wb],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, min(SUB, tb) * n_pad), jnp.float32)],
        interpret=interpret,
    )(*scalars, rts_role, pcld_cf.astype(jnp.float32), freqs2, *wb)
    return out[:p, 0]


def obj_rts(rotations: jnp.ndarray, translations: jnp.ndarray) -> jnp.ndarray:
    """Per-candidate (R (P,3,3), t (P,3,1) or (P,3)) -> rts (P, 12): the
    row-major R^T followed by R^T t, the kernel's SMEM scalars."""
    rot_t = jnp.swapaxes(rotations, -1, -2)
    t = translations.reshape(translations.shape[0], 3, 1)
    rt = jnp.matmul(rot_t, t)[..., 0]                       # (P, 3)
    return jnp.concatenate([rot_t.reshape(-1, 9), rt], axis=-1)


def fused_obj_sdf_energy(distilled, pcld_cf, rotations, translations,
                         compute_dtype=None, interpret: bool = False):
    """Sum_n |clamped-SDF(R_p^T (x_n - t_p))| per candidate pose ->
    (P,). pcld_cf: observed cloud channels-first (3, N); divide by N for
    the optimizer's mean-|sdf| energy."""
    rts = obj_rts(rotations, translations)
    return _obj_vmapped(compute_dtype, interpret)(
        tuple(distilled.weights), tuple(distilled.biases), distilled.freqs,
        distilled.scale, distilled.clamp, pcld_cf, rts)


def _obj_energy_kernel_b(scale_ref, clamp_ref, rts_ref, pcld_ref, freqs_ref,
                         *refs, n_layers: int, n_valid: int, tb: int,
                         compute_dtype=None, fourier_da: bool = False):
    """Per-sequence grid step (grid (S, G)): same math as _obj_energy_kernel
    with leading (1, ...) sequence-block dims squeezed; scale/clamp arrive
    as (1, 1, 1) VMEM blocks (per-sequence SMEM scalars fail block rules —
    see sdf_mlp._mlp_kernel_b)."""
    out_ref, x_ref = refs[-2], refs[-1]
    wb = refs[:-2]
    np_ = pcld_ref.shape[2]
    sub = min(SUB, tb)
    rr = rts_ref[0]                                         # (12*TB, 1)
    pcld = pcld_ref[0]                                      # (3, NP)
    pc = [jnp.broadcast_to(pcld[y:y + 1, :], (sub, np_)) for y in range(3)]
    if n_valid != np_:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
        valid = (lane < n_valid).astype(jnp.float32)
    else:
        valid = None

    wb2 = [r[0] for r in wb]                                # squeeze (1,...)
    for g in range(tb // sub):
        lo, hi = g * sub, (g + 1) * sub
        for c in range(3):
            acc = -rr[(9 + c) * tb + lo:(9 + c) * tb + hi, :]
            acc = jnp.broadcast_to(acc, (sub, np_))
            for y in range(3):
                r = 3 * c + y
                acc = acc + rr[r * tb + lo:r * tb + hi, :] * pc[y]
            for i in range(sub):
                x_ref[c:c + 1, i * np_:(i + 1) * np_] = acc[i:i + 1, :]
        obj = x_ref[:]
        sdf = _sdf_mlp_core(obj, scale_ref[0, 0, 0], clamp_ref[0, 0, 0],
                            freqs_ref[0], wb2, n_layers, compute_dtype,
                            fourier_da=fourier_da)
        absd = jnp.abs(sdf)[None]
        for i in range(sub):
            seg = absd[:, i * np_:(i + 1) * np_]
            if valid is not None:
                seg = seg * valid
            p = g * sub + i
            out_ref[0, p:p + 1, :] = jnp.sum(seg, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def _obj_impl_batched(weights, biases, freqs, scale, clamp, pcld_cf, rts,
                      compute_dtype=None, interpret: bool = False):
    """Per-sequence assets: every arg carries a leading S axis. One launch
    with grid (S, G) instead of a sequential fallback."""
    s_axis, p = rts.shape[0], rts.shape[1]
    n = pcld_cf.shape[2]
    n_pad = _round_up(n, 128)
    if n_pad != n:
        pcld_cf = jnp.pad(pcld_cf.astype(jnp.float32),
                          ((0, 0), (0, 0), (0, n_pad - n)))
    tb = TBLK
    p_pad = _round_up(p, tb)
    if p_pad != p:
        rts = jnp.concatenate(
            [rts, jnp.broadcast_to(rts[:, :1], (s_axis, p_pad - p, 12))],
            axis=1)
    g_axis = p_pad // tb
    rts_role = (rts.astype(jnp.float32)
                .reshape(s_axis * g_axis, tb, 12)
                .transpose(0, 2, 1)
                .reshape(s_axis * g_axis, 12 * tb, 1))

    n_layers = len(weights)
    freqs3 = freqs.reshape(s_axis, -1, 1).astype(jnp.float32)
    scale2 = jnp.reshape(scale, (s_axis, 1, 1)).astype(jnp.float32)
    clamp2 = jnp.reshape(clamp, (s_axis, 1, 1)).astype(jnp.float32)
    wb = []
    for w, b in zip(weights, biases):
        wb.append(jnp.swapaxes(w.astype(jnp.float32), -1, -2))
        wb.append(b.reshape(s_axis, -1, 1).astype(jnp.float32))
    da = fourier_da_enabled(freqs3.shape[1])
    if da:
        wb[0] = wb[0][:, :, fourier_da_perm(freqs3.shape[1])]

    kernel = partial(_obj_energy_kernel_b, n_layers=n_layers, n_valid=n,
                     tb=tb, compute_dtype=compute_dtype, fourier_da=da)
    per_seq = lambda s, g: (s, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(s_axis, g_axis),
        in_specs=[
            pl.BlockSpec((1, 1, 1), per_seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), per_seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12 * tb, 1),
                         lambda s, g: (s * g_axis + g, 0, 0),
                         memory_space=pltpu.VMEM),           # rts_role
            pl.BlockSpec((1, 3, n_pad), per_seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + freqs3.shape[1:], per_seq,
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1,) + a.shape[1:], per_seq,
                          memory_space=pltpu.VMEM) for a in wb],
        out_specs=pl.BlockSpec((1, tb, 1), lambda s, g: (s, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_axis, p_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, min(SUB, tb) * n_pad), jnp.float32)],
        interpret=interpret,
    )(scale2, clamp2, rts_role, pcld_cf.astype(jnp.float32), freqs3, *wb)
    return out[:, :p, 0]


@lru_cache(maxsize=None)
def _obj_vmapped(compute_dtype, interpret):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(weights, biases, freqs, scale, clamp, pcld_cf, rts):
        return _obj_impl(weights, biases, freqs, scale, clamp, pcld_cf, rts,
                         compute_dtype=compute_dtype, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):
        # one batched-grid kernel launch (sequence s's grid steps read
        # asset block s) instead of a sequential fallback
        def bcast(x, bt):
            return x if bt else jnp.broadcast_to(x[None],
                                                 (axis_size,) + x.shape)
        (weights, biases, freqs, scale, clamp, pcld_cf, rts) = jax.tree.map(
            bcast, args, tuple(in_batched))
        out = _obj_impl_batched(weights, biases, freqs, scale, clamp,
                                pcld_cf, rts, compute_dtype=compute_dtype,
                                interpret=interpret)
        return out, True

    return fn
