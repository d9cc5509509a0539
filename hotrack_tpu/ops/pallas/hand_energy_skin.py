"""Pallas TPU kernel: MANO LBS skinning + hand-energy terms in one pass.

The fused hand-energy kernel (hand_energy.py) still pays ~11 ms/call of XLA
glue around itself at the 5120x778 operating point: the skinning einsums
materialize (P, 778, 3, 3) blends in HBM, the vertices round-trip through
HBM, and XLA relayouts them into the kernel's flat (3, M) operand with a
while-loop of row dynamic-update-slices (~1.1 ms/iter — profiled in
BENCHMARKS.md "hand-opt stage attack, part 2"). This kernel moves the
pose-blend + LBS INTO the energy kernel: per particle-tile block it

    vp_c   = pose_map @ posedirs_c + v_shaped_c          (3 dots, (TB, VP))
    skin   = rt_flat @ weights_T                         ((TB*12, VP))
    x_c(p) = sum_y skin[p,3c+y] * vp_y[p] + skin[p,9+c] + offset[c,p]
    sdf, hit = _energy_core(x)                           (shared math)

so vertices never exist in HBM at all. VP is the vertex count padded to a
lane multiple (778 -> 896); pad columns carry garbage and the caller slices
[:, :n_verts] before any reduction (exact — see optimize_hand_pose).

Precision note: in-kernel dots accumulate in f32 (preferred_element_type)
but the MXU rounds f32 INPUTS to bf16 in a single pass — measured identical
to explicit bf16 inputs and to XLA's default-precision einsums (see
BENCHMARKS.md "MXU precision reality"). The skinning here therefore matches
the XLA einsum path's precision class; parity tests on CPU (interpret mode,
true f32) pin the math, and the device deviation vs the composed path is
the shared bf16 input rounding (~0.1 mm on the bench scene).

vmap: batched (multi-sequence) calls launch one (S, G)-grid kernel with
per-sequence asset blocks (_skin_impl_batched) — the same fusion for the
vmapped tracking paths. HOTRACK_NO_FUSED_SKIN_B=1 restores the pure-JAX
fallback that reconstructs the vertices and calls fused_hand_energy (which
handles batched per-sequence assets through the separate batched kernels).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hand_energy import (_energy_core, fourier_da_enabled, fourier_da_perm,
                          fused_hand_energy, pack_two_level, sil_int8_enabled)

import os as _os

# particles per block (must be a multiple of 8: Mosaic requires block
# second-to-minor dims divisible by 8); the energy core runs on SUB-particle
# sub-tiles inside the block so the live silhouette one-hot (H, SUB*VP) and
# MLP activations stay within the ~16 MB VMEM budget (SUB=4 -> ~9 MB at
# 480x640)
TBLK = int(_os.environ.get("HOTRACK_SKIN_TILE", 8))
SUB = int(_os.environ.get("HOTRACK_SKIN_SUB", 4))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _skin_energy_kernel(scale_ref, clamp_ref, fx_ref, fy_ref, cx_ref, cy_ref,
                        pose_ref, rtT_ref, off_ref, rot_t_ref, rt_ref,
                        freqs_ref, packed_ab_ref, posed_ref, vshap_ref, wT_ref,
                        *refs, n_layers: int, h: int, w: int, tb: int,
                        compute_dtype=None, mask_dtype=jnp.bfloat16,
                        fourier_da: bool = False):
    """Blocks: pose (TB, 135); rtT (1, 12*TB, 16) role-major (row = r*TB+p,
    prepared by _skin_impl so slab ops below are sublane-offset-aligned);
    off (TB, 3); fixed: rot_t (3, 3), rt (3, 1), freqs (F, 1),
    packed_ab (HA*WP, HB) two-level mask, posed (3, P135, VP), vshap (3, VP), wT (16, VP), MLP
    weights/biases; outputs (TB, VP) x2; one VMEM scratch (3, SUB*VP) for
    the assembled camera-frame points (Mosaic cannot lane-concat vector
    slices at mismatched sublane offsets — explicit scratch stores normalize
    the layout instead)."""
    sdf_ref, hit_ref, x_ref = refs[-3], refs[-2], refs[-1]
    wb = refs[:-3]
    vp = wT_ref.shape[1]
    sub = min(SUB, tb)

    pm = pose_ref[:]                                       # (TB, 135)
    vp_c = [jnp.dot(pm, posed_ref[c],
                    preferred_element_type=jnp.float32)
            + vshap_ref[c:c + 1, :] for c in range(3)]     # 3 x (TB, VP)
    skin = jnp.dot(rtT_ref[0], wT_ref[:],
                   preferred_element_type=jnp.float32)     # (12*TB, VP)
    off = off_ref[:]                                       # (TB, 3)

    for g in range(tb // sub):
        lo, hi = g * sub, (g + 1) * sub
        vps = [v[lo:hi, :] for v in vp_c]                  # (SUB, VP) slabs
        for c in range(3):
            # verts for SUB particles at once: role-major skin rows make
            # every operand a (SUB, VP) slab at the same sublane offset
            acc = skin[(9 + c) * tb + lo:(9 + c) * tb + hi, :] \
                + off[lo:hi, c:c + 1]
            for y in range(3):
                r = 3 * c + y
                acc = acc + skin[r * tb + lo:r * tb + hi, :] * vps[y]
            for i in range(sub):
                x_ref[c:c + 1, i * vp:(i + 1) * vp] = acc[i:i + 1, :]
        x = x_ref[:]                                       # (3, SUB*VP)

        sdf, hit = _energy_core(x, scale_ref[0, 0], clamp_ref[0, 0],
                                fx_ref[0, 0], fy_ref[0, 0], cx_ref[0, 0],
                                cy_ref[0, 0], rot_t_ref[:], rt_ref[:],
                                freqs_ref[:], packed_ab_ref[:],
                                [r[:] for r in wb], n_layers, h, w,
                                compute_dtype, mask_dtype,
                                fourier_da=fourier_da)
        sdf2 = sdf[None]
        hit2 = hit[None]
        for i in range(sub):
            p = g * sub + i
            sdf_ref[p:p + 1, :] = sdf2[:, i * vp:(i + 1) * vp]
            hit_ref[p:p + 1, :] = hit2[:, i * vp:(i + 1) * vp]


@partial(jax.jit, static_argnames=("hw", "compute_dtype", "interpret"))
def _skin_impl(weights, biases, freqs, scale, clamp, packed, rot_t, rt,
               fx, fy, cx, cy, pose_map, rt_flat, offset, posed_cf, vshap_cf,
               wT, hw, compute_dtype=None, interpret: bool = False):
    h, w = hw
    b = pose_map.shape[0]
    vp = wT.shape[1]
    tb = TBLK
    b_pad = _round_up(b, tb)
    if b_pad != b:
        pad = b_pad - b
        pose_map = jnp.concatenate(
            [pose_map, jnp.broadcast_to(pose_map[:1], (pad,) + pose_map.shape[1:])])
        rt_flat = jnp.concatenate(
            [rt_flat, jnp.tile(rt_flat[:12], (pad, 1))])
        offset = jnp.concatenate(
            [offset, jnp.broadcast_to(offset[:1], (pad, 3))])

    # role-major per block: row r*TB+p so the kernel's slab ops are
    # sublane-aligned (see _skin_energy_kernel docstring)
    rt_role = (rt_flat.astype(jnp.float32)
               .reshape(b_pad // tb, tb, 12, 16)
               .transpose(0, 2, 1, 3)
               .reshape(b_pad // tb, 12 * tb, 16))

    n_layers = len(weights)
    freqs2 = freqs.reshape(-1, 1).astype(jnp.float32)
    packed_ab = pack_two_level(packed,
                               int8=sil_int8_enabled())         # (HA*WP, HB)
    scalars = [jnp.reshape(v, (1, 1)).astype(jnp.float32)
               for v in (scale, clamp, fx, fy, cx, cy)]
    rt2 = jnp.reshape(rt, (3, 1)).astype(jnp.float32)
    off2 = offset.astype(jnp.float32)                           # (B, 3)
    wb = []
    for wgt, bia in zip(weights, biases):
        wb.append(jnp.swapaxes(wgt.astype(jnp.float32), 0, 1))
        wb.append(bia.reshape(-1, 1).astype(jnp.float32))
    da = fourier_da_enabled(freqs2.shape[0])
    if da:
        wb[0] = wb[0][:, fourier_da_perm(freqs2.shape[0])]

    kernel = partial(_skin_energy_kernel, n_layers=n_layers, h=h, w=w, tb=tb,
                     compute_dtype=compute_dtype, fourier_da=da,
                     mask_dtype=jnp.float32 if interpret else jnp.bfloat16)
    fixed = lambda i: (0, 0)  # noqa: E731
    fixed3 = lambda i: (0, 0, 0)  # noqa: E731
    sdf, hit = pl.pallas_call(
        kernel,
        grid=(b_pad // tb,),
        in_specs=[pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM)] * 6
        + [
            pl.BlockSpec((tb, pose_map.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # pose_map
            pl.BlockSpec((1, tb * 12, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),              # rt_role
            pl.BlockSpec((tb, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # offset
            pl.BlockSpec(rot_t.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(freqs2.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(packed_ab.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(posed_cf.shape, fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec(vshap_cf.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(wT.shape, fixed, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(a.shape, fixed, memory_space=pltpu.VMEM)
             for a in wb],
        out_specs=[pl.BlockSpec((tb, vp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((b_pad, vp), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((3, min(SUB, TBLK) * vp), jnp.float32)],
        interpret=interpret,
    )(*scalars, pose_map.astype(jnp.float32), rt_role,
      off2, rot_t.astype(jnp.float32), rt2, freqs2, packed_ab,
      posed_cf.astype(jnp.float32), vshap_cf.astype(jnp.float32),
      wT.astype(jnp.float32), *wb)
    return sdf[:b], hit[:b]


def _skin_energy_kernel_b(scale_ref, clamp_ref, fx_ref, fy_ref, cx_ref,
                          cy_ref, pose_ref, rtT_ref, off_ref, rot_t_ref,
                          rt_ref, freqs_ref, packed_ab_ref, posed_ref,
                          vshap_ref, wT_ref, *refs, n_layers: int, h: int,
                          w: int, tb: int, compute_dtype=None,
                          mask_dtype=jnp.bfloat16, fourier_da: bool = False):
    """Per-sequence grid step (grid (S, G)): same math as
    _skin_energy_kernel with leading (1, ...) sequence-block dims squeezed.
    Scalars arrive as (1, 1, 1) VMEM blocks (per-sequence SMEM scalars fail
    block rules — see sdf_mlp._mlp_kernel_b); posed arrives flattened
    (1, 3*135, VP) so every block stays rank <= 3."""
    sdf_ref, hit_ref, x_ref = refs[-3], refs[-2], refs[-1]
    wb = [r[0] for r in refs[:-3]]
    vp = wT_ref.shape[2]
    p135 = posed_ref.shape[1] // 3
    sub = min(SUB, tb)

    pm = pose_ref[0]                                       # (TB, 135)
    posed = posed_ref[0]                                   # (3*135, VP)
    vp_c = [jnp.dot(pm, posed[c * p135:(c + 1) * p135, :],
                    preferred_element_type=jnp.float32)
            + vshap_ref[0, c:c + 1, :] for c in range(3)]  # 3 x (TB, VP)
    skin = jnp.dot(rtT_ref[0], wT_ref[0],
                   preferred_element_type=jnp.float32)     # (12*TB, VP)
    off = off_ref[0]                                       # (TB, 3)

    for g in range(tb // sub):
        lo, hi = g * sub, (g + 1) * sub
        vps = [v[lo:hi, :] for v in vp_c]                  # (SUB, VP) slabs
        for c in range(3):
            acc = skin[(9 + c) * tb + lo:(9 + c) * tb + hi, :] \
                + off[lo:hi, c:c + 1]
            for y in range(3):
                r = 3 * c + y
                acc = acc + skin[r * tb + lo:r * tb + hi, :] * vps[y]
            for i in range(sub):
                x_ref[c:c + 1, i * vp:(i + 1) * vp] = acc[i:i + 1, :]
        x = x_ref[:]                                       # (3, SUB*VP)

        sdf, hit = _energy_core(x, scale_ref[0, 0, 0], clamp_ref[0, 0, 0],
                                fx_ref[0, 0, 0], fy_ref[0, 0, 0],
                                cx_ref[0, 0, 0], cy_ref[0, 0, 0],
                                rot_t_ref[0], rt_ref[0], freqs_ref[0],
                                packed_ab_ref[0], wb, n_layers, h, w,
                                compute_dtype, mask_dtype,
                                fourier_da=fourier_da)
        sdf2 = sdf[None]
        hit2 = hit[None]
        for i in range(sub):
            p = g * sub + i
            sdf_ref[0, p:p + 1, :] = sdf2[:, i * vp:(i + 1) * vp]
            hit_ref[0, p:p + 1, :] = hit2[:, i * vp:(i + 1) * vp]


@partial(jax.jit, static_argnames=("hw", "compute_dtype", "interpret"))
def _skin_impl_batched(weights, biases, freqs, scale, clamp, packed, rot_t,
                       rt, fx, fy, cx, cy, pose_map, rt_flat, offset,
                       posed_cf, vshap_cf, wT, hw, compute_dtype=None,
                       interpret: bool = False):
    """Per-sequence assets: every arg carries a leading S axis. One launch
    with grid (S, G) — multi-sequence tracking's hand stage keeps the full
    skin+energy fusion instead of falling back to pure-JAX skinning +
    separate batched kernels (the role of _obj_impl_batched on the object
    side)."""
    from .hand_energy import sil_int8_enabled
    h, w = hw
    s_axis, b = pose_map.shape[0], pose_map.shape[1]
    vp = wT.shape[2]
    tb = TBLK
    b_pad = _round_up(b, tb)
    if b_pad != b:
        pad = b_pad - b
        pose_map = jnp.concatenate(
            [pose_map, jnp.broadcast_to(pose_map[:, :1],
                                        (s_axis, pad) + pose_map.shape[2:])],
            axis=1)
        rt_flat = jnp.concatenate(
            [rt_flat, jnp.tile(rt_flat[:, :12], (1, pad, 1))], axis=1)
        offset = jnp.concatenate(
            [offset, jnp.broadcast_to(offset[:, :1], (s_axis, pad, 3))],
            axis=1)
    g_axis = b_pad // tb

    rt_role = (rt_flat.astype(jnp.float32)
               .reshape(s_axis * g_axis, tb, 12, 16)
               .transpose(0, 2, 1, 3)
               .reshape(s_axis * g_axis, 12 * tb, 16))

    n_layers = len(weights)
    freqs3 = freqs.reshape(s_axis, -1, 1).astype(jnp.float32)
    packed_ab = jax.vmap(
        lambda p: pack_two_level(p, int8=sil_int8_enabled()))(packed)
    scalars = [jnp.reshape(v, (s_axis, 1, 1)).astype(jnp.float32)
               for v in (scale, clamp, fx, fy, cx, cy)]
    rt2 = jnp.reshape(rt, (s_axis, 3, 1)).astype(jnp.float32)
    off2 = offset.astype(jnp.float32)
    posed2 = posed_cf.astype(jnp.float32).reshape(s_axis, -1, vp)  # (S,405,VP)
    wb = []
    for wgt, bia in zip(weights, biases):
        wb.append(jnp.swapaxes(wgt.astype(jnp.float32), -1, -2))
        wb.append(bia.reshape(s_axis, -1, 1).astype(jnp.float32))
    da = fourier_da_enabled(freqs3.shape[1])
    if da:
        wb[0] = wb[0][:, :, fourier_da_perm(freqs3.shape[1])]

    kernel = partial(_skin_energy_kernel_b, n_layers=n_layers, h=h, w=w,
                     tb=tb, compute_dtype=compute_dtype, fourier_da=da,
                     mask_dtype=jnp.float32 if interpret else jnp.bfloat16)
    per_seq = lambda s, g: (s, 0, 0)  # noqa: E731
    sdf, hit = pl.pallas_call(
        kernel,
        grid=(s_axis, g_axis),
        in_specs=[pl.BlockSpec((1, 1, 1), per_seq,
                               memory_space=pltpu.VMEM)] * 6
        + [
            pl.BlockSpec((1, tb, pose_map.shape[2]), lambda s, g: (s, g, 0),
                         memory_space=pltpu.VMEM),              # pose_map
            pl.BlockSpec((1, tb * 12, 16),
                         lambda s, g: (s * g_axis + g, 0, 0),
                         memory_space=pltpu.VMEM),              # rt_role
            pl.BlockSpec((1, tb, 3), lambda s, g: (s, g, 0),
                         memory_space=pltpu.VMEM),              # offset
            pl.BlockSpec((1, 3, 3), per_seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 1), per_seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + freqs3.shape[1:], per_seq,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + packed_ab.shape[1:], per_seq,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + posed2.shape[1:], per_seq,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + vshap_cf.shape[1:], per_seq,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + wT.shape[1:], per_seq,
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1,) + a.shape[1:], per_seq,
                          memory_space=pltpu.VMEM) for a in wb],
        out_specs=[pl.BlockSpec((1, tb, vp), lambda s, g: (s, g, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((s_axis, b_pad, vp), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((3, min(SUB, tb) * vp), jnp.float32)],
        interpret=interpret,
    )(*scalars, pose_map.astype(jnp.float32), rt_role, off2,
      rot_t.astype(jnp.float32), rt2, freqs3, packed_ab, posed2,
      vshap_cf.astype(jnp.float32), wT.astype(jnp.float32), *wb)
    return sdf[:, :b], hit[:, :b]


def skin_reference(pose_map, rt_flat, offset, posed_cf, vshap_cf, wT):
    """Pure-JAX vertex reconstruction with the kernel's math — the vmap
    fallback and the parity oracle. Returns verts_cf (3, B, VP)."""
    b = pose_map.shape[0]
    vp_c = jnp.einsum("bp,cpv->cbv", pose_map, posed_cf) \
        + vshap_cf[:, None, :]                              # (3, B, VP)
    skin = jnp.matmul(rt_flat, wT).reshape(b, 12, -1)       # (B, 12, VP)
    r = skin[:, :9].reshape(b, 3, 3, -1)                    # (B, 3, 3, VP)
    t = skin[:, 9:]                                         # (B, 3, VP)
    verts = (jnp.einsum("bcyv,ybv->cbv", r, vp_c) + jnp.moveaxis(t, 1, 0)
             + offset.T[:, :, None])
    return verts


def fused_hand_energy_skin(distilled, packed, obj_rotation, obj_translation,
                           fx, fy, cx, cy, pose_map, rt_flat, offset,
                           posed_cf, vshap_cf, wT, hw, compute_dtype=None,
                           interpret: bool = False):
    """Skin + energy in one kernel: per-candidate (pose_map (B,135),
    rt_flat (B*12,16), offset (B,3)) from mano.layer.mano_skin_inputs, plus
    the per-call constants (posed_cf (3,135,VP), vshap_cf (3,VP),
    wT (16,VP)) -> (sdf (B, VP), hit (B, VP)); slice [:, :n_verts]."""
    rot_t = jnp.swapaxes(obj_rotation, 0, 1)
    rt = jnp.matmul(rot_t, jnp.reshape(obj_translation, (3, 1)))
    return _skin_vmapped(hw, compute_dtype, interpret)(
        tuple(distilled.weights), tuple(distilled.biases), distilled.freqs,
        distilled.scale, distilled.clamp, packed, rot_t, rt, fx, fy, cx, cy,
        pose_map, rt_flat, offset, posed_cf, vshap_cf, wT)


@lru_cache(maxsize=None)
def _skin_vmapped(hw, compute_dtype, interpret):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(weights, biases, freqs, scale, clamp, packed, rot_t, rt,
           fx, fy, cx, cy, pose_map, rt_flat, offset, posed_cf, vshap_cf, wT):
        return _skin_impl(weights, biases, freqs, scale, clamp, packed,
                          rot_t, rt, fx, fy, cx, cy, pose_map, rt_flat,
                          offset, posed_cf, vshap_cf, wT, hw,
                          compute_dtype=compute_dtype, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(x, bt):
            return x if bt else jnp.broadcast_to(x[None],
                                                 (axis_size,) + x.shape)
        (weights, biases, freqs, scale, clamp, packed, rot_t, rt,
         fx, fy, cx, cy, pose_map, rt_flat, offset, posed_cf, vshap_cf,
         wT) = jax.tree.map(bcast, args, tuple(in_batched))

        if not _os.environ.get("HOTRACK_NO_FUSED_SKIN_B"):
            # one (S, G)-grid launch keeps the full skin+energy fusion for
            # multi-sequence tracking (per-sequence asset blocks)
            out = _skin_impl_batched(
                weights, biases, freqs, scale, clamp, packed, rot_t, rt,
                fx, fy, cx, cy, pose_map, rt_flat, offset, posed_cf,
                vshap_cf, wT, hw, compute_dtype=compute_dtype,
                interpret=interpret)
            return out, (True, True)

        # escape hatch: reconstruct verts in JAX and go through
        # fused_hand_energy, whose own custom_vmap handles batched assets

        verts = jax.vmap(skin_reference)(pose_map, rt_flat, offset,
                                         posed_cf, vshap_cf, wT)  # (S,3,B,VP)
        # rot_t = R^T and rt = R^T t  ->  R = rot_t^T, t = R @ rt
        obj_rotation = jnp.swapaxes(rot_t, -1, -2)
        obj_translation = jnp.einsum("sij,sjk->sik", obj_rotation, rt)[..., 0]
        sdf, hit = jax.vmap(lambda dw, db, dfq, ds, dc, pk, orot, otr,
                            vfx, vfy, vcx, vcy, v: fused_hand_energy(
                                _mk(dw, db, dfq, ds, dc), pk, orot, otr,
                                vfx, vfy, vcx, vcy, v, hw,
                                compute_dtype=compute_dtype,
                                interpret=interpret, cbv=True))(
            weights, biases, freqs, scale, clamp, packed, obj_rotation,
            obj_translation, fx, fy, cx, cy, verts)
        return (sdf, hit), (True, True)

    return fn


def _mk(weights, biases, freqs, scale, clamp):
    from ...sdf.distill import DistilledSDF
    return DistilledSDF(tuple(weights), tuple(biases), freqs, scale, clamp)
