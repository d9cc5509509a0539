"""Pallas TPU kernel: gather-free binary-mask lookup via bit-packed one-hot
matmuls.

The hand pose optimizer's silhouette energy reads the background mask at the
2D projections of 5120 particles x 778 MANO vertices per iteration
(optimization_hand.py:234-240) — ~4M random gathers from a (480, 640) table.
Random gathers run at ~scalar speed on TPU: measured 68 ms per iteration,
the single largest cost of the hand stage (5 iterations -> ~340 ms/frame).

TPU-native reformulation: pack each mask row into 8-bit words (value < 256,
exactly representable in bf16), then per query
    row_words = onehot(iy) @ packed      (MXU matmul, (T,H)x(H,W/8))
    word      = sum(row_words * onehot(ix // 8))
    bit       = floor(word / 2^b) - 2 * floor(word / 2^(b+1)),  b = ix % 8
— all dense VPU/MXU work, bit-exact against the gather (integers < 256 are
exact in bf16; the one-hot factors are 0/1). ~77k flops per lookup sounds
expensive next to "one load", but the MXU delivers it far faster than the
TPU's scalar gather path.

Used by opt/hand_pose.py on TPU; the XLA gather remains the CPU/fallback
path (HOTRACK_NO_PALLAS_MASK=1 forces it).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BITS = 8      # bits per packed word; keeps words bf16-exact (< 256)
TILE = 2048


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(H, W) bool/0-1 -> (H, ceil(W/8)) f32 words (little-endian bits)."""
    h, w = mask.shape
    wp = _round_up(w, BITS)
    m = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, wp - w)))
    weights = jnp.exp2(jnp.arange(BITS, dtype=jnp.float32))
    return m.reshape(h, wp // BITS, BITS) @ weights


def _lookup_kernel(mask_ref, iy_ref, ix_ref, out_ref):
    t = iy_ref.shape[0]
    h, wp = mask_ref.shape
    iy = iy_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, h), 1)
    onehot_y = (rows == iy[:, None]).astype(jnp.bfloat16)
    row_words = jnp.dot(onehot_y, mask_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)     # (T, wp)
    ix = ix_ref[:]
    w_idx = ix // BITS
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, wp), 1)
    onehot_w = (cols == w_idx[:, None]).astype(jnp.float32)
    word = jnp.sum(row_words * onehot_w, axis=1)                # (T,)
    b = (ix % BITS).astype(jnp.float32)
    hi = jnp.floor(word * jnp.exp2(-b))
    hi2 = jnp.floor(word * jnp.exp2(-(b + 1.0)))
    out_ref[:] = hi - 2.0 * hi2


def packed_mask_lookup(packed: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """packed (H, WP) f32 from pack_mask; iy/ix int32 of any (matching)
    shape, already clipped to [0, H) / [0, W) -> mask values (same shape,
    f32 in {0., 1.}).

    vmap-safe: batched queries fold into the kernel's flat point axis; a
    batched mask (per-sequence masks under a vmapped tracker) falls back to
    a sequential lax.map over the batch."""
    return _lookup_vmapped(interpret)(packed, iy, ix)


@lru_cache(maxsize=None)
def _lookup_vmapped(interpret):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(packed, iy, ix):
        return _lookup_impl(packed, iy, ix, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, packed, iy, ix):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None],
                                                (axis_size,) + x.shape)
        if not in_batched[0]:
            return fn(packed, bcast(iy, in_batched[1]),
                      bcast(ix, in_batched[2])), True
        out = _lookup_impl_batched(packed, bcast(iy, in_batched[1]),
                                   bcast(ix, in_batched[2]),
                                   interpret=interpret)
        return out, True

    return fn


def _lookup_kernel_b(mask_ref, iy_ref, ix_ref, out_ref):
    """Batched-mask grid step: blocks mask (1, H, WP), iy/ix/out (1, 1, T)."""
    t = iy_ref.shape[-1]
    h, wp = mask_ref.shape[1:]
    iy = iy_ref[0, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, h), 1)
    onehot_y = (rows == iy[:, None]).astype(jnp.bfloat16)
    row_words = jnp.dot(onehot_y, mask_ref[0].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    ix = ix_ref[0, 0]
    w_idx = ix // BITS
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, wp), 1)
    onehot_w = (cols == w_idx[:, None]).astype(jnp.float32)
    word = jnp.sum(row_words * onehot_w, axis=1)
    b = (ix % BITS).astype(jnp.float32)
    hi = jnp.floor(word * jnp.exp2(-b))
    hi2 = jnp.floor(word * jnp.exp2(-(b + 1.0)))
    out_ref[0, 0] = hi - 2.0 * hi2


@partial(jax.jit, static_argnames=("interpret",))
def _lookup_impl_batched(packed: jnp.ndarray, iy: jnp.ndarray,
                         ix: jnp.ndarray, interpret: bool = False):
    """Per-sequence masks: packed (S, H, WP), iy/ix (S, ...). One kernel
    launch with grid (S, G) — sequence s's grid steps read mask block s."""
    s_axis = packed.shape[0]
    shape = iy.shape
    iy_f = iy.reshape(s_axis, 1, -1).astype(jnp.int32)
    ix_f = ix.reshape(s_axis, 1, -1).astype(jnp.int32)
    m = iy_f.shape[-1]
    tile = TILE if m >= TILE else _round_up(max(m, 128), 128)
    m_pad = _round_up(m, tile)
    if m_pad != m:
        iy_f = jnp.pad(iy_f, ((0, 0), (0, 0), (0, m_pad - m)))
        ix_f = jnp.pad(ix_f, ((0, 0), (0, 0), (0, m_pad - m)))

    out = pl.pallas_call(
        _lookup_kernel_b,
        grid=(s_axis, m_pad // tile),
        in_specs=[
            pl.BlockSpec((1,) + packed.shape[1:], lambda s, g: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda s, g: (s, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda s, g: (s, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda s, g: (s, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_axis, 1, m_pad), jnp.float32),
        interpret=interpret,
    )(packed.astype(jnp.float32), iy_f, ix_f)
    return out[:, 0, :m].reshape(shape)


@partial(jax.jit, static_argnames=("interpret",))
def _lookup_impl(packed: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    shape = iy.shape
    iy_f = iy.reshape(-1).astype(jnp.int32)
    ix_f = ix.reshape(-1).astype(jnp.int32)
    m = iy_f.shape[0]
    tile = TILE if m >= TILE else _round_up(max(m, 128), 128)
    m_pad = _round_up(m, tile)
    if m_pad != m:
        iy_f = jnp.pad(iy_f, (0, m_pad - m))
        ix_f = jnp.pad(ix_f, (0, m_pad - m))

    fixed = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        _lookup_kernel,
        grid=(m_pad // tile,),
        in_specs=[
            pl.BlockSpec(packed.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad,), jnp.float32),
        interpret=interpret,
    )(packed.astype(jnp.float32), iy_f, ix_f)
    return out[:m].reshape(shape)
