"""Attention / FFN fusion modules.

Parity: /root/reference/network/models/transformer.py. The reference ships a
TransT-style attention stack but every call site passes attn=False, so only
the LayerNorm + FFN path executes ("used as a high-performance MLP",
transformer.py:1-4, hand_network.py:137-140). Both paths are implemented; the
`attn` flag is static, and in FFN mode flax creates no attention parameters
at all (compact modules materialize params only when executed) — torch
checkpoints' unused attention weights are skipped by the converter
(utils/torch_convert.py).

Channels-last: src (B, N, C).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class AttnModule(nn.Module):
    """MHA (optional) + residual LayerNorm + FFN block
    (attn_module, transformer.py:31-88)."""

    d_model: int = 384
    no_linear: bool = False
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: str | None = None

    @nn.compact
    def __call__(self, src1, pos1, src2, pos2, attn: bool = True,
                 train: bool = False):
        if attn:
            q = src1 if pos1 is None else src1 + pos1
            k = src2 if pos2 is None else src2 + pos2
            out = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead,
                qkv_features=self.d_model,
                dropout_rate=self.dropout,
                deterministic=not train,
            )(q, k, src2)
            src1_new = src1 + nn.Dropout(self.dropout, deterministic=not train)(out)
        else:
            src1_new = src1
        import jax.numpy as jnp
        cd = jnp.dtype(self.dtype) if self.dtype else None
        src1_new = nn.LayerNorm(epsilon=1e-5)(
            src1_new.astype(jnp.float32))  # torch eps; LN stats in f32
        if not self.no_linear:
            h = nn.relu(nn.Dense(self.dim_feedforward, dtype=cd)(src1_new))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.Dense(self.d_model, dtype=cd)(h)
            h = h.astype(jnp.float32)
            src1_new = src1_new + nn.Dropout(self.dropout, deterministic=not train)(h)
            src1_new = nn.LayerNorm(epsilon=1e-5)(src1_new)  # torch eps
        return src1_new


class TransT(nn.Module):
    """2x self + 2x cross attention stack (TransT, transformer.py:16-29)."""

    d_model: int = 384
    dtype: str | None = None

    @nn.compact
    def __call__(self, src1, pos1, src2, pos2, attn: bool = True,
                 train: bool = False):
        src11 = AttnModule(self.d_model, no_linear=True, dtype=self.dtype)(
            src1, pos1, src1, pos1, attn, train)
        src12 = AttnModule(self.d_model, no_linear=True, dtype=self.dtype)(
            src2, pos2, src2, pos2, attn, train)
        result1 = AttnModule(self.d_model, dtype=self.dtype)(
            src11, pos1, src12, pos2, attn, train)
        result2 = AttnModule(self.d_model, dtype=self.dtype)(
            src12, pos2, src11, pos1, attn, train)
        return result1, result2
