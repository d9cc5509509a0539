"""Generic network blocks: point MLPs, the keypoint rearrange module, and the
NeRF-style positional embedding.

Parity targets: /root/reference/network/models/blocks.py (block builders,
MLPConv1d :147, rearrange_module :226) and transformer.py:90-123
(PositionEmbeddingSine). Channels-last layout throughout.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm, GroupNorm

# four fixed skeleton-topology permutations of the 21 keypoints
# (blocks.py:229-232): neighbors along fingers / across the palm
REARRANGE_1 = (1, 2, 3, 4, 4, 6, 7, 8, 8, 10, 11, 12, 12, 14, 15, 16, 16, 18, 19, 20, 20)
REARRANGE_2 = (17, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15, 0, 17, 18, 19)
REARRANGE_3 = (1, 1, 2, 3, 4, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
REARRANGE_4 = (17, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 17, 18, 19, 20)


class RearrangeModule(nn.Module):
    """Concat 5 skeleton-permuted copies of per-keypoint features + 1x1 conv
    back to `channel` (rearrange_module, blocks.py:226-239).

    Input/output: (B, 21, C) channels-last (the reference permutes along the
    last axis of (B, C, 21); here the kp axis is axis 1).
    """

    channel: int = 384
    dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        perms = [list(REARRANGE_1), list(REARRANGE_2), list(REARRANGE_3),
                 list(REARRANGE_4)]
        x = jnp.concatenate([x] + [x[:, p, :] for p in perms], axis=-1)
        cd = jnp.dtype(self.dtype) if self.dtype else None
        return nn.Dense(self.channel, dtype=cd)(x)


class MLPConv(nn.Module):
    """Per-point MLP with configurable norm and final activation
    (MLPConv1d, blocks.py:147-165). Input (B, ..., C) channels-last."""

    mlp: Sequence[int]
    norm: str = "bn"  # 'bn' | 'gn' | 'none'
    activation: str = "relu"
    last_activation: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.1):
        for i, f in enumerate(self.mlp):
            last = i == len(self.mlp) - 1
            x = nn.Dense(f)(x)
            if not last:
                if self.norm == "bn":
                    x = BatchNorm()(x, train=train, momentum=bn_momentum)
                elif self.norm == "gn":
                    x = GroupNorm()(x)
            acti = self.last_activation if last else self.activation
            if acti == "relu":
                x = nn.relu(x)
            elif acti == "lrelu":
                x = nn.leaky_relu(x, 0.2)
            elif acti == "tanh":
                x = jnp.tanh(x)
            elif acti == "sigmoid":
                x = nn.sigmoid(x)
            elif acti != "none":
                raise ValueError(f"unsupported activation {acti}")
        return x


def position_embedding_sine(coor: jnp.ndarray, num_pos_feats: int = 64) -> jnp.ndarray:
    """NeRF-style sin/cos embedding of coordinates, globally min-max
    normalized (PositionEmbeddingSine, transformer.py:102-123).

    coor (B, N, 3) -> (B, N, 6 * num_pos_feats). Note: the reference computes
    this but never consumes it (hand_network.py:124-125, attn=False); kept for
    the attention-enabled code path.
    """
    normal = 2.0 * (coor - coor.min()) / (coor.max() - coor.min() + 1e-12) - 1.0
    freqs = math.pi * (2.0 ** jnp.arange(num_pos_feats, dtype=coor.dtype))
    k = normal[..., None] * freqs  # (B, N, 3, D)
    x = jnp.concatenate([jnp.sin(k), jnp.cos(k)], axis=-1)  # (B, N, 3, 2D)
    return x.reshape(coor.shape[0], coor.shape[1], -1)
