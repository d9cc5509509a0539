"""DeepSDF decoder as a flax module.

Parity: /root/reference/third_party/DeepSDF/deep_sdf_decoder.py:10-103 — an
8x512 weight-normalized MLP over [latent(256), xyz(3)], with the full input
re-concatenated at the layers listed in `latent_in` (so those layers' widths
shrink by latent_size+3), ReLU + dropout 0.2 between layers, and a final tanh
(the reference applies `self.th` unconditionally, deep_sdf_decoder.py:98-99,
regardless of use_tanh).

Weight norm is implemented explicitly (params v, g; W = g * v / ||v||_row) to
match torch's nn.utils.weight_norm parameterization so released DeepSDF
checkpoints convert weight-for-weight.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class WNDense(nn.Module):
    """Dense layer with torch-style weight normalization over output rows."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(), (self.features, in_dim))
        g = self.param("g", nn.initializers.ones, (self.features, 1))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        w = g * v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return x @ w.T + b


class SDFDecoder(nn.Module):
    """DeepSDF MLP. __call__(x (N, latent_size+3)) -> sdf (N, 1)."""

    latent_size: int = 256
    dims: Sequence[int] = (512, 512, 512, 512, 512, 512, 512, 512)
    dropout: Sequence[int] = (0, 1, 2, 3, 4, 5, 6, 7)
    dropout_prob: float = 0.2
    norm_layers: Sequence[int] = (0, 1, 2, 3, 4, 5, 6, 7)
    latent_in: Sequence[int] = (4,)
    weight_norm: bool = True
    use_tanh: bool = False  # pre-final tanh; the final tanh is always applied

    @nn.compact
    def __call__(self, x, train: bool = False):
        all_dims = [self.latent_size + 3] + list(self.dims) + [1]
        num_layers = len(all_dims)
        inp = x
        for l in range(num_layers - 1):
            if l + 1 in self.latent_in:
                out_dim = all_dims[l + 1] - all_dims[0]
            else:
                out_dim = all_dims[l + 1]
            if l in self.latent_in:
                x = jnp.concatenate([x, inp], axis=-1)
            if self.weight_norm and l in self.norm_layers:
                x = WNDense(out_dim, name=f"lin{l}")(x)
            else:
                x = nn.Dense(out_dim, name=f"lin{l}")(x)
                if l in self.norm_layers:
                    x = nn.LayerNorm(name=f"bn{l}")(x)
            if l == num_layers - 2 and self.use_tanh:
                x = jnp.tanh(x)
            if l < num_layers - 2:
                x = nn.relu(x)
                if l in self.dropout:
                    x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return jnp.tanh(x)  # unconditional final tanh (deep_sdf_decoder.py:98-99)
