"""Normalization layers with torch-compatible semantics.

The reference drives BatchNorm momentum through a per-epoch decay schedule
(/root/reference/network/trainer.py:180-190, cfg momentum_original/decay/min).
flax.linen.BatchNorm freezes momentum at construction, so this module takes it
as a call-time argument (a traced scalar is fine) and uses the *torch*
convention: running = (1 - m) * running + m * batch, with unbiased variance in
the running stats and biased variance for the in-batch normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """Channels-last batch norm over all leading axes.

    Equivalent to torch BatchNorm1d/2d on the corresponding channels-first
    layout (blocks.py:69-79 uses norm='bn' everywhere in the reference).
    """

    epsilon: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, momentum=0.1):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), self.param_dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), self.param_dtype))

        if train:
            axes = tuple(range(x.ndim - 1))
            # Defect-corrected (one-round compensated) batch statistics.
            # XLA lowers a plain f32 jnp.mean over ~64k positions to a
            # sequential accumulation whose rounding error reaches ~3e-5 abs
            # (measured on sa1 activations); torch's pairwise reduction stays
            # at ~1e-7. On near-constant channels (ball-query pad-with-first
            # duplication) the 1/sqrt(var+eps) amplification turns that into
            # ~3e-3 normalized-output error — enough to flip ReLU signs and
            # max-pool argmaxes vs a torch run. One residual-mean pass per
            # statistic cancels the first-order accumulation error (train
            # mode only, two extra cheap reductions).
            mean1 = jnp.mean(x, axes)
            mean = mean1 + jnp.mean(x - mean1, axes)
            sq = jnp.square(x - mean)
            var1 = jnp.mean(sq, axes)
            var = var1 + jnp.mean(sq - var1, axes)
            n = x.size // feat
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (1.0 - momentum) * ra_mean.value + momentum * mean
                ra_var.value = (1.0 - momentum) * ra_var.value + momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class GroupNorm(nn.Module):
    """GroupNorm with the reference's channel_per_group=2 convention
    (blocks.py:69-75)."""

    channel_per_group: int = 2
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, momentum=None):
        del train, momentum
        return nn.GroupNorm(num_groups=x.shape[-1] // self.channel_per_group,
                            epsilon=self.epsilon)(x)
