"""DeepSDF torch checkpoint -> flax converter: numeric equivalence.

Builds the reference architecture in torch (weight-normed linear stack with
latent re-injection and unconditional final tanh), converts the state dict
with sdf/assets.load_torch_decoder's mapping, and checks outputs match.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from hotrack_tpu.sdf.decoder import SDFDecoder

LATENT = 8
DIMS = (16, 16, 16, 16)
LATENT_IN = (2,)


class TorchDecoder(nn.Module):
    """Reference DeepSDF decoder semantics (deep_sdf_decoder.py:10-103) at a
    test-sized configuration."""

    def __init__(self):
        super().__init__()
        dims = [LATENT + 3] + list(DIMS) + [1]
        self.num_layers = len(dims)
        for l in range(self.num_layers - 1):
            out_dim = dims[l + 1] - dims[0] if l + 1 in LATENT_IN else dims[l + 1]
            setattr(self, f"lin{l}",
                    nn.utils.weight_norm(nn.Linear(dims[l], out_dim)))
        self.relu = nn.ReLU()
        self.th = nn.Tanh()

    def forward(self, x):
        inp = x
        for l in range(self.num_layers - 1):
            if l in LATENT_IN:
                x = torch.cat([x, inp], 1)
            x = getattr(self, f"lin{l}")(x)
            if l < self.num_layers - 2:
                x = self.relu(x)
        return self.th(x)


def _convert(sd):
    params = {}
    for k, v in sd.items():
        name, attr = k.split(".", 1)
        arr = jnp.asarray(v.detach().numpy())
        p = params.setdefault(name, {})
        if attr == "weight_g":
            p["g"] = arr.reshape(-1, 1)
        elif attr == "weight_v":
            p["v"] = arr
        elif attr == "bias":
            p["bias"] = arr
    return params


def test_decoder_numeric_parity():
    torch.manual_seed(0)
    t_dec = TorchDecoder().eval()
    params = _convert(t_dec.state_dict())

    j_dec = SDFDecoder(latent_size=LATENT, dims=DIMS, latent_in=LATENT_IN,
                       dropout=(), norm_layers=tuple(range(len(DIMS) + 1)))
    rng = np.random.RandomState(1)
    x = rng.randn(32, LATENT + 3).astype(np.float32)

    with torch.no_grad():
        want = t_dec(torch.tensor(x)).numpy()
    got = np.asarray(j_dec.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)
