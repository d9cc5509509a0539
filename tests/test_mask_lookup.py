"""Bit-packed mask lookup kernel: exact parity with the direct gather."""

import numpy as np
import jax.numpy as jnp

from hotrack_tpu.ops.pallas.mask_lookup import pack_mask, packed_mask_lookup


def test_packed_mask_lookup_exact():
    rng = np.random.default_rng(0)
    for h, w in ((480, 640), (97, 123)):
        mask = rng.random((h, w)) > 0.5
        packed = pack_mask(jnp.asarray(mask))
        iy = rng.integers(0, h, size=(7, 501)).astype(np.int32)
        ix = rng.integers(0, w, size=(7, 501)).astype(np.int32)
        got = packed_mask_lookup(packed, jnp.asarray(iy), jnp.asarray(ix),
                                 interpret=True)
        want = mask[iy, ix].astype(np.float32)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_packed_mask_structured_patterns():
    """Edge patterns: all-ones, all-zeros, single-pixel, column stripes."""
    h, w = 64, 80
    for mk in (np.zeros((h, w), bool), np.ones((h, w), bool),
               np.eye(h, w, dtype=bool),
               (np.arange(w)[None, :] % 2 == 0) * np.ones((h, 1), bool)):
        packed = pack_mask(jnp.asarray(mk))
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        got = packed_mask_lookup(packed, jnp.asarray(yy.astype(np.int32)),
                                 jnp.asarray(xx.astype(np.int32)),
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      mk.astype(np.float32))
