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


def test_packed_mask_lookup_vmap_rules():
    """vmap: batched queries fold into the flat axis; batched masks map
    sequentially. Exact vs per-item calls."""
    import jax

    rng = np.random.default_rng(2)
    masks = rng.random((3, 64, 80)) > 0.5
    packed = jnp.stack([pack_mask(jnp.asarray(m)) for m in masks])
    iy = jnp.asarray(rng.integers(0, 64, (3, 200)).astype(np.int32))
    ix = jnp.asarray(rng.integers(0, 80, (3, 200)).astype(np.int32))

    call = lambda p, a, b: packed_mask_lookup(p, a, b, interpret=True)  # noqa: E731

    # shared mask, batched queries
    got = jax.vmap(lambda a, b: call(packed[0], a, b))(iy, ix)
    want = masks[0][np.asarray(iy), np.asarray(ix)].astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got), want)

    # batched masks (sequential-map path)
    got = jax.vmap(call)(packed, iy, ix)
    want = np.stack([masks[i][np.asarray(iy[i]), np.asarray(ix[i])]
                     for i in range(3)]).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got), want)
