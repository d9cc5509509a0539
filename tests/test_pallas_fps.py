"""Pallas FPS kernel parity vs. the XLA reference implementation.

Runs in interpret mode on CPU (compiled on TPU in benchmarks)."""

import numpy as np
import jax
import jax.numpy as jnp

from hotrack_tpu.ops.pointops import farthest_point_sample
from hotrack_tpu.ops.pallas.fps import farthest_point_sample_pallas


def test_fps_pallas_parity():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(3, 200, 3), jnp.float32)
    want = farthest_point_sample(xyz, 64)
    got = farthest_point_sample_pallas(xyz, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_pallas_masked_parity():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(2, 160, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(2, 160) > 0.3)
    mask = mask.at[:, 0].set(True)  # seed point must be valid
    want = farthest_point_sample(xyz, 32, mask)
    got = farthest_point_sample_pallas(xyz, 32, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
