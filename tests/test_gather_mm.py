"""One-hot-MXU gather kernel (ops/pallas/gather_mm.py) parity vs the XLA
take_along_axis path, interpret mode on CPU (compiled on TPU in benchmarks).

Forward must be BIT-EXACT (the 3-plane bf16 split recomposes f32 exactly and
one-hot selection introduces no rounding); backward is the same terms as the
take_along_axis adjoint summed in a different order, so grads are compared
at f32 round-off tolerance, including heavy duplicate-index pressure
(ball-query pad-with-first makes duplicates the common case).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hotrack_tpu.ops.pallas.gather_mm import gather_rows_mm


def _xla_gather(points, idx):
    return jnp.take_along_axis(points, idx[..., None], axis=1)


@pytest.mark.parametrize("b,n,c,s", [(2, 200, 64, 700), (3, 512, 3, 512),
                                     (1, 64, 384, 1344)])
def test_forward_bitwise_f32(b, n, c, s):
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(b, n, c).astype(np.float32) * 100.0)
    idx = jnp.asarray(rng.randint(0, n, (b, s)), jnp.int32)
    want = _xla_gather(pts, idx)
    got = gather_rows_mm(pts, idx, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_forward_bitwise_bf16():
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 128, 32), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, 128, (2, 300)), jnp.int32)
    want = _xla_gather(pts, idx)
    got = gather_rows_mm(pts, idx, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_grad_matches_adjoint_with_duplicates():
    rng = np.random.RandomState(2)
    b, n, c, s = 2, 96, 48, 640
    pts = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    # duplicate-heavy indices: only 7 distinct rows, like pad-with-first
    idx = jnp.asarray(rng.randint(0, 7, (b, s)), jnp.int32)
    cot = jnp.asarray(rng.randn(b, s, c), jnp.float32)

    def loss_k(p):
        return jnp.sum(gather_rows_mm(p, idx, True) * cot)

    def loss_x(p):
        return jnp.sum(_xla_gather(p, idx) * cot)

    gk = jax.grad(loss_k)(pts)
    gx = jax.grad(loss_x)(pts)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=1e-6, atol=1e-5)


def test_grad_unselected_rows_zero():
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(1, 40, 16), jnp.float32)
    idx = jnp.full((1, 520), 5, jnp.int32)  # only row 5 selected
    g = jax.grad(lambda p: jnp.sum(gather_rows_mm(p, idx, True)))(pts)
    g = np.asarray(g)
    assert np.all(g[0, :5] == 0) and np.all(g[0, 6:] == 0)
    np.testing.assert_allclose(g[0, 5], 520.0, rtol=1e-6)


def test_vmap_matches():
    rng = np.random.RandomState(4)
    pts = jnp.asarray(rng.randn(2, 3, 70, 24), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 70, (2, 3, 130)), jnp.int32)
    got = jax.vmap(lambda p, i: gather_rows_mm(p, i, True))(pts, idx)
    want = jax.vmap(_xla_gather)(pts, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_index_points_dispatch_cpu_stays_xla():
    """On CPU the dispatcher must keep the XLA path (kernel is TPU-only)."""
    from hotrack_tpu.ops.pointops import _use_gather_mm
    pts = jnp.zeros((32, 512, 64))
    idx = jnp.zeros((32, 4096), jnp.int32)
    assert not _use_gather_mm(pts, idx)
