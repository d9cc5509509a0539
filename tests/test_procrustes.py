"""Procrustes solver tests: recover known similarity transforms."""

import jax.numpy as jnp
import numpy as np

from hotrack_tpu.pose import procrustes as P
from hotrack_tpu.pose import rotations as R


def rand_rot(rng, b):
    q = rng.standard_normal((b, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(R.unit_quaternion_to_matrix(jnp.asarray(q)))


def test_solve_rot_and_trans_exact():
    rng = np.random.default_rng(0)
    b, n = 8, 6
    x = rng.standard_normal((n, 3))
    rot = rand_rot(rng, b)
    t = rng.standard_normal((b, 3, 1))
    y = np.einsum("bij,nj->bni", rot, x) + t[..., 0][:, None, :]
    r_hat, t_hat = P.solve_rot_and_trans(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(r_hat), rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_hat), t, atol=1e-4)


def test_solve_handles_reflection():
    # degenerate planar points should still yield det(R)=+1
    rng = np.random.default_rng(1)
    x = rng.standard_normal((10, 3))
    x[:, 2] = 0.0
    rot = rand_rot(rng, 4)
    y = np.einsum("bij,nj->bni", rot, x)
    r_hat, _ = P.solve_rot_and_trans(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.linalg.det(np.asarray(r_hat)), 1.0, atol=1e-4)


def test_transform_pts_similarity():
    rng = np.random.default_rng(2)
    b, n = 4, 32
    src = rng.standard_normal((b, n, 3))
    rot = rand_rot(rng, b)
    scale = rng.uniform(0.5, 2.0, (b,))
    trans = rng.standard_normal((b, 3))
    tgt = scale[:, None, None] * np.einsum("bij,bnj->bni", rot, src) + trans[:, None, :]
    r_hat, s_hat, t_hat = P.transform_pts(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(r_hat), rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_hat), scale, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_hat)[..., 0], trans, atol=1e-4)


def test_transform_pts_mask_ignores_outliers():
    rng = np.random.default_rng(3)
    b, n = 2, 64
    src = rng.standard_normal((b, n, 3))
    rot = rand_rot(rng, b)
    trans = rng.standard_normal((b, 3))
    tgt = np.einsum("bij,bnj->bni", rot, src) + trans[:, None, :]
    # corrupt last 16 points, mask them out
    tgt[:, -16:] += 100.0
    mask = np.ones((b, n, 1))
    mask[:, -16:] = 0.0
    r_hat, s_hat, t_hat = P.transform_pts_mask(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask), jnp.asarray(mask),
        given_scale=jnp.ones((b,)),
    )
    np.testing.assert_allclose(np.asarray(r_hat), rot, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_hat)[..., 0], trans, atol=1e-3)


def test_transform_pts_2d():
    rng = np.random.default_rng(4)
    b, n = 4, 16
    theta = rng.uniform(-np.pi, np.pi, (b,))
    rot = np.stack([
        np.stack([np.cos(theta), -np.sin(theta)], -1),
        np.stack([np.sin(theta), np.cos(theta)], -1),
    ], -2)
    src = rng.standard_normal((b, n, 2))
    tgt = np.einsum("bij,bnj->bni", rot, src)
    r_hat, t_hat = P.transform_pts_2d(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(r_hat), rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_hat), 0.0, atol=1e-4)


def test_sym_yaw_refinement():
    # rotation purely about y axis should be recoverable in sym mode
    rng = np.random.default_rng(5)
    b, n = 3, 24
    yaw = rng.uniform(-np.pi, np.pi, (b,))
    rot = np.zeros((b, 3, 3))
    rot[:, 0, 0] = np.cos(yaw)
    rot[:, 0, 2] = np.sin(yaw)
    rot[:, 1, 1] = 1.0
    rot[:, 2, 0] = -np.sin(yaw)
    rot[:, 2, 2] = np.cos(yaw)
    src = rng.standard_normal((b, n, 3))
    tgt = np.einsum("bij,bnj->bni", rot, src)
    r_hat, s_hat, t_hat = P.transform_pts(jnp.asarray(src), jnp.asarray(tgt), sym=True)
    err = np.asarray(R.rot_diff_degree(jnp.asarray(rot), r_hat))
    assert err.max() < 0.5


def test_fast_procrustes_matches_svd():
    """Horn-quaternion fast path vs the SVD solver: same R/t on clean,
    noisy, and near-planar (palm-like) point sets."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        b, n = 16, 6
        x = rng.standard_normal((n, 3)) * 0.05
        if trial % 2:  # palm keypoints are roughly coplanar
            x[:, 2] *= 0.02
        rot = rand_rot(rng, b)
        t = rng.standard_normal((b, 3, 1)) * 0.3
        y = np.einsum("bij,nj->bni", rot, x) + t[..., 0][:, None, :]
        y += rng.standard_normal(y.shape) * 0.002  # sensor-scale noise
        r_svd, t_svd = P.solve_rot_and_trans(jnp.asarray(x), jnp.asarray(y))
        r_fast, t_fast = P.solve_rot_and_trans_fast(jnp.asarray(x), jnp.asarray(y))
        # the arccos-of-trace angle saturates at f32 quantization (~0.03 deg)
        # for solutions this close; compare matrix entries directly instead
        np.testing.assert_allclose(np.asarray(r_fast), np.asarray(r_svd),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(t_fast), np.asarray(t_svd),
                                   atol=1e-5)
        det = np.linalg.det(np.asarray(r_fast))
        np.testing.assert_allclose(det, 1.0, atol=1e-4)


def test_fast_procrustes_reflection_case():
    """Planar sets where unconstrained Kabsch would pick a reflection: the
    quaternion method optimizes over proper rotations only."""
    rng = np.random.default_rng(8)
    x = rng.standard_normal((10, 3))
    x[:, 2] = 0.0
    rot = rand_rot(rng, 4)
    y = np.einsum("bij,nj->bni", rot, x)
    r_svd, _ = P.solve_rot_and_trans(jnp.asarray(x), jnp.asarray(y))
    r_fast, _ = P.solve_rot_and_trans_fast(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.linalg.det(np.asarray(r_fast)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_fast), np.asarray(r_svd), atol=1e-3)
