"""Rotation-conversion parity tests.

Oracle values come from independent closed-form constructions (numpy) and
round-trip identities — the same invariants the reference relies on
(pose_utils/rotations.py runtime asserts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hotrack_tpu.pose import rotations as R


def rand_unit_quat(rng, shape):
    q = rng.standard_normal(shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def np_quat_to_mat(q):
    w, x, y, z = np.moveaxis(q, -1, 0)
    m = np.stack([
        1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w,
        2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w,
        2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y,
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(0)
    q = rand_unit_quat(rng, (64,))
    # fix sign: w >= 0 (quaternion double cover)
    q = q * np.sign(q[..., :1] + 1e-12)
    m = R.unit_quaternion_to_matrix(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(m), np_quat_to_mat(q), atol=1e-5)
    q2 = R.matrix_to_unit_quaternion(m)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-4)


def test_matrix_is_orthonormal():
    rng = np.random.default_rng(1)
    q = rand_unit_quat(rng, (32,))
    m = np.asarray(R.unit_quaternion_to_matrix(jnp.asarray(q)))
    eye = np.broadcast_to(np.eye(3), m.shape)
    np.testing.assert_allclose(m @ m.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_axis_theta_quat_roundtrip():
    rng = np.random.default_rng(2)
    axis = rng.standard_normal((16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rng.uniform(0.1, np.pi - 0.1, (16,))
    q = R.axis_theta_to_quater(jnp.asarray(axis), jnp.asarray(theta))
    a2, t2 = R.quater_to_axis_theta(q)
    np.testing.assert_allclose(np.asarray(t2), theta, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), axis, atol=1e-4)


def test_rotvec_matrix_known_case():
    # 90 degrees about z: x -> y
    rv = jnp.array([[0.0, 0.0, np.pi / 2]])
    m = np.asarray(R.rotvec_to_matrix(rv))[0]
    np.testing.assert_allclose(m @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
    back = np.asarray(R.matrix_to_rotvec(jnp.asarray(m[None])))[0]
    np.testing.assert_allclose(back, [0, 0, np.pi / 2], atol=1e-5)


def test_rot_diff():
    rng = np.random.default_rng(3)
    axis = rng.standard_normal((8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rng.uniform(0.05, np.pi - 0.05, (8,))
    m1 = R.axis_theta_to_matrix(jnp.asarray(axis), jnp.zeros(8))
    m2 = R.axis_theta_to_matrix(jnp.asarray(axis), jnp.asarray(theta))
    d = np.asarray(R.rot_diff_rad(m1, m2))
    np.testing.assert_allclose(d, theta, atol=1e-4)


def test_ortho6d():
    rng = np.random.default_rng(4)
    q = rand_unit_quat(rng, (32,))
    m = np.asarray(R.unit_quaternion_to_matrix(jnp.asarray(q)))
    six = np.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)
    m2 = np.asarray(R.compute_rotation_matrix_from_ortho6d(jnp.asarray(six)))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_9d_projection():
    rng = np.random.default_rng(5)
    q = rand_unit_quat(rng, (16,))
    m = np.asarray(R.unit_quaternion_to_matrix(jnp.asarray(q)))
    noisy = m + 0.01 * rng.standard_normal(m.shape)
    proj = np.asarray(R.compute_rotation_matrix_from_9d(jnp.asarray(noisy)))
    eye = np.broadcast_to(np.eye(3), proj.shape)
    np.testing.assert_allclose(proj @ proj.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(proj), 1.0, atol=1e-5)
    assert np.abs(proj - m).max() < 0.05


def test_mano_axisang_quat_roundtrip():
    rng = np.random.default_rng(6)
    aa = rng.standard_normal((4, 48)) * 0.5
    q = R.mano_axisang2quat(jnp.asarray(aa))
    assert q.shape == (4, 64)
    aa2 = np.asarray(R.mano_quat2axisang(q))
    np.testing.assert_allclose(aa2, aa, atol=1e-3)


def test_jitter_quaternion_angle():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rand_unit_quat(rng, (256,)))
    theta = jnp.full((256, 1), 0.3)
    jq = R.jitter_quaternion(key, q, theta)
    # relative angle = 2 acos(|q . jq|) should equal theta
    dot = jnp.abs(jnp.sum(q * jq, axis=-1))
    ang = 2 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    np.testing.assert_allclose(np.asarray(ang), 0.3, atol=1e-3)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(8)
    q = jnp.asarray(rand_unit_quat(rng, (16,)))
    v = jnp.asarray(rng.standard_normal((16, 3)))
    m = R.unit_quaternion_to_matrix(q)
    out1 = R.quat_rotate(q, v)
    out2 = jnp.einsum("bij,bj->bi", m, v)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
