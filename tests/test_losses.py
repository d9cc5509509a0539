"""Generic loss-module tests (models/losses.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from hotrack_tpu.models import losses as L


def test_vector_loss():
    x = jnp.asarray([[3.0, 4.0]])
    np.testing.assert_allclose(float(L.vector_loss(x, "l2")[0]), 5.0)
    np.testing.assert_allclose(float(L.vector_loss(x, "l1")[0]), 7.0)


def test_choose_coord_by_label():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 6), jnp.float32)  # P=2 parts
    labels = jnp.asarray([[0, 1, 0, 1, 0], [1, 1, 0, 0, 1]])
    out = L.choose_coord_by_label(x, labels)
    assert out.shape == (2, 5, 3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(x[0, 0, :3]))
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(x[0, 1, 3:]))


def test_nocs_loss_zero_for_perfect():
    rng = np.random.RandomState(1)
    gt = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
    loss = L.compute_nocs_loss(gt, gt)
    assert float(loss) < 1e-6


def test_sym_nocs_loss_rotation_invariant():
    """Points rotated about y must incur ~zero symmetric NOCS loss."""
    rng = np.random.RandomState(2)
    gt = rng.randn(1, 64, 3).astype(np.float32)
    theta = 0.7
    rot = np.array([[np.cos(theta), 0, np.sin(theta)], [0, 1, 0],
                    [-np.sin(theta), 0, np.cos(theta)]], np.float32)
    pred = gt @ rot.T
    labels = jnp.zeros((1, 64), jnp.int32)
    dist_loss, pwm = L.compute_sym_nocs_loss(
        jnp.asarray(pred), jnp.asarray(gt), labels, pwm_num=32,
        key=jax.random.PRNGKey(0))
    assert float(dist_loss) < 1e-3
    assert float(pwm) < 1e-3


def test_miou_losses():
    labels = jnp.asarray([[0, 1, 0, 1]])
    perfect = jax.nn.one_hot(labels, 2)
    assert float(L.compute_miou_loss(perfect, labels)) < 1e-5
    assert float(L.compute_hard_miou_loss(labels, labels, 2)) < 1e-5
    wrong = jnp.asarray([[1, 0, 1, 0]])
    assert float(L.compute_hard_miou_loss(wrong, labels, 2)) > 0.9


def test_focal_loss_matches_manual():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(10), jnp.float32)
    targets = jnp.asarray(rng.rand(10) > 0.5, jnp.float32)
    got = float(L.compute_focal_loss(logits, targets))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    bce = -(np.asarray(targets) * np.log(p) + (1 - np.asarray(targets)) * np.log(1 - p))
    want = float(np.mean((1 - np.exp(-bce)) ** 2 * bce))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pose_losses():
    rng = np.random.RandomState(4)
    from hotrack_tpu.pose.rotations import rotvec_to_matrix
    r1 = rotvec_to_matrix(jnp.asarray(rng.randn(2, 3) * 0.3, jnp.float32))
    assert float(jnp.max(L.rot_trace_loss(r1, r1, "l1"))) < 1e-5
    assert float(jnp.max(L.rot_yaxis_loss(r1, r1))) < 1e-9
    t = jnp.asarray(rng.randn(2, 3, 1), jnp.float32)
    assert float(jnp.max(L.trans_loss(t, t))) < 1e-9

    pose = {"rotation": r1[:, None],
            "translation": jnp.asarray(rng.randn(2, 1, 3, 1), jnp.float32),
            "scale": jnp.ones((2, 1))}
    pts = jnp.asarray(rng.randn(2, 1, 32, 3), jnp.float32)
    mean, dist = L.compute_point_pose_loss(pose, pose, pts)
    assert float(mean) < 1e-6
    ld = L.compute_part_dof_loss(pose, pose, {"s": "l1", "t": "l1", "r": "l1"})
    assert all(float(v) < 1e-5 for v in ld.values())
