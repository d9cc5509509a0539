"""Particle-optimizer tests: each optimizer must recover/improve poses on
synthetic problems with known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hotrack_tpu.mano import mano_forward, synthetic_mano_model
from hotrack_tpu.opt import (
    kp2length,
    load_contact_zones,
    optimize_hand_pose,
    optimize_hand_shape,
    optimize_obj_pose,
    presample_particles,
)
from hotrack_tpu.pose.rotations import rot_diff_degree, rotvec_to_matrix
from hotrack_tpu.sdf import volume_coords


def _box_volume(size=101, voxel_scale=0.004, half=(0.04, 0.06, 0.02)):
    """Analytic box SDF on a grid (breaks rotational symmetry)."""
    c = volume_coords(size, voxel_scale)
    q = jnp.abs(c) - jnp.asarray(half)
    outside = jnp.linalg.norm(jnp.clip(q, min=0.0), axis=-1)
    inside = jnp.clip(jnp.max(q, axis=-1), max=0.0)
    return (outside + inside).reshape(size, size, size)


def _box_surface_points(n, half, seed=0):
    """Uniform points on a box surface."""
    rng = np.random.RandomState(seed)
    half = np.asarray(half)
    pts = rng.uniform(-1, 1, (n, 3)) * half
    face = rng.randint(0, 3, n)
    sign = rng.choice([-1.0, 1.0], n)
    pts[np.arange(n), face] = sign * half[face]
    return jnp.asarray(pts, jnp.float32)


def test_obj_pose_recovers_perturbation():
    size, scale, half = 101, 0.004, (0.04, 0.06, 0.02)
    vol = _box_volume(size, scale, half)
    obj_pts = _box_surface_points(512, half)

    rng = np.random.RandomState(1)
    gt_r = rotvec_to_matrix(jnp.asarray(rng.randn(3) * 0.5, jnp.float32))
    gt_t = jnp.asarray(rng.randn(3, 1) * 0.1, jnp.float32)
    # camera-frame cloud: x_cam = R x_obj + t  <=>  x_obj = R^T (x_cam - t)
    cam_pts = obj_pts @ gt_r.T + gt_t[:, 0]

    # perturbed init (last-frame pose)
    dr = rotvec_to_matrix(jnp.asarray([0.08, -0.05, 0.06], jnp.float32))
    init_r = gt_r @ dr
    init_t = gt_t + jnp.asarray([[0.01], [-0.008], [0.012]], jnp.float32)

    particles = presample_particles(jax.random.PRNGKey(0), 512, 6)
    r, t, energy = optimize_obj_pose(vol, particles, cam_pts, init_r, init_t,
                                     voxel_scale=scale, bbox_res=size)

    err0 = float(rot_diff_degree(init_r, gt_r))
    err1 = float(rot_diff_degree(r, gt_r))
    terr0 = float(jnp.linalg.norm(init_t - gt_t))
    terr1 = float(jnp.linalg.norm(t - gt_t))
    assert err1 < err0 * 0.7, (err0, err1)
    assert terr1 < terr0 * 0.7, (terr0, terr1)
    assert float(energy) < 0.01


def test_hand_shape_recovers_bone_lengths():
    mano = synthetic_mano_model()
    rng = np.random.RandomState(2)
    gt_beta = jnp.asarray(rng.randn(1, 10) * 2.0, jnp.float32)
    _, gt_kp = mano_forward(mano, jnp.zeros((1, 48)), betas=gt_beta)
    target = kp2length(gt_kp)  # (1, 15)

    particles = presample_particles(jax.random.PRNGKey(3), 1024, 10)
    shape, energy = optimize_hand_shape(mano, particles, target)

    _, kp = mano_forward(mano, jnp.zeros((1, 48)), betas=shape)
    err0 = float(jnp.mean(jnp.abs(
        kp2length(mano_forward(mano, jnp.zeros((1, 48)))[1]) - target)))
    err1 = float(jnp.mean(jnp.abs(kp2length(kp) - target)))
    assert err1 < err0 * 0.5, (err0, err1)


@pytest.mark.slow
def test_hand_pose_improves_energy():
    mano = synthetic_mano_model()
    zones = load_contact_zones(None)
    size, scale = 51, 0.003
    vol = _box_volume(size, scale, (0.03, 0.03, 0.03))

    rng = np.random.RandomState(4)
    gt_theta = jnp.asarray(rng.randn(1, 45) * 0.2, jnp.float32)
    gt_r = rotvec_to_matrix(jnp.asarray(rng.randn(1, 3) * 0.3, jnp.float32))
    gt_t = jnp.asarray([[[0.0], [0.0], [0.45]]], jnp.float32)
    from hotrack_tpu.pose.rotations import matrix_to_rotvec
    aa = matrix_to_rotvec(gt_r)
    _, gt_kp = mano_forward(mano, jnp.concatenate([aa, gt_theta], -1),
                            trans=gt_t[..., 0])

    init_r = gt_r @ rotvec_to_matrix(jnp.asarray([[0.05, 0.03, -0.04]], jnp.float32))
    init_t = gt_t + 0.01
    init_theta = gt_theta + 0.1

    particles = presample_particles(jax.random.PRNGKey(5), 512, 16)
    weights = {"penetrate_sum_loss": 1.0, "sil_loss": 0.1,
               "attraction_loss": 0.05, "vis_regu_loss": 10.0,
               "invis_regu_loss": 0.0, "temporal_smooth": 1.0}
    intr = {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0}
    bg = jnp.zeros((480, 640), bool)

    final_kp, theta, r, t, energy = optimize_hand_pose(
        mano, particles, zones, vol,
        hand_shape=jnp.zeros((1, 10)),
        init_rotation=init_r, init_translation=init_t, init_theta=init_theta,
        pred_kp=gt_kp, vis_mask=jnp.ones((1, 21), bool),
        last_frame_kp=gt_kp, has_last=jnp.asarray(1.0),
        obj_rotation=jnp.eye(3), obj_translation=jnp.asarray([0.0, 0.0, 0.45]),
        background_mask=bg, intrinsics=intr, energy_weight=weights,
        voxel_scale=scale)

    aa_init = matrix_to_rotvec(init_r)
    _, init_kp = mano_forward(mano, jnp.concatenate([aa_init, init_theta], -1),
                              trans=init_t[..., 0])
    err0 = float(jnp.mean(jnp.linalg.norm(init_kp - gt_kp, axis=-1)))
    err1 = float(jnp.mean(jnp.linalg.norm(final_kp - gt_kp, axis=-1)))
    assert err1 < err0, (err0, err1)
    assert np.isfinite(float(energy))
