"""MANO layer parity tests.

Oracle: an independent, loop-based numpy LBS that composes world transforms
joint-by-joint along the kinematic parents — structurally different from the
vectorized level-wise JAX implementation. Also replicates the reference's own
R/T-decomposition sanity check (our_mano.py:391-405): applying the global
rotation outside the layer must match putting it in the pose vector, because
outputs are wrist-centred.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hotrack_tpu.mano import (
    ManoModel,
    mano_forward,
    pca_comps2pose,
    shape_hand,
    synthetic_mano_model,
    template_keypoints,
)
from hotrack_tpu.mano.model import KINTREE_PARENTS, KP_REORDER
from hotrack_tpu.pose.rotations import axis_theta_to_matrix


def _np_rodrigues(aa):
    angle = np.linalg.norm(aa + 1e-8)
    axis = aa / angle
    w = np.cos(angle / 2)
    x, y, z = np.sin(angle / 2) * axis
    return np.array([
        [w*w + x*x - y*y - z*z, 2*x*y - 2*w*z, 2*w*y + 2*x*z],
        [2*w*z + 2*x*y, w*w - x*x + y*y - z*z, 2*y*z - 2*w*x],
        [2*x*z - 2*w*y, 2*w*x + 2*y*z, w*w - x*x - y*y + z*z],
    ])


def _oracle_forward(model: ManoModel, pose, betas, trans):
    """Per-sample numpy LBS with an explicit parent-chain loop."""
    m = jax.tree.map(lambda a: np.asarray(a, np.float64), model)
    v_shaped = np.einsum("vcs,s->vc", m.shapedirs, betas) + m.v_template
    joints = m.j_regressor @ v_shaped
    rots = np.stack([_np_rodrigues(pose[3*i:3*i+3]) for i in range(16)])
    pose_map = (rots[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + np.einsum("vcp,p->vc", m.posedirs, pose_map)

    world = [None] * 16
    for j in range(16):
        p = KINTREE_PARENTS[j]
        local = np.eye(4)
        local[:3, :3] = rots[j]
        local[:3, 3] = joints[j] - (joints[p] if p >= 0 else 0.0)
        world[j] = local if p < 0 else world[p] @ local
    world = np.stack(world)

    jtr = world[:, :3, 3].copy()
    # subtract rest-joint offset, then skin
    skin = world.copy()
    skin[:, :3, 3] -= np.einsum("jab,jb->ja", world[:, :3, :3], joints)
    t = np.einsum("vj,jab->vab", m.weights, skin)
    verts = np.einsum("vab,vb->va", t[:, :3, :3], v_posed) + t[:, :3, 3]

    tips = verts[np.asarray(model.tips)]
    jtr = np.concatenate([jtr, tips], 0)[list(KP_REORDER)]
    center = jtr[0].copy()
    return verts - center + trans, jtr - center + trans


@pytest.fixture(scope="module")
def model():
    return synthetic_mano_model(seed=0)


def test_forward_matches_loop_oracle(model):
    rng = np.random.RandomState(1)
    b = 4
    pose = rng.randn(b, 48).astype(np.float32) * 0.5
    betas = rng.randn(b, 10).astype(np.float32) * 0.5
    trans = rng.randn(b, 3).astype(np.float32) * 0.1

    verts, kp = mano_forward(model, jnp.asarray(pose), jnp.asarray(betas),
                             jnp.asarray(trans))
    for i in range(b):
        ov, ok = _oracle_forward(model, pose[i].astype(np.float64),
                                 betas[i].astype(np.float64),
                                 trans[i].astype(np.float64))
        np.testing.assert_allclose(np.asarray(verts[i]), ov, atol=2e-5)
        np.testing.assert_allclose(np.asarray(kp[i]), ok, atol=2e-5)


def test_rt_decomposition_property(model):
    """Wrist-centred outputs: full pose == R @ (zero-global pose) + trans
    (the reference's own oracle, our_mano.py:391-405)."""
    rng = np.random.RandomState(2)
    pose = jnp.asarray(rng.randn(2, 48).astype(np.float32) * 0.4)
    trans = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.1)
    betas = jnp.zeros((2, 10), jnp.float32)

    _, kp_full = mano_forward(model, pose, betas, trans)

    theta = jnp.linalg.norm(pose[:, :3], axis=-1)
    axis = pose[:, :3] / theta[:, None]
    r = axis_theta_to_matrix(axis, theta)

    pose0 = pose.at[:, :3].set(0.0)
    _, kp0 = mano_forward(model, pose0, betas, jnp.zeros((2, 3)))
    kp_rt = jnp.matmul(kp0, jnp.swapaxes(r, -1, -2)) + trans[:, None]
    np.testing.assert_allclose(np.asarray(kp_rt), np.asarray(kp_full), atol=1e-5)


def test_shaped_fast_path(model):
    """shape_hand precompute must equal the in-forward shape blend
    (register_beta fast path, our_mano.py:211-216, 257-259)."""
    betas = jnp.asarray(np.random.RandomState(3).randn(1, 10), jnp.float32)
    pose = jnp.asarray(np.random.RandomState(4).randn(8, 48), jnp.float32) * 0.3
    shaped = shape_hand(model, betas)
    v1, k1 = mano_forward(model, pose, jnp.broadcast_to(betas, (8, 10)))
    v2, k2 = mano_forward(model, pose, shaped=shaped)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_pca_and_template(model):
    pca = jnp.asarray(np.random.RandomState(5).randn(3, 10), jnp.float32)
    pose45 = pca_comps2pose(model, pca, ncomps=10)
    assert pose45.shape == (3, 45)
    kp = template_keypoints(model)
    assert kp.shape == (1, 21, 3)
    np.testing.assert_allclose(np.asarray(kp[0, 0]), np.zeros(3), atol=1e-6)


def test_grad_and_vmap(model):
    """The LBS must differentiate (hand optimizers) and vmap (particles)."""
    def loss(pose):
        _, kp = mano_forward(model, pose[None])
        return jnp.sum(kp**2)

    g = jax.grad(loss)(jnp.full((48,), 0.1, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))

    poses = jnp.asarray(np.random.RandomState(6).randn(5, 1, 48), jnp.float32)
    kps = jax.vmap(lambda p: mano_forward(model, p)[1])(poses)
    assert kps.shape == (5, 1, 21, 3)
