"""Online shape-update subsystem tests (opt/shape_update.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hotrack_tpu.opt.shape_update import (
    estimate_normals,
    merge_observations,
    update_shape,
)
from hotrack_tpu.sdf.decoder import SDFDecoder


def test_estimate_normals_sphere():
    """Normals of a sphere cloud must point radially (toward the camera
    side)."""
    rng = np.random.RandomState(0)
    dirs = rng.randn(400, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = jnp.asarray(dirs * 0.1, jnp.float32)
    camera = jnp.asarray([0.0, 0.0, 1.0])
    normals = np.asarray(estimate_normals(pts, camera, k=16))
    # normal should be parallel to the radial direction
    cos = np.abs(np.sum(normals * dirs, axis=-1))
    assert cos.mean() > 0.95, cos.mean()
    # orientation: toward the camera
    toward = np.sum(normals * (np.asarray(camera) - np.asarray(pts)), axis=-1)
    assert (toward > 0).mean() > 0.99


def test_merge_observations():
    rng = np.random.RandomState(1)
    merged = jnp.zeros((64, 3))
    normals = jnp.zeros((64, 3))
    new_pc = jnp.ones((32, 3))
    new_n = jnp.ones((32, 3))
    valid = jnp.ones((32,), bool)
    out_pc, out_n = merge_observations(merged, normals, new_pc, new_n, valid,
                                       jnp.asarray(2), jax.random.PRNGKey(0))
    replaced = np.asarray(out_pc).sum(-1) > 0
    assert replaced.sum() == 32  # n // merge_num = 64 // 2
    assert out_pc.shape == (64, 3)


@pytest.mark.slow
def test_update_shape_moves_latent_toward_observations():
    """Latent refinement must reduce the decoder's |sdf| on surface points."""
    dec = SDFDecoder(latent_size=8, dims=(32, 32, 32, 32), latent_in=(2,),
                     dropout=(), norm_layers=(0, 1, 2, 3))
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(np.concatenate([np.ones((5, 8)) * 0.1,
                                     rng.randn(5, 3)], -1), jnp.float32)
    variables = dec.init(jax.random.PRNGKey(0), x0)

    dirs = rng.randn(128, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = jnp.asarray(dirs * 0.3, jnp.float32)
    normals = jnp.asarray(dirs, jnp.float32)
    latent0 = jnp.zeros((8,))

    def surf_err(lat):
        lat_in = jnp.broadcast_to(lat, (pts.shape[0], 8))
        return float(jnp.mean(jnp.abs(
            dec.apply(variables, jnp.concatenate([lat_in, pts], -1))[:, 0])))

    lat1 = update_shape(dec.apply, variables, latent0, pts, normals,
                        jax.random.PRNGKey(1), num_iterations=60)
    assert surf_err(lat1) < surf_err(latent0)
