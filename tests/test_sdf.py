"""SDF decoder / volume tests."""

import numpy as np
import jax
import jax.numpy as jnp

from hotrack_tpu.sdf import (
    SDFDecoder,
    bake_sdf_volume,
    nearest_sdf,
    trilinear_sdf,
    volume_coords,
)


def _sphere_volume(size=65, voxel_scale=0.004, radius=0.08):
    coords = volume_coords(size, voxel_scale)
    sdf = jnp.linalg.norm(coords, axis=-1) - radius
    return sdf.reshape(size, size, size), coords


def test_decoder_shapes_and_range():
    dec = SDFDecoder(latent_size=16, dims=(32, 32, 32, 32), latent_in=(2,),
                     dropout=(0, 1, 2, 3), norm_layers=(0, 1, 2, 3))
    x = jnp.ones((10, 19))
    v = dec.init(jax.random.PRNGKey(0), x)
    out = dec.apply(v, x)
    assert out.shape == (10, 1)
    assert bool(jnp.all(jnp.abs(out) <= 1.0))  # final tanh


def test_volume_coords_layout():
    c = np.asarray(volume_coords(5, 0.1))
    # xyz-major: last axis (z) fastest (optimization_obj.py:95-99)
    np.testing.assert_allclose(c[0], [-0.2, -0.2, -0.2], atol=1e-6)
    np.testing.assert_allclose(c[1], [-0.2, -0.2, -0.1], atol=1e-6)
    np.testing.assert_allclose(c[5], [-0.2, -0.1, -0.2], atol=1e-6)
    np.testing.assert_allclose(c[-1], [0.2, 0.2, 0.2], atol=1e-6)


def test_bake_volume_matches_direct():
    dec = SDFDecoder(latent_size=8, dims=(16, 16), latent_in=(1,),
                     dropout=(0, 1), norm_layers=(0, 1))
    latent = jnp.ones((8,)) * 0.1
    coords = volume_coords(9, 0.05)
    x = jnp.concatenate(
        [jnp.broadcast_to(latent, (coords.shape[0], 8)), coords], -1)
    v = dec.init(jax.random.PRNGKey(1), x)
    vol = bake_sdf_volume(dec.apply, v, latent, coords, 9, norm_scale=2.0,
                          chunk=128)
    direct = dec.apply(v, x)[:, 0].reshape(9, 9, 9) / 2.0
    np.testing.assert_allclose(np.asarray(vol), np.asarray(direct), atol=1e-6)


def test_trilinear_matches_analytic_sphere():
    size, scale, radius = 65, 0.004, 0.08
    vol, _ = _sphere_volume(size, scale, radius)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.09, 0.09, (500, 3)), jnp.float32)
    got = trilinear_sdf(vol, pts, scale, size, bbox_min=-(size // 2) * scale)
    want = np.clip(np.linalg.norm(np.asarray(pts), axis=-1) - radius,
                   -0.05, 0.05)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_trilinear_clamps():
    size, scale = 33, 0.01
    vol, _ = _sphere_volume(size, scale, 0.05)
    far = jnp.asarray([[10.0, 10.0, 10.0]])
    v = trilinear_sdf(vol, far, scale, size, bbox_min=-(size // 2) * scale)
    assert abs(float(v[0])) <= 0.05 + 1e-6


def test_nearest_sdf():
    size, scale, radius = 51, 0.004, 0.06
    vol, _ = _sphere_volume(size, scale, radius)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.04, 0.0, 0.0], [0.0, 0.08, 0.0]])
    got = np.asarray(nearest_sdf(vol, pts, scale, size))
    want = np.array([-radius, 0.04 - radius, 0.08 - radius])
    np.testing.assert_allclose(got, want, atol=scale * 2)
