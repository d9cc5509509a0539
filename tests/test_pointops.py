"""Point-op parity tests vs. pure-numpy reference semantics.

The numpy oracles implement exactly the semantics documented in
hotrack_tpu/ops/pointops.py (reference CUDA kernels + CPU fallbacks)."""

import jax
import jax.numpy as jnp
import numpy as np

from hotrack_tpu import ops


def np_fps(xyz, npoint):
    """Reference FPS with seed index 0 (CUDA sampling_gpu.cu semantics)."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int64)
    for bi in range(b):
        dist = np.full((n,), 1e10)
        far = 0
        for i in range(npoint):
            out[bi, i] = far
            d = np.sum((xyz[bi] - xyz[bi, far]) ** 2, -1)
            dist = np.minimum(dist, d)
            far = int(np.argmax(dist))
    return out


def np_ball_query(radius, nsample, xyz, new_xyz):
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    out = np.zeros((b, s, nsample), np.int64)
    for bi in range(b):
        for si in range(s):
            d2 = np.sum((xyz[bi] - new_xyz[bi, si]) ** 2, -1)
            hits = np.where(d2 < radius * radius)[0]
            if len(hits) == 0:
                out[bi, si] = 0
            else:
                sel = hits[:nsample]
                pad = np.full((nsample - len(sel),), sel[0], np.int64)
                out[bi, si] = np.concatenate([sel, pad])
    return out


def test_square_distance():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 5, 3)).astype(np.float32)
    b = rng.standard_normal((2, 7, 3)).astype(np.float32)
    d = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
    ref = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_fps_matches_reference():
    rng = np.random.default_rng(1)
    xyz = rng.standard_normal((3, 128, 3)).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 32))
    ref = np_fps(xyz, 32)
    np.testing.assert_array_equal(idx, ref)


def test_fps_valid_mask():
    rng = np.random.default_rng(2)
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    # put far-away junk in padded region; mask it out
    xyz[:, 48:] += 1000.0
    mask = np.ones((2, 64), bool)
    mask[:, 48:] = False
    idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16,
                                               valid_mask=jnp.asarray(mask)))
    assert idx.max() < 48
    ref = np_fps(xyz[:, :48], 16)
    np.testing.assert_array_equal(idx, ref)


def test_knn_point():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((2, 40, 3)).astype(np.float32)
    query = rng.standard_normal((2, 9, 3)).astype(np.float32)
    dist, idx = ops.knn_point(4, jnp.asarray(query), jnp.asarray(data))
    d2 = np.sum((query[:, :, None] - data[:, None]) ** 2, -1)
    ref_idx = np.argsort(d2, axis=-1, kind="stable")[..., :4]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    ref_d = np.sqrt(np.take_along_axis(d2, ref_idx, axis=-1))
    np.testing.assert_allclose(np.asarray(dist), ref_d, atol=1e-3)


def test_ball_query_pad_with_first():
    rng = np.random.default_rng(4)
    xyz = rng.uniform(-1, 1, (2, 100, 3)).astype(np.float32)
    new_xyz = rng.uniform(-1, 1, (2, 10, 3)).astype(np.float32)
    idx = np.asarray(ops.query_ball_point(0.4, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    ref = np_ball_query(0.4, 8, xyz, new_xyz)
    np.testing.assert_array_equal(idx, ref)


def test_group_and_gather():
    rng = np.random.default_rng(5)
    feat = rng.standard_normal((2, 6, 20)).astype(np.float32)
    idx = rng.integers(0, 20, (2, 5)).astype(np.int32)
    g = np.asarray(ops.gather_operation(jnp.asarray(feat), jnp.asarray(idx)))
    for bi in range(2):
        np.testing.assert_allclose(g[bi], feat[bi][:, idx[bi]])
    gidx = rng.integers(0, 20, (2, 5, 3)).astype(np.int32)
    gg = np.asarray(ops.group_operation(jnp.asarray(feat), jnp.asarray(gidx)))
    for bi in range(2):
        for si in range(5):
            np.testing.assert_allclose(gg[bi, :, si], feat[bi][:, gidx[bi, si]])


def test_three_interpolate_and_grad():
    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.standard_normal((2, 4, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 8, (2, 10, 3)).astype(np.int32))
    w = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 10, 3)).astype(np.float32)), -1)
    out = ops.three_interpolate(pts, idx, w)
    assert out.shape == (2, 4, 10)
    ref = np.zeros((2, 4, 10), np.float32)
    for bi in range(2):
        for ni in range(10):
            for k in range(3):
                ref[bi, :, ni] += np.asarray(pts)[bi, :, idx[bi, ni, k]] * np.asarray(w)[bi, ni, k]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    # gradient flows back to features deterministically
    g = jax.grad(lambda p: jnp.sum(ops.three_interpolate(p, idx, w) ** 2))(pts)
    assert np.isfinite(np.asarray(g)).all()


def test_ops_jit_under_vmap():
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.standard_normal((4, 2, 64, 3)).astype(np.float32))
    f = jax.vmap(lambda x: ops.farthest_point_sample(x, 8))
    idx = f(xyz)
    assert idx.shape == (4, 2, 8)


def test_shared_group_indices_exact():
    """_group_indices' shared-top-k slicing must equal per-scale queries:
    knn and ball results are prefix-stable in k for a fixed query."""
    import numpy as np
    from hotrack_tpu.nn.pointnet2 import _group_indices
    from hotrack_tpu.ops.pointops import knn_point, query_ball_point
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.standard_normal((2, 128, 3)) * 0.1)
    centers = jnp.asarray(rng.standard_normal((2, 21, 3)) * 0.1)

    ks = (4, 16, 64)
    shared = _group_indices(xyz, centers, (0.2,) * 3, ks, True, None)
    for k, gi in zip(ks, shared):
        _, direct = knn_point(k, centers, xyz)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(direct))

    radii, ks = (0.1, 0.1, 0.25), (4, 16, 8)
    shared = _group_indices(xyz, centers, radii, ks, False, None)
    for r, k, gi in zip(radii, ks, shared):
        direct = query_ball_point(r, k, xyz, centers, None)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(direct))
