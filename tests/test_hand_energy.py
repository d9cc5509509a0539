"""Fused hand-energy kernel: parity with the separate SDF + mask paths."""

import numpy as np
import jax
import jax.numpy as jnp

from hotrack_tpu.ops.pallas.hand_energy import fused_hand_energy
from hotrack_tpu.ops.pallas.mask_lookup import pack_mask
from hotrack_tpu.sdf.distill import DistilledSDF, _raw_sdf


def _model(seed, n_freqs=4):
    r = np.random.default_rng(seed)
    dims = [3 + 6 * n_freqs, 128, 128, 1]
    w = tuple(jnp.asarray(r.standard_normal((dims[i], dims[i + 1]))
                          .astype("float32") * 0.3) for i in range(3))
    b = tuple(jnp.asarray(r.standard_normal((dims[i + 1],))
                          .astype("float32") * 0.1) for i in range(3))
    freqs = jnp.asarray((np.pi * 2.0 ** np.arange(n_freqs)).astype("float32"))
    return DistilledSDF(w, b, freqs, jnp.float32(4.0), jnp.float32(0.05))


def _reference(model, mask, rot, trans, fx, fy, cx, cy, pts_cf, h, w):
    pts = jnp.swapaxes(pts_cf, -1, -2)                      # (..., N, 3)
    obj = jnp.matmul(pts - jnp.asarray(trans)[None], rot)   # row-vec form
    sdf = jnp.clip(_raw_sdf(model, obj), -model.clamp, model.clamp)
    z = pts[..., 2]
    iy = np.clip((np.asarray(pts[..., 1] / z) * fy + cy).astype(np.int32),
                 0, h - 1)
    ix = np.clip((np.asarray(pts[..., 0] / z) * fx + cx).astype(np.int32),
                 0, w - 1)
    hit = np.asarray(mask)[iy, ix].astype(np.float32)
    return np.asarray(sdf), hit


def test_fused_hand_energy_matches_separate():
    rng = np.random.default_rng(0)
    h, w = 96, 128
    mask = rng.random((h, w)) > 0.5
    packed = pack_mask(jnp.asarray(mask))
    model = _model(1)
    q = rng.standard_normal(4); q /= np.linalg.norm(q)
    qw, qx, qy, qz = q
    rot = jnp.asarray(np.array([
        [1 - 2*(qy*qy+qz*qz), 2*(qx*qy-qw*qz), 2*(qx*qz+qw*qy)],
        [2*(qx*qy+qw*qz), 1 - 2*(qx*qx+qz*qz), 2*(qy*qz-qw*qx)],
        [2*(qx*qz-qw*qy), 2*(qy*qz+qw*qx), 1 - 2*(qx*qx+qy*qy)]],
        np.float32))
    trans = np.asarray([0.02, -0.01, 0.03], np.float32)
    fx, fy, cx, cy = 120.0, 115.0, 64.0, 48.0

    pts = rng.standard_normal((2, 3, 300)).astype("float32") * 0.1
    pts[:, 2] += 0.6   # positive depth
    pts_cf = jnp.asarray(pts)

    sdf, hit = fused_hand_energy(
        model, packed, rot, jnp.asarray(trans), jnp.float32(fx),
        jnp.float32(fy), jnp.float32(cx), jnp.float32(cy), pts_cf, (h, w),
        interpret=True)
    want_sdf, want_hit = _reference(model, mask, rot, trans, fx, fy, cx, cy,
                                    pts_cf, h, w)
    np.testing.assert_allclose(np.asarray(sdf), want_sdf, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(hit), want_hit)


def test_fused_hand_energy_twolevel_pad_path():
    """h not divisible by the two-level HA=4 split (pack_two_level ceil-pads
    HB): hit stays gather-exact, incl. boundary rows 0 / h-1 / HB edges."""
    rng = np.random.default_rng(11)
    h, w = 90, 128                       # hb = ceil(90/4) = 23, 2 pad rows
    mask = rng.random((h, w)) > 0.5
    packed = pack_mask(jnp.asarray(mask))
    model = _model(12)
    rot = jnp.eye(3)
    trans = np.asarray([0.0, 0.0, 0.0], np.float32)
    fx, fy, cx, cy = 120.0, 115.0, 64.0, 45.0

    pts = rng.standard_normal((3, 256)).astype("float32") * 0.2
    pts[2] = np.abs(pts[2]) + 0.4
    # force exact boundary projections into the batch: iy = 0, h-1, and the
    # hb-edge rows 22/23/45/46
    z = pts[2]
    for k, row in enumerate((0, h - 1, 22, 23, 45, 46, 68, 69)):
        # +0.5 targets the cell centre so the f32 kernel and the f64 numpy
        # oracle truncate to the same row
        pts[1, k] = (row + 0.5 - cy) / fy * z[k]
    pts_cf = jnp.asarray(pts)

    sdf, hit = fused_hand_energy(
        model, packed, rot, jnp.asarray(trans), jnp.float32(fx),
        jnp.float32(fy), jnp.float32(cx), jnp.float32(cy), pts_cf, (h, w),
        interpret=True)
    want_sdf, want_hit = _reference(model, mask, rot, trans, fx, fy, cx, cy,
                                    pts_cf, h, w)
    np.testing.assert_allclose(np.asarray(sdf), want_sdf, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(hit), want_hit)


def test_fused_hand_energy_vmap_fallback():
    """Batched per-sequence assets route through the separate batched
    kernels; results equal per-item fused calls."""
    rng = np.random.default_rng(3)
    h, w = 64, 80
    masks = rng.random((2, h, w)) > 0.5
    packed = jnp.stack([pack_mask(jnp.asarray(m)) for m in masks])
    models = jax.tree.map(lambda *xs: jnp.stack(xs), _model(4), _model(5))
    rots = jnp.stack([jnp.eye(3), jnp.eye(3)])
    transs = jnp.asarray(rng.standard_normal((2, 3)).astype("float32") * 0.02)
    intr = jnp.full((2,), 100.0), jnp.full((2,), 90.0), \
        jnp.full((2,), 40.0), jnp.full((2,), 32.0)
    pts = rng.standard_normal((2, 3, 200)).astype("float32") * 0.1
    pts[:, 2] += 0.5
    pts = jnp.asarray(pts)

    call = lambda md, pk, r, t, fx, fy, cx, cy, p: fused_hand_energy(  # noqa: E731
        md, pk, r, t, fx, fy, cx, cy, p, (h, w), interpret=True)
    got_sdf, got_hit = jax.vmap(call)(
        models, packed, rots, transs, *intr, pts)
    for s in range(2):
        m = jax.tree.map(lambda a: a[s], models)
        want_sdf, want_hit = call(m, packed[s], rots[s], transs[s],
                                  intr[0][s], intr[1][s], intr[2][s],
                                  intr[3][s], pts[s])
        np.testing.assert_allclose(np.asarray(got_sdf[s]),
                                   np.asarray(want_sdf), atol=3e-5)
        np.testing.assert_array_equal(np.asarray(got_hit[s]),
                                      np.asarray(want_hit))


def test_fused_hand_energy_cbv_layouts():
    """cbv=True ((3, ..., N) vertices, mano_forward channels_first layout)
    matches the (..., 3, N) path bit-for-bit, unbatched, under vmap over
    points, and through the batched-assets fallback."""
    rng = np.random.default_rng(7)
    h, w = 64, 80
    mask = rng.random((h, w)) > 0.5
    packed = pack_mask(jnp.asarray(mask))
    model = _model(8)
    rot = jnp.eye(3)
    trans = jnp.asarray([0.01, -0.02, 0.015], np.float32)
    fxfycxcy = (jnp.float32(100.0), jnp.float32(90.0),
                jnp.float32(40.0), jnp.float32(32.0))

    pts = rng.standard_normal((4, 3, 150)).astype("float32") * 0.1
    pts[:, 2] += 0.5
    pts_cf = jnp.asarray(pts)                       # (P, 3, N)
    pts_cbv = jnp.moveaxis(pts_cf, 1, 0)            # (3, P, N)

    want = fused_hand_energy(model, packed, rot, trans, *fxfycxcy,
                             pts_cf, (h, w), interpret=True)
    got = fused_hand_energy(model, packed, rot, trans, *fxfycxcy,
                            pts_cbv, (h, w), interpret=True, cbv=True)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # vmap over a leading sequence axis of the points only
    seq_cbv = jnp.stack([pts_cbv, pts_cbv + 0.01])  # (S, 3, P, N)
    call = lambda p: fused_hand_energy(model, packed, rot, trans,  # noqa: E731
                                       *fxfycxcy, p, (h, w),
                                       interpret=True, cbv=True)
    got_v = jax.vmap(call)(seq_cbv)
    for s in range(2):
        want_s = call(seq_cbv[s])
        for a, b in zip((got_v[0][s], got_v[1][s]), want_s):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # batched assets + cbv points -> separate-kernel fallback
    packed2 = jnp.stack([packed, packed])
    models2 = jax.tree.map(lambda *xs: jnp.stack(xs), _model(8), _model(9))
    rots2 = jnp.stack([rot, rot])
    trans2 = jnp.stack([trans, trans + 0.005])
    intr2 = tuple(jnp.stack([v, v]) for v in fxfycxcy)
    call2 = lambda md, pk, r, t, fx, fy, cx, cy, p: fused_hand_energy(  # noqa: E731
        md, pk, r, t, fx, fy, cx, cy, p, (h, w), interpret=True, cbv=True)
    got_b = jax.vmap(call2)(models2, packed2, rots2, trans2, *intr2, seq_cbv)
    for s in range(2):
        m = jax.tree.map(lambda a: a[s], models2)
        want_b = fused_hand_energy(
            m, packed2[s], rots2[s], trans2[s],
            *(v[s] for v in intr2), jnp.moveaxis(seq_cbv[s], 0, 1),
            (h, w), interpret=True)
        np.testing.assert_allclose(np.asarray(got_b[0][s]),
                                   np.asarray(want_b[0]), atol=3e-5)
        np.testing.assert_array_equal(np.asarray(got_b[1][s]),
                                      np.asarray(want_b[1]))


def test_fused_hand_energy_int8_silhouette_exact():
    """The default int8 silhouette (s8 x s8 -> s32 one-hot contraction,
    -128 word offset) stays gather-exact, incl. forced boundary-row
    projections, and matches the bf16 path (HOTRACK_NO_SIL_I8=1)
    bit-for-bit."""
    import os
    from hotrack_tpu.ops.pallas.hand_energy import _fused_impl

    rng = np.random.default_rng(21)
    h, w = 90, 128
    mask = rng.random((h, w)) > 0.5
    packed = pack_mask(jnp.asarray(mask))
    model = _model(22)
    rot = jnp.eye(3)
    trans = np.asarray([0.0, 0.0, 0.0], np.float32)
    fx, fy, cx, cy = 120.0, 115.0, 64.0, 45.0

    pts = rng.standard_normal((3, 256)).astype("float32") * 0.2
    pts[2] = np.abs(pts[2]) + 0.4
    z = pts[2]
    for k, row in enumerate((0, h - 1, 22, 23, 45, 46, 68, 69)):
        pts[1, k] = (row + 0.5 - cy) / fy * z[k]
    pts_cf = jnp.asarray(pts)

    args = (model, packed, rot, jnp.asarray(trans), jnp.float32(fx),
            jnp.float32(fy), jnp.float32(cx), jnp.float32(cy), pts_cf, (h, w))
    _fused_impl.clear_cache()
    sdf, hit = fused_hand_energy(*args, interpret=True)  # int8 is the default
    os.environ["HOTRACK_NO_SIL_I8"] = "1"
    try:
        _fused_impl.clear_cache()
        sdf_bf, hit_bf = fused_hand_energy(*args, interpret=True)
    finally:
        del os.environ["HOTRACK_NO_SIL_I8"]
    _fused_impl.clear_cache()
    want_sdf, want_hit = _reference(model, mask, rot, trans, fx, fy, cx, cy,
                                    pts_cf, h, w)
    np.testing.assert_allclose(np.asarray(sdf), want_sdf, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(hit), want_hit)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(hit_bf))
    np.testing.assert_array_equal(np.asarray(sdf), np.asarray(sdf_bf))
