"""Fused skinning+energy kernel: in-kernel LBS must match mano_forward, and
the whole kernel must match the compose of mano_forward(channels_first) +
fused_hand_energy(cbv)."""

import numpy as np
import jax
import jax.numpy as jnp

from hotrack_tpu.mano.layer import (mano_forward, mano_skin_inputs,
                                    shape_hand)
from hotrack_tpu.mano.model import synthetic_mano_model
from hotrack_tpu.ops.pallas.hand_energy import fused_hand_energy
from hotrack_tpu.ops.pallas.hand_energy_skin import (fused_hand_energy_skin,
                                                     skin_reference)
from hotrack_tpu.ops.pallas.mask_lookup import pack_mask
from hotrack_tpu.sdf.distill import DistilledSDF


def _distilled(seed, n_freqs=3):
    r = np.random.default_rng(seed)
    dims = [3 + 6 * n_freqs, 128, 128, 1]
    w = tuple(jnp.asarray(r.standard_normal((dims[i], dims[i + 1]))
                          .astype("float32") * 0.3) for i in range(3))
    b = tuple(jnp.asarray(r.standard_normal((dims[i + 1],))
                          .astype("float32") * 0.1) for i in range(3))
    freqs = jnp.asarray((np.pi * 2.0 ** np.arange(n_freqs)).astype("float32"))
    return DistilledSDF(w, b, freqs, jnp.float32(4.0), jnp.float32(0.05))


def _setup(b=6):
    mano = synthetic_mano_model()
    rng = np.random.default_rng(0)
    pose = jnp.asarray(rng.standard_normal((b, 48)).astype("float32") * 0.2)
    trans = jnp.asarray(
        rng.standard_normal((b, 3)).astype("float32") * 0.02
        + np.array([0, 0, 0.45], np.float32))
    beta = jnp.asarray(rng.standard_normal((1, 10)).astype("float32") * 0.3)
    shaped = shape_hand(mano, beta)
    return mano, pose, trans, shaped


def _skin_consts(mano, shaped):
    n_verts = mano.weights.shape[0]
    vp_pad = (n_verts + 127) // 128 * 128
    pad = ((0, 0), (0, 0), (0, vp_pad - n_verts))
    posed_cf = jnp.pad(jnp.transpose(mano.posedirs, (1, 2, 0)), pad)
    vshap_cf = jnp.pad(jnp.swapaxes(shaped[0][0], 0, 1), pad[1:])
    w_t = jnp.pad(jnp.swapaxes(mano.weights, 0, 1), pad[1:])
    return posed_cf, vshap_cf, w_t, n_verts


def test_skin_inputs_match_mano_forward():
    """mano_skin_inputs' kp == mano_forward's kp, and skin_reference's
    reconstructed vertices == mano_forward(channels_first=True)."""
    mano, pose, trans, shaped = _setup()
    verts_cf, kp_ref = mano_forward(mano, pose, trans=trans, shaped=shaped,
                                    channels_first=True)
    kp, pose_map, rt_flat, offset = mano_skin_inputs(mano, pose, trans,
                                                     shaped)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_ref),
                               atol=2e-6)
    posed_cf, vshap_cf, w_t, n_verts = _skin_consts(mano, shaped)
    verts = skin_reference(pose_map, rt_flat, offset, posed_cf, vshap_cf,
                           w_t)[:, :, :n_verts]
    np.testing.assert_allclose(np.asarray(verts), np.asarray(verts_cf),
                               atol=5e-6)


def test_fused_skin_kernel_matches_composed():
    """Interpret-mode kernel == mano_forward + fused_hand_energy(cbv)."""
    mano, pose, trans, shaped = _setup()
    rng = np.random.default_rng(3)
    h, w = 64, 80
    mask = rng.random((h, w)) > 0.5
    packed = pack_mask(jnp.asarray(mask))
    model = _distilled(4)
    rot = jnp.eye(3)
    otrans = jnp.asarray([0.0, 0.0, 0.45], np.float32)
    intr = (jnp.float32(100.0), jnp.float32(90.0),
            jnp.float32(40.0), jnp.float32(32.0))

    verts_cf, _ = mano_forward(mano, pose, trans=trans, shaped=shaped,
                               channels_first=True)
    want_sdf, want_hit = fused_hand_energy(model, packed, rot, otrans, *intr,
                                           verts_cf, (h, w), interpret=True,
                                           cbv=True)

    kp, pose_map, rt_flat, offset = mano_skin_inputs(mano, pose, trans,
                                                     shaped)
    posed_cf, vshap_cf, w_t, n_verts = _skin_consts(mano, shaped)
    got_sdf, got_hit = fused_hand_energy_skin(
        model, packed, rot, otrans, *intr, pose_map, rt_flat, offset,
        posed_cf, vshap_cf, w_t, (h, w), interpret=True)
    np.testing.assert_allclose(np.asarray(got_sdf[:, :n_verts]),
                               np.asarray(want_sdf), atol=3e-5)
    # hit is a 0/1 bit; verts within ~1e-6 can still flip a pixel on an
    # exact boundary — require 99.9% agreement
    agree = np.mean(np.asarray(got_hit[:, :n_verts]) == np.asarray(want_hit))
    assert agree > 0.999, agree


def test_fused_skin_vmap_fallback():
    """Batched (vmapped) calls launch the (S, G)-grid batched kernel by
    default — pinned against per-item kernel calls — and the pure-JAX
    reconstruction escape hatch (HOTRACK_NO_FUSED_SKIN_B=1) agrees too."""
    mano, pose, trans, shaped = _setup(b=4)
    rng = np.random.default_rng(5)
    h, w = 64, 80
    masks = rng.random((2, h, w)) > 0.5
    packed = jnp.stack([pack_mask(jnp.asarray(m)) for m in masks])
    models = jax.tree.map(lambda *xs: jnp.stack(xs), _distilled(6),
                          _distilled(7))
    rots = jnp.stack([jnp.eye(3), jnp.eye(3)])
    otrs = jnp.asarray([[0.0, 0.0, 0.45], [0.01, 0.0, 0.44]], np.float32)
    intr = tuple(jnp.full((2,), v) for v in (100.0, 90.0, 40.0, 32.0))

    kp, pose_map, rt_flat, offset = mano_skin_inputs(mano, pose, trans,
                                                     shaped)
    posed_cf, vshap_cf, w_t, n_verts = _skin_consts(mano, shaped)
    pm2 = jnp.stack([pose_map, pose_map + 0.01])
    rt2 = jnp.stack([rt_flat, rt_flat])
    off2 = jnp.stack([offset, offset + 0.002])

    call = lambda md, pk, r, t, fx, fy, cx, cy, pm, rf, of: (  # noqa: E731
        fused_hand_energy_skin(md, pk, r, t, fx, fy, cx, cy, pm, rf, of,
                               posed_cf, vshap_cf, w_t, (h, w),
                               interpret=True))
    got = jax.vmap(call)(models, packed, rots, otrs, *intr, pm2, rt2, off2)
    for s in range(2):
        m = jax.tree.map(lambda a: a[s], models)
        want = call(m, packed[s], rots[s], otrs[s],
                    *(v[s] for v in intr), pm2[s], rt2[s], off2[s])
        np.testing.assert_allclose(np.asarray(got[0][s, :, :n_verts]),
                                   np.asarray(want[0][:, :n_verts]),
                                   atol=3e-5)
        agree = np.mean(np.asarray(got[1][s, :, :n_verts])
                        == np.asarray(want[1][:, :n_verts]))
        assert agree > 0.999, agree
