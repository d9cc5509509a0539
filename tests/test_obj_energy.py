"""Fused object-energy kernel (transform + SDF MLP + |sdf| reduction):
interpret-mode parity against the XLA composition it replaces, including
pad paths (N not lane-aligned, P not tile-aligned) and the vmap fallback."""

import numpy as np
import jax
import jax.numpy as jnp

from hotrack_tpu.ops.pallas.obj_energy import fused_obj_sdf_energy, obj_rts
from hotrack_tpu.pose.rotations import unit_quaternion_to_matrix
from hotrack_tpu.sdf.distill import DistilledSDF, eval_distilled_sdf_cf


def _distilled(seed, n_freqs=3):
    r = np.random.default_rng(seed)
    dims = [3 + 6 * n_freqs, 128, 128, 1]
    w = tuple(jnp.asarray(r.standard_normal((dims[i], dims[i + 1]))
                          .astype("float32") * 0.3) for i in range(3))
    b = tuple(jnp.asarray(r.standard_normal((dims[i + 1],))
                          .astype("float32") * 0.1) for i in range(3))
    freqs = jnp.asarray((np.pi * 2.0 ** np.arange(n_freqs)).astype("float32"))
    return DistilledSDF(w, b, freqs, jnp.float32(4.0), jnp.float32(0.05))


def _poses(p, seed=0):
    r = np.random.default_rng(seed)
    q = r.standard_normal((p, 4)).astype("float32")
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rot = unit_quaternion_to_matrix(jnp.asarray(q))
    t = jnp.asarray(r.standard_normal((p, 3)).astype("float32") * 0.05)
    return rot, t


def _oracle(model, pcld_cf, rot, t):
    rot_t = jnp.swapaxes(rot, -1, -2)
    obj = (jnp.einsum("pij,jn->pin", rot_t, pcld_cf)
           - jnp.matmul(rot_t, t[..., None]))
    sdf = eval_distilled_sdf_cf(model, obj)
    return jnp.sum(jnp.abs(sdf), axis=-1)


def test_fused_obj_energy_matches_composed():
    model = _distilled(1)
    rng = np.random.default_rng(2)
    for p, n in ((16, 256), (10, 200)):   # aligned + both pad paths
        pcld_cf = jnp.asarray(rng.standard_normal((3, n)).astype("float32")
                              * 0.1)
        rot, t = _poses(p, seed=n)
        want = _oracle(model, pcld_cf, rot, t)
        got = fused_obj_sdf_energy(model, pcld_cf, rot, t, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_fused_obj_energy_vmap_fallback():
    """Batched per-sequence models/clouds route through the pure-JAX
    reconstruction and agree with per-item kernel calls."""
    models = jax.tree.map(lambda *xs: jnp.stack(xs), _distilled(3),
                          _distilled(4))
    rng = np.random.default_rng(5)
    pclds = jnp.asarray(rng.standard_normal((2, 3, 256)).astype("float32")
                        * 0.1)
    rot, t = _poses(8, seed=6)
    rots = jnp.stack([rot, rot])
    ts = jnp.stack([t, t + 0.01])

    got = jax.vmap(lambda m, pc, r, tt: fused_obj_sdf_energy(
        m, pc, r, tt, interpret=True))(models, pclds, rots, ts)
    for s in range(2):
        m = jax.tree.map(lambda a: a[s], models)
        want = fused_obj_sdf_energy(m, pclds[s], rots[s], ts[s],
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got[s]), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_fourier_double_angle_bound():
    """The double-angle Fourier path deviates from classic sin/cos by far
    less than the bf16 rounding the MXU applies to features on TPU."""
    import os
    from hotrack_tpu.ops.pallas.obj_energy import _obj_impl

    model = _distilled(21)
    rng = np.random.default_rng(22)
    pcld_cf = jnp.asarray(rng.standard_normal((3, 256)).astype("float32") * 0.1)
    rot, t = _poses(16, seed=23)
    from hotrack_tpu.ops.pallas.obj_energy import obj_rts
    rts = obj_rts(rot, t)
    args = (tuple(model.weights), tuple(model.biases), model.freqs,
            model.scale, model.clamp, pcld_cf, rts)
    _obj_impl.clear_cache()
    da = _obj_impl(*args, interpret=True)  # DA is the default
    os.environ["HOTRACK_NO_FOURIER_DA"] = "1"
    try:
        _obj_impl.clear_cache()
        classic = _obj_impl(*args, interpret=True)
    finally:
        del os.environ["HOTRACK_NO_FOURIER_DA"]
    _obj_impl.clear_cache()
    # per-point sdf deviation bound ~1e-6; sums over 256 points stay < 1e-4
    np.testing.assert_allclose(np.asarray(da), np.asarray(classic),
                               atol=1e-4, rtol=1e-5)
    assert not np.array_equal(np.asarray(da), np.asarray(classic)), \
        "DA path did not engage"
