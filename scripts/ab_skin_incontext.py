"""IN-CONTEXT cost split of the CURRENT fused skin+energy kernel
(hand_energy_skin.py): time the full optimize_hand_pose program with kernel
variants that skip parts of the work (same protocol as
ab_handopt_incontext.py, which predates the skin fusion / DA fourier / int8
silhouette and ablates the non-skin kernel).

  base         unmodified
  nosil        silhouette replaced by hit = x[2] (isolates the int8 one-hot
               contraction + two-level selects)
  nomlp        MLP+fourier replaced by sdf = clip(obj_z) (isolates MLP cost)
  neither      both skipped (the floor: skinning + glue + transforms)
  noskin       skinning replaced by x = broadcast rest vertices (isolates
               the pose-blend/LBS dots + slab arithmetic + VMEM stores)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    import hotrack_tpu.ops.pallas.hand_energy_skin as hes
    from hotrack_tpu.ops.pallas.hand_energy import _energy_core, _sdf_mlp_core
    from hotrack_tpu.mano.model import synthetic_mano_model
    from hotrack_tpu.opt import hand_pose as hp
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume

    mano = synthetic_mano_model()
    volume = synthetic_box_sdf_setup(151, 0.003)
    distilled = distill_sdf_volume(volume, 0.003, jax.random.PRNGKey(3))
    particles = presample_particles(jax.random.PRNGKey(4), 5120, 16)
    zones = hp.load_contact_zones()
    rng = np.random.RandomState(5)

    hand_shape = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
    theta0 = jnp.asarray(rng.randn(1, 45).astype(np.float32) * 0.2)
    r0 = jnp.eye(3)[None]
    t0_ = jnp.asarray([[0.0], [0.0], [0.45]])[None]
    pred_kp = jnp.asarray(rng.randn(1, 21, 3).astype(np.float32) * 0.04)
    vis = jnp.asarray(np.concatenate([np.ones((1, 18), bool),
                                      np.zeros((1, 3), bool)], 1))
    mask = jnp.asarray(rng.rand(480, 640) > 0.5)
    intr = {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0}
    weights = {"penetrate_sum_loss": 1.0, "sil_loss": 0.1,
               "attraction_loss": 0.05, "vis_regu_loss": 10.0,
               "invis_regu_loss": 0.0, "temporal_smooth": 1.0}

    orig_core = hes._energy_core
    orig_kernel = hes._skin_energy_kernel

    def make_core(skip_sil=False, skip_mlp=False):
        def core(x, scale, clamp, fx, fy, cx, cy, rot_t, rt, freqs,
                 packed_ab, wb, n_layers, h, w, compute_dtype=None,
                 mask_dtype=jnp.bfloat16, ha=None, fourier_da=False):
            obj = jnp.dot(rot_t, x, preferred_element_type=jnp.float32) - rt
            if skip_mlp:
                sdf = jnp.clip(obj, -clamp, clamp)[2]
            else:
                sdf = _sdf_mlp_core(obj, scale, clamp, freqs, wb, n_layers,
                                    compute_dtype, fourier_da=fourier_da)
            if skip_sil:
                hit = x[2]
            else:
                t = x.shape[1]
                z = x[2:3, :]
                iy = jnp.clip((x[1:2, :] / z * fy + cy).astype(jnp.int32),
                              0, h - 1)
                ix = jnp.clip((x[0:1, :] / z * fx + cx).astype(jnp.int32),
                              0, w - 1)
                from hotrack_tpu.ops.pallas.hand_energy import BITS, HA
                ha_ = HA if ha is None else ha
                hawp, hb = packed_ab.shape
                wp = hawp // ha_
                a_idx = iy // hb
                b_idx = iy - a_idx * hb
                rows_b = jax.lax.broadcasted_iota(jnp.int32, (hb, t), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (wp, t), 0)
                onehot_b = (rows_b == b_idx).astype(jnp.int8)
                x_ab = jnp.dot(packed_ab, onehot_b,
                               preferred_element_type=jnp.int32)
                row_words = x_ab[0:wp, :] * (a_idx == 0).astype(jnp.int32)
                for a in range(1, ha_):
                    row_words = row_words + (x_ab[a * wp:(a + 1) * wp, :]
                                             * (a_idx == a).astype(jnp.int32))
                onehot_w = (cols == ix // BITS).astype(jnp.int32)
                word = (jnp.sum(row_words * onehot_w, axis=0, keepdims=True)
                        + 128).astype(jnp.float32)
                b = (ix % BITS).astype(jnp.float32)
                hi = jnp.floor(word * jnp.exp2(-b))
                hi2 = jnp.floor(word * jnp.exp2(-(b + 1.0)))
                hit = (hi - 2.0 * hi2)[0]
            return sdf, hit
        return core

    def make_noskin_kernel():
        def kernel(scale_ref, clamp_ref, fx_ref, fy_ref, cx_ref, cy_ref,
                   pose_ref, rtT_ref, off_ref, rot_t_ref, rt_ref,
                   freqs_ref, packed_ab_ref, posed_ref, vshap_ref, wT_ref,
                   *refs, n_layers, h, w, tb, compute_dtype=None,
                   mask_dtype=jnp.bfloat16, fourier_da=False):
            sdf_ref, hit_ref, x_ref = refs[-3], refs[-2], refs[-1]
            wb = refs[:-3]
            vp = wT_ref.shape[1]
            sub = min(hes.SUB, tb)
            for g in range(tb // sub):
                for c in range(3):
                    for i in range(sub):
                        x_ref[c:c + 1, i * vp:(i + 1) * vp] = \
                            vshap_ref[c:c + 1, :] + off_ref[0:1, c:c + 1]
                x = x_ref[:]
                sdf, hit = hes._energy_core(
                    x, scale_ref[0, 0], clamp_ref[0, 0], fx_ref[0, 0],
                    fy_ref[0, 0], cx_ref[0, 0], cy_ref[0, 0], rot_t_ref[:],
                    rt_ref[:], freqs_ref[:], packed_ab_ref[:],
                    [r[:] for r in wb], n_layers, h, w, compute_dtype,
                    mask_dtype, fourier_da=fourier_da)
                sdf2, hit2 = sdf[None], hit[None]
                for i in range(sub):
                    p = g * sub + i
                    sdf_ref[p:p + 1, :] = sdf2[:, i * vp:(i + 1) * vp]
                    hit_ref[p:p + 1, :] = hit2[:, i * vp:(i + 1) * vp]
        return kernel

    def timed(core, kernel, reps=8, rounds=4):
        hes._energy_core = core
        hes._skin_energy_kernel = kernel
        hes._skin_impl.clear_cache()
        hes._skin_vmapped.cache_clear()
        hp.optimize_hand_pose.clear_cache()

        def full(t):
            kp, th, r, tt, e = hp.optimize_hand_pose(
                mano, particles, zones, volume, hand_shape, r0, t, theta0,
                pred_kp, vis, pred_kp, jnp.asarray(1.0), jnp.eye(3),
                jnp.asarray([0.0, 0.0, 0.45]), mask, intr, weights,
                distilled=distilled)
            return e

        e = full(t0_)
        np.asarray(e)
        best = float("inf")
        for _ in range(rounds):
            t = t0_
            t_start = time.perf_counter()
            for _ in range(reps):
                e = full(t)
                t = t0_ + 0.0 * jnp.minimum(e, 1.0)
            np.asarray(t)
            best = min(best, (time.perf_counter() - t_start) / reps)
        return best * 1000.0

    for name, core, kernel in (
            ("base", orig_core, orig_kernel),
            ("nosil", make_core(skip_sil=True), orig_kernel),
            ("nomlp", make_core(skip_mlp=True), orig_kernel),
            ("neither", make_core(True, True), orig_kernel),
            ("noskin", orig_core, make_noskin_kernel()),
            ("base2", orig_core, orig_kernel),
    ):
        dt = timed(core, kernel)
        print(f"{name:9s} {dt:8.2f} ms/frame  ({dt / 5:6.2f} ms/iter)",
              flush=True)
    hes._energy_core = orig_core
    hes._skin_energy_kernel = orig_kernel


if __name__ == "__main__":
    main()
