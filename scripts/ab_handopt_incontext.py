"""IN-CONTEXT cost split of the fused hand-energy kernel: time the FULL
optimize_hand_pose program (the only honest measurement through the relay —
standalone kernel calls are floored by ~9 ms dispatch latency) with kernel
variants that skip parts of the work:

  base       unmodified
  nosil      silhouette block replaced by hit=0 (isolates the one-hot matmul
             + (H,T) compare cost)
  nomlp      MLP+fourier replaced by sdf=obj_z (isolates the MLP cost)
  freqs_1    distilled model rebuilt with 1 fourier frequency (timing-only
             random weights; isolates the sin/cos VPU share: 6 vs 36/pt)
  depth_2    2 hidden layers instead of 4 (isolates the 128x128 matmuls)

Variant kernels are monkeypatched into ops.pallas.hand_energy; jit caches
are cleared between variants.
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
    import hotrack_tpu.ops.pallas.hand_energy as he
    from hotrack_tpu.mano.model import synthetic_mano_model
    from hotrack_tpu.opt import hand_pose as hp
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import DistilledSDF, distill_sdf_volume

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

    def rand_model(depth, n_freqs, hidden=128):
        in_dim = 3 + 6 * n_freqs
        dims = [in_dim] + [hidden] * depth + [1]
        ws = tuple(jnp.asarray(rng.randn(dims[i], dims[i + 1])
                               .astype(np.float32)) * 0.05
                   for i in range(len(dims) - 1))
        bs = tuple(jnp.zeros((dims[i + 1],)) for i in range(len(dims) - 1))
        freqs = jnp.float32(np.pi) * (2.0 ** jnp.arange(max(n_freqs, 1)))
        return DistilledSDF(ws, bs, freqs.astype(jnp.float32),
                            distilled.scale, distilled.clamp)

    orig_kernel = he._energy_kernel

    def nosil_kernel(*refs, **kw):
        # run the original then overwrite hit with cheap constant — no:
        # we need to NOT run the silhouette. Re-implement via flag instead.
        raise RuntimeError("unused")

    def make_kernel(skip_sil=False, skip_mlp=False):
        def kernel(scale_ref, clamp_ref, fx_ref, fy_ref, cx_ref, cy_ref,
                   pts_ref, rot_t_ref, rt_ref, freqs_ref, packed_t_ref,
                   *refs, n_layers, h, w, compute_dtype=None,
                   mask_dtype=jnp.bfloat16):
            sdf_ref, hit_ref = refs[-2], refs[-1]
            wb = refs[:-2]
            x = pts_ref[:]
            obj = jnp.dot(rot_t_ref[:], x,
                          preferred_element_type=jnp.float32) - rt_ref[:]
            if skip_mlp:
                c = clamp_ref[0, 0]
                sdf_ref[:] = jnp.clip(obj, -c, c)[2]
            else:
                s = scale_ref[0, 0]
                xo = obj * s
                f = freqs_ref[:]
                parts = [xo]
                for trig in (jnp.sin, jnp.cos):
                    for ci in range(3):
                        parts.append(trig(f * xo[ci:ci + 1, :]))
                hcur = jnp.concatenate(parts, axis=0)
                for i in range(n_layers):
                    wt = wb[2 * i][:]
                    b = wb[2 * i + 1][:]
                    if compute_dtype is not None:
                        hcur = hcur.astype(compute_dtype)
                        wt = wt.astype(compute_dtype)
                    hcur = jnp.dot(wt, hcur,
                                   preferred_element_type=jnp.float32) + b
                    if i < n_layers - 1:
                        hcur = jnp.maximum(hcur, 0.0)
                c = clamp_ref[0, 0]
                sdf_ref[:] = jnp.clip(hcur, -c, c)[0]

            if skip_sil:
                hit_ref[:] = x[2]
            else:
                t = x.shape[1]
                z = x[2:3, :]
                iy = jnp.clip((x[1:2, :] / z * fy_ref[0, 0]
                               + cy_ref[0, 0]).astype(jnp.int32), 0, h - 1)
                ix = jnp.clip((x[0:1, :] / z * fx_ref[0, 0]
                               + cx_ref[0, 0]).astype(jnp.int32), 0, w - 1)
                rows = jax.lax.broadcasted_iota(jnp.int32, (h, t), 0)
                onehot_y = (rows == iy).astype(mask_dtype)
                row_words = jnp.dot(packed_t_ref[:].astype(mask_dtype),
                                    onehot_y,
                                    preferred_element_type=jnp.float32)
                wp = row_words.shape[0]
                cols = jax.lax.broadcasted_iota(jnp.int32, (wp, t), 0)
                onehot_w = (cols == ix // he.BITS).astype(jnp.float32)
                word = jnp.sum(row_words * onehot_w, axis=0, keepdims=True)
                b2 = (ix % he.BITS).astype(jnp.float32)
                hi = jnp.floor(word * jnp.exp2(-b2))
                hi2 = jnp.floor(word * jnp.exp2(-(b2 + 1.0)))
                hit_ref[:] = (hi - 2.0 * hi2)[0]
        return kernel

    def timed(model, kernel, reps=10, rounds=3):
        he._energy_kernel = kernel
        he._fused_impl.clear_cache()
        he._fused_vmapped.cache_clear()
        hp.optimize_hand_pose.clear_cache()

        def full(t):
            kp, th, r, tt, e = hp.optimize_hand_pose(
                mano, particles, zones, volume, hand_shape, r0, t, theta0,
                pred_kp, vis, pred_kp, jnp.asarray(1.0), jnp.eye(3),
                jnp.asarray([0.0, 0.0, 0.45]), mask, intr, weights,
                distilled=model)
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

    for name, model, kernel in (
            ("base", distilled, orig_kernel),
            ("nosil", distilled, make_kernel(skip_sil=True)),
            ("nomlp", distilled, make_kernel(skip_mlp=True)),
            ("nomlp_nosil", distilled, make_kernel(skip_mlp=True,
                                                   skip_sil=True)),
            ("freqs_1", rand_model(4, 1), orig_kernel),
            ("depth_2", rand_model(2, len(distilled.freqs)), orig_kernel),
            ("base2", distilled, orig_kernel),
    ):
        dt = timed(model, kernel)
        print(f"{name:12s} {dt:8.2f} ms/frame  ({dt / 5:6.2f} ms/iter)",
              flush=True)
    he._energy_kernel = orig_kernel


if __name__ == "__main__":
    main()
