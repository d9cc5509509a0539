"""Hand-opt regression hunt: full-optimizer timings across iteration counts
and kernel modes (fused vs separate, one-hot precision HIGHEST vs default,
bf16 MLP). Slope over iterations = per-iter cost; intercept = fixed cost."""

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

    def timed(iters, reps=10):
        hp.optimize_hand_pose.clear_cache()

        def full(t):
            kp, th, r, tt, e = hp.optimize_hand_pose(
                mano, particles, zones, volume, hand_shape, r0, t, theta0,
                pred_kp, vis, pred_kp, jnp.asarray(1.0), jnp.eye(3),
                jnp.asarray([0.0, 0.0, 0.45]), mask, intr, weights,
                iterations=iters, distilled=distilled)
            return e

        e = full(t0_)
        np.asarray(e)
        t = t0_
        t_start = time.perf_counter()
        for _ in range(reps):
            e = full(t)
            t = t0_ + 0.0 * jnp.minimum(e, 1.0)
        np.asarray(t)
        return (time.perf_counter() - t_start) / reps * 1000.0

    for label, env in (
            ("fused f32", {}),
            ("fused bf16", {"HOTRACK_SDF_BF16": "1"}),
            ("separate kernels", {"HOTRACK_NO_FUSED_ENERGY": "1"}),
            ("separate bf16", {"HOTRACK_NO_FUSED_ENERGY": "1",
                               "HOTRACK_SDF_BF16": "1"}),
    ):
        for k in ("HOTRACK_SDF_BF16", "HOTRACK_NO_FUSED_ENERGY"):
            os.environ.pop(k, None)
        os.environ.update(env)
        t1, t5 = timed(1), timed(5)
        per_iter = (t5 - t1) / 4.0
        print(f"{label:18s}: iters=1 {t1:7.2f} ms, iters=5 {t5:7.2f} ms "
              f"-> {per_iter:6.2f} ms/iter + {t1 - per_iter:6.2f} fixed")


if __name__ == "__main__":
    main()
