"""Robust interleaved A/B of fused f32 vs bf16 hand-opt (5 iters): both modes
compiled first, then alternately timed over several rounds — reporting
per-round numbers and minima so tunnel drift can't masquerade as a result."""

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

    def make(bf16):
        """Build a jitted closure for the mode, compiled up front."""
        if bf16:
            os.environ["HOTRACK_SDF_BF16"] = "1"
        else:
            os.environ.pop("HOTRACK_SDF_BF16", None)
        hp.optimize_hand_pose.clear_cache()

        def full(t):
            kp, th, r, tt, e = hp.optimize_hand_pose(
                mano, particles, zones, volume, hand_shape, r0, t, theta0,
                pred_kp, vis, pred_kp, jnp.asarray(1.0), jnp.eye(3),
                jnp.asarray([0.0, 0.0, 0.45]), mask, intr, weights,
                distilled=distilled)
            return e, kp

        e, kp = full(t0_)
        np.asarray(e)
        return full, np.asarray(kp)

    f32, kp32 = make(False)
    # NOTE: clear_cache above would drop f32's compiled trace — but the env
    # flag is baked into the traced program, so rebuild order matters: make
    # bf16 second and re-trace f32 lazily on first timed call (cache on disk
    # makes the retrace cheap). To keep both hot, re-make f32 per round.
    bf16, kp16 = make(True)
    print(f"final-kp max diff bf16 vs f32: "
          f"{np.abs(kp16 - kp32).max() * 1000:.3f} mm")

    def time_mode(full, reps=20):
        t = t0_
        t_start = time.perf_counter()
        for _ in range(reps):
            e, kp = full(t)
            t = t0_ + 0.0 * jnp.minimum(e, 1.0)
        np.asarray(t)
        return (time.perf_counter() - t_start) / reps * 1000.0

    results = {"f32": [], "bf16": []}
    for rnd in range(3):
        f32, _ = make(False)
        results["f32"].append(time_mode(f32))
        bf16, _ = make(True)
        results["bf16"].append(time_mode(bf16))
        print(f"round {rnd}: f32 {results['f32'][-1]:7.2f} ms  "
              f"bf16 {results['bf16'][-1]:7.2f} ms")
    print(f"min: f32 {min(results['f32']):.2f} ms, "
          f"bf16 {min(results['bf16']):.2f} ms")


if __name__ == "__main__":
    main()
