"""A/B the hand-pose optimizer's SDF-MLP dtype on the real TPU.

Runs the same optimize_hand_pose problem with f32 and bf16 energy matmuls
(HOTRACK_SDF_BF16 path) and reports wall-clock per frame plus the final
keypoint/energy difference — the accuracy evidence for flipping the default.

Usage: python scripts/ab_handopt_bf16.py
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
    from hotrack_tpu.mano.model import synthetic_mano_model
    from hotrack_tpu.mano.layer import mano_forward
    from hotrack_tpu.opt.hand_pose import load_contact_zones, optimize_hand_pose
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume

    mano = synthetic_mano_model()
    volume = synthetic_box_sdf_setup(151, 0.003)
    distilled = distill_sdf_volume(volume, 0.003, jax.random.PRNGKey(3))
    particles = presample_particles(jax.random.PRNGKey(4), 5120, 16)
    zones = load_contact_zones()
    rng = np.random.RandomState(5)

    hand_shape = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
    theta0 = jnp.asarray(rng.randn(1, 45).astype(np.float32) * 0.2)
    r0 = jnp.eye(3)[None]
    t0_ = jnp.asarray([[0.0], [0.0], [0.45]])[None]
    aa = jnp.concatenate([jnp.zeros((1, 3)), theta0], -1)
    _, kp0 = mano_forward(mano, aa, betas=hand_shape, trans=t0_[..., 0])
    pred_kp = kp0 + jnp.asarray(rng.randn(1, 21, 3).astype(np.float32) * 0.005)
    last_kp = kp0 + jnp.asarray(rng.randn(1, 21, 3).astype(np.float32) * 0.003)
    vis = jnp.asarray(np.concatenate([np.ones((1, 18), bool),
                                      np.zeros((1, 3), bool)], 1))
    mask = jnp.asarray(rng.rand(480, 640) > 0.5)
    intr = {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0}
    weights = {"penetrate_sum_loss": 1.0, "sil_loss": 0.1,
               "attraction_loss": 0.05, "vis_regu_loss": 10.0,
               "invis_regu_loss": 0.0, "temporal_smooth": 1.0}

    def run_mode(bf16: bool, reps: int = 10):
        if bf16:
            os.environ["HOTRACK_SDF_BF16"] = "1"
        else:
            os.environ.pop("HOTRACK_SDF_BF16", None)
        # the env var is read at trace time inside the jitted optimizer —
        # drop the cached trace so the mode actually switches
        optimize_hand_pose.clear_cache()

        def run(r, t, theta, last):
            return optimize_hand_pose(
                mano, particles, zones, volume, hand_shape, r, t, theta,
                pred_kp, vis, last, jnp.asarray(1.0), jnp.eye(3),
                jnp.asarray([0.0, 0.0, 0.45]), mask, intr, weights,
                distilled=distilled)

        kp, theta_f, r_f, t_f, e = run(r0, t0_, theta0, last_kp)  # compile
        np.asarray(kp)
        t_start = time.perf_counter()
        r, t, theta, last = r0, t0_, theta0, last_kp
        for _ in range(reps):
            kp, theta_n, r_n, t_n, e = run(r, t, theta, last)
            zero = 0.0 * jnp.minimum(e, 1.0)
            r, t, theta = r0 + zero * r_n, t0_ + zero * t_n, theta0 + zero * theta_n
            last = last_kp + zero * kp
        np.asarray(r)
        dt = (time.perf_counter() - t_start) / reps
        return np.asarray(kp), float(e), dt * 1000.0

    kp32, e32, ms32 = run_mode(False)
    kp16, e16, ms16 = run_mode(True)
    dkp = np.abs(kp16 - kp32).max() * 1000.0
    print(f"f32:  {ms32:7.2f} ms/frame  energy {e32:.6f}")
    print(f"bf16: {ms16:7.2f} ms/frame  energy {e16:.6f}")
    print(f"speedup {ms32 / ms16:.2f}x, final-kp max diff {dkp:.3f} mm, "
          f"energy rel diff {abs(e16 - e32) / max(abs(e32), 1e-9):.2e}")


if __name__ == "__main__":
    main()
