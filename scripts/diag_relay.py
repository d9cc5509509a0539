"""Diagnose per-dispatch relay latency vs real kernel time on the axon TPU.

Times three programs with scalar-accumulator chaining (no large fetches):
  matmul    plain XLA f32 (8192x8192)@(8192x8192)  ~1.1 TFLOP  (~20 ms real)
  fused     one fused_hand_energy call, 4M pts     (~10 ms real)
  handopt   one optimize_hand_pose, 5 iters        (~56 ms real last session)

Each chain folds 0*sum(out) back into the input so calls serialize, and the
only host fetch is the final scalar. If all three read the same +L offset
over their real compute, L is per-dispatch relay latency, not kernel time.
Also times K chained fused calls inside one jitted fori_loop to get the
dispatch-free per-call cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def timed(name, run, state0, reps=5, rounds=3):
    s = run(state0)   # compile
    np.asarray(jax.tree.leaves(s)[0])
    best = float("inf")
    for _ in range(rounds):
        s = state0
        t0 = time.perf_counter()
        for _ in range(reps):
            s = run(s)
        np.asarray(jax.tree.leaves(s)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:12s} {best * 1e3:9.2f} ms/call", flush=True)
    return best


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.mano.model import synthetic_mano_model
    from hotrack_tpu.ops.pallas.hand_energy import fused_hand_energy
    from hotrack_tpu.ops.pallas.mask_lookup import pack_mask
    from hotrack_tpu.opt.hand_pose import load_contact_zones, optimize_hand_pose
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume

    rng = np.random.RandomState(0)

    # --- plain matmul ---
    a = jnp.asarray(rng.randn(8192, 8192).astype(np.float32))
    b = jnp.asarray(rng.randn(8192, 8192).astype(np.float32))

    @jax.jit
    def mm(acc):
        out = (a + acc) @ b
        return 0.0 * jnp.sum(out[:1, :1])

    t_mm = timed("matmul", mm, jnp.float32(0.0))

    # --- fused energy kernel, one call ---
    m = 5120 * 778
    volume = synthetic_box_sdf_setup(151, 0.003)
    distilled = distill_sdf_volume(volume, 0.003, jax.random.PRNGKey(3))
    pts = jnp.asarray(
        np.concatenate([rng.randn(2, m).astype(np.float32) * 0.05,
                        0.45 + rng.rand(1, m).astype(np.float32) * 0.1]))
    packed = pack_mask(jnp.asarray(rng.rand(480, 640) > 0.5))
    rot = jnp.eye(3)
    trans = jnp.asarray([0.0, 0.0, 0.45])

    @jax.jit
    def fused_once(acc):
        s, h = fused_hand_energy(distilled, packed, rot, trans,
                                 600.0, 600.0, 320.0, 240.0,
                                 pts + acc, (480, 640))
        return 0.0 * (jnp.sum(s[:1]) + jnp.sum(h[:1]))

    t_f1 = timed("fused_x1", fused_once, jnp.float32(0.0))

    # --- K fused calls inside one program (dispatch-free per-call cost) ---
    K = 10

    @jax.jit
    def fused_k(acc):
        def body(i, a):
            s, h = fused_hand_energy(distilled, packed, rot, trans,
                                     600.0, 600.0, 320.0, 240.0,
                                     pts + a, (480, 640))
            return 0.0 * (jnp.sum(s[:1]) + jnp.sum(h[:1])) + a
        return jax.lax.fori_loop(0, K, body, acc)

    t_fk = timed(f"fused_x{K}", fused_k, jnp.float32(0.0))
    print(f"  -> dispatch-free fused cost {t_fk * 1e3 / K:.2f} ms/call; "
          f"single-call overhead {max(0.0, t_f1 - t_fk / K) * 1e3:.2f} ms")

    # --- full hand-opt call ---
    mano = synthetic_mano_model()
    particles = presample_particles(jax.random.PRNGKey(4), 5120, 16)
    zones = load_contact_zones()
    hand_shape = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
    theta0 = jnp.asarray(rng.randn(1, 45).astype(np.float32) * 0.2)
    r0 = jnp.eye(3)[None]
    t0_ = jnp.asarray([[0.0], [0.0], [0.45]])[None]
    pred_kp = jnp.asarray(rng.randn(1, 21, 3).astype(np.float32) * 0.04
                          + np.array([0, 0, 0.45], np.float32))
    vis = jnp.asarray(np.concatenate([np.ones((1, 18), bool),
                                      np.zeros((1, 3), bool)], 1))
    mask = jnp.asarray(rng.rand(480, 640) > 0.5)
    intr = {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0}
    weights = {"penetrate_sum_loss": 1.0, "sil_loss": 0.1,
               "attraction_loss": 0.05, "vis_regu_loss": 10.0,
               "invis_regu_loss": 0.0, "temporal_smooth": 1.0}

    def ho(acc):
        kp, theta_n, r_n, t_n, e = optimize_hand_pose(
            mano, particles, zones, volume, hand_shape,
            r0, t0_ + acc, theta0, pred_kp, vis, pred_kp, jnp.asarray(1.0),
            obj_rotation=rot, obj_translation=trans, background_mask=mask,
            intrinsics=intr, energy_weight=weights)
        return 0.0 * jnp.sum(e[:1])

    t_ho = timed("handopt_x1", ho, jnp.float32(0.0))

    print("\nsummary: matmul %.1f ms, fused_x1 %.1f ms, fused per-call in "
          "fori %.2f ms, handopt %.1f ms" % (
              t_mm * 1e3, t_f1 * 1e3, t_fk * 1e3 / K, t_ho * 1e3))


if __name__ == "__main__":
    main()
