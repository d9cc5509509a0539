"""Multi-sequence (vmapped) optimizer throughput sweep at the CURRENT
kernels: S in {1, 2, 4, 8} concurrent sequences through the batched
(S, G)-grid fused kernels, per-sequence assets (distilled SDF, mask, poses)
on the vmapped axis.

Earlier numbers (BENCHMARKS.md "Multi-sequence throughput") predate the
fused obj-energy and skin+energy kernels; the S=2 hand measurement showed
per-frame-equiv parity with the unbatched path (29.4 vs 30.9 ms). This
sweep asks whether larger S amortizes the remaining fixed cost, i.e. what
the per-chip aggregate throughput ceiling of the optimizer stages is.

Timing: chained data deps + final host fetch, min over rounds (the only
honest protocol through the axon relay — see bench.py).
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
    from hotrack_tpu.opt import hand_pose as hp
    from hotrack_tpu.opt.obj_pose import optimize_obj_pose
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume

    mano = synthetic_mano_model()
    hand_vol = synthetic_box_sdf_setup(151, 0.003)
    obj_vol = synthetic_box_sdf_setup(201, 0.002)
    pose_particles = presample_particles(jax.random.PRNGKey(4), 5120, 16)
    obj_particles = presample_particles(jax.random.PRNGKey(5), 2048, 6)
    zones = hp.load_contact_zones()
    rng = np.random.RandomState(7)
    S_MAX = 8

    # per-sequence distilled SDFs (production: one per tracked object)
    hand_models, obj_models = [], []
    for i in range(S_MAX):
        hand_models.append(distill_sdf_volume(
            hand_vol, 0.003, jax.random.PRNGKey(100 + i)))
        obj_models.append(distill_sdf_volume(
            obj_vol, 0.002, jax.random.PRNGKey(200 + i)))
    hand_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *hand_models)
    obj_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *obj_models)

    # ---- hand pose stage (5120 x 778 x 5) ----
    hand_shape = jnp.asarray(rng.randn(S_MAX, 1, 10).astype(np.float32) * 0.3)
    theta0 = jnp.asarray(rng.randn(S_MAX, 1, 45).astype(np.float32) * 0.2)
    r0 = jnp.broadcast_to(jnp.eye(3), (S_MAX, 1, 3, 3))
    t0 = jnp.asarray(
        rng.randn(S_MAX, 1, 3, 1).astype(np.float32) * 0.02) + jnp.asarray(
        [0.0, 0.0, 0.45]).reshape(1, 1, 3, 1)
    pred_kp = jnp.asarray(rng.randn(S_MAX, 1, 21, 3).astype(np.float32) * .04)
    vis = jnp.asarray(np.concatenate([np.ones((S_MAX, 1, 18), bool),
                                      np.zeros((S_MAX, 1, 3), bool)], 2))
    masks = jnp.asarray(rng.rand(S_MAX, 480, 640) > 0.5)
    intr = {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0}
    weights = {"penetrate_sum_loss": 1.0, "sil_loss": 0.1,
               "attraction_loss": 0.05, "vis_regu_loss": 10.0,
               "invis_regu_loss": 0.0, "temporal_smooth": 1.0}

    def hand_one(shape, r, t, th, kp, v, m, d):
        out = hp.optimize_hand_pose(
            mano, pose_particles, zones, hand_vol, shape, r, t, th,
            kp, v, kp, jnp.asarray(1.0), jnp.eye(3),
            jnp.asarray([0.0, 0.0, 0.45]), m, intr, weights, distilled=d)
        return out[3], out[4]  # translation carries the chain; energy checked

    # ---- obj pose stage (2048 x 1024 x 10) ----
    obj_pclds = jnp.asarray(
        rng.randn(S_MAX, 1024, 3).astype(np.float32) * 0.03)
    obj_r0 = jnp.broadcast_to(jnp.eye(3), (S_MAX, 3, 3))
    obj_t0 = jnp.asarray(rng.randn(S_MAX, 3, 1).astype(np.float32) * 0.01)

    def obj_one(pcld, r, t, d):
        rr, tt, e = optimize_obj_pose(obj_vol, obj_particles, pcld, r, t,
                                      voxel_scale=0.002, distilled=d)
        return tt, e

    def timed(fn, chain_t, reps=6, rounds=4):
        """fn(t) -> (t_like, energy); chain t through reps calls."""
        t = fn(chain_t)[0]
        np.asarray(t)  # compile + settle
        best = float("inf")
        for _ in range(rounds):
            t = chain_t
            t_start = time.perf_counter()
            for _ in range(reps):
                nt, e = fn(t)
                t = chain_t + 0.0 * nt
            np.asarray(t)
            best = min(best, (time.perf_counter() - t_start) / reps)
        return best * 1000.0

    def take(tree, s):
        return jax.tree.map(lambda a: a[:s], tree)

    print("== hand pose opt (5120x778x5), vmapped S sequences ==", flush=True)
    for s in (1, 2, 4, 8):
        f = jax.vmap(hand_one)
        d = take(hand_stack, s)

        def call(t, s=s, f=f, d=d):
            return f(hand_shape[:s], r0[:s], t, theta0[:s], pred_kp[:s],
                     vis[:s], masks[:s], d)

        dt = timed(call, t0[:s])
        print(f"S={s}: {dt:8.2f} ms/call = {dt / s:7.2f} ms/frame-equiv "
              f"= {s * 1000.0 / dt:7.1f} agg frames/s", flush=True)

    print("== obj pose opt (2048x1024x10), vmapped S sequences ==", flush=True)
    for s in (1, 2, 4, 8):
        f = jax.vmap(obj_one)
        d = take(obj_stack, s)

        def call(t, s=s, f=f, d=d):
            return f(obj_pclds[:s], obj_r0[:s], t, d)

        dt = timed(call, obj_t0[:s])
        print(f"S={s}: {dt:8.2f} ms/call = {dt / s:7.2f} ms/frame-equiv "
              f"= {s * 1000.0 / dt:7.1f} agg frames/s", flush=True)


if __name__ == "__main__":
    main()
