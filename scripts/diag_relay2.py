"""Relay-latency diagnostic, corrected: no big jit closures (closed-over
arrays are embedded in the remote-compile HTTP request — a 512 MB closure
draws HTTP 413 from the axon relay), everything passed as device-array args.

Hypotheses for bench.py's handopt reading 350 ms/frame where last session's
interleaved A/B (profile_handopt3.py) measured 56:
  h1: per-call upload of the 12 Python floats in intrinsics/energy_weight
      dicts costs ~25 ms each through the relay;
  h2: per-dispatch latency is now ~300 ms for everything (worker restart);
  h3: the handopt program itself got slower.

Programs timed (scalar-accumulator chains, scalar final fetch):
  matmul        (8192x8192)@(8192x8192) f32, args not closures  (~22 ms real)
  handopt_dict  optimize_hand_pose with Python-float dicts per call
  handopt_dev   same but dict values pre-converted to device scalars once
  handopt_jit   whole rep wrapped in one jit (floats baked as constants)
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
    s = run(state0)
    np.asarray(s)
    best = float("inf")
    for _ in range(rounds):
        s = state0
        t0 = time.perf_counter()
        for _ in range(reps):
            s = run(s)
        np.asarray(s)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:14s} {best * 1e3:9.2f} ms/call", flush=True)
    return best


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.mano.model import synthetic_mano_model
    from hotrack_tpu.opt.hand_pose import load_contact_zones, optimize_hand_pose
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume

    rng = np.random.RandomState(0)

    a = jnp.asarray(rng.randn(8192, 8192).astype(np.float32))
    bmat = jnp.asarray(rng.randn(8192, 8192).astype(np.float32))

    @jax.jit
    def mm(a_, b_, acc):
        out = (a_ + acc) @ b_
        return 0.0 * jnp.sum(out[:1, :1])

    timed("matmul", lambda acc: mm(a, bmat, acc), jnp.float32(0.0))

    mano = synthetic_mano_model()
    volume = synthetic_box_sdf_setup(151, 0.003)
    distilled = distill_sdf_volume(volume, 0.003, jax.random.PRNGKey(3))
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
    rot = jnp.eye(3)
    trans = jnp.asarray([0.0, 0.0, 0.45])
    intr_f = {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0}
    wts_f = {"penetrate_sum_loss": 1.0, "sil_loss": 0.1,
             "attraction_loss": 0.05, "vis_regu_loss": 10.0,
             "invis_regu_loss": 0.0, "temporal_smooth": 1.0}
    intr_d = {k: jnp.float32(v) for k, v in intr_f.items()}
    wts_d = {k: jnp.float32(v) for k, v in wts_f.items()}
    one = jnp.asarray(1.0)

    def call(intr, wts, acc):
        kp, theta_n, r_n, t_n, e = optimize_hand_pose(
            mano, particles, zones, volume, hand_shape,
            r0, t0_ + acc, theta0, pred_kp, vis, pred_kp, one,
            obj_rotation=rot, obj_translation=trans, background_mask=mask,
            intrinsics=intr, energy_weight=wts)
        return 0.0 * jnp.sum(e)

    timed("handopt_dict", lambda acc: call(intr_f, wts_f, acc),
          jnp.float32(0.0))
    timed("handopt_dev", lambda acc: call(intr_d, wts_d, acc),
          jnp.float32(0.0))

    jit_rep = jax.jit(lambda acc: call(intr_d, wts_d, acc))
    timed("handopt_jit", jit_rep, jnp.float32(0.0))


if __name__ == "__main__":
    main()
