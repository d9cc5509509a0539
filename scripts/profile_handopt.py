"""Locate the hand-opt stage cost on the real TPU: time the full optimizer,
the MANO forward alone, and the fused energy kernel alone at the 5120x778x5
operating point. Chained-dependency timing (tunnel-safe)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def chained(fn, x0, feed, reps=10):
    """fn(x) -> y; feed(x0, y) -> next x. Returns seconds/call."""
    x = x0
    y = fn(x)          # compile
    jax.tree.map(np.asarray, y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(x)
        x = feed(x0, y)
    jax.tree.map(np.asarray, x)
    return (time.perf_counter() - t0) / reps


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.mano.model import synthetic_mano_model
    from hotrack_tpu.mano.layer import mano_forward, shape_hand
    from hotrack_tpu.opt.hand_pose import load_contact_zones, optimize_hand_pose
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume
    from hotrack_tpu.ops.pallas.hand_energy import fused_hand_energy
    from hotrack_tpu.ops.pallas.mask_lookup import pack_mask

    mano = synthetic_mano_model()
    volume = synthetic_box_sdf_setup(151, 0.003)
    distilled = distill_sdf_volume(volume, 0.003, jax.random.PRNGKey(3))
    particles = presample_particles(jax.random.PRNGKey(4), 5120, 16)
    zones = load_contact_zones()
    rng = np.random.RandomState(5)
    p = 5120

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

    # ---- full optimizer ----
    def full(t):
        kp, th, r, tt, e = optimize_hand_pose(
            mano, particles, zones, volume, hand_shape, r0, t, theta0,
            pred_kp, vis, pred_kp, jnp.asarray(1.0), jnp.eye(3),
            jnp.asarray([0.0, 0.0, 0.45]), mask, intr, weights,
            distilled=distilled)
        return e

    dt = chained(full, t0_, lambda x0, e: x0 + 0.0 * jnp.minimum(e, 1.0))
    print(f"full optimizer:        {dt * 1000:8.2f} ms/frame "
          f"({dt * 1000 / 5:6.2f} ms/iter)")

    # ---- MANO forward alone at P=5120 (one iteration's worth) ----
    shaped = shape_hand(mano, hand_shape)
    pose = jnp.asarray(rng.randn(p, 48).astype(np.float32) * 0.3)
    trans = jnp.asarray(rng.randn(p, 3).astype(np.float32) * 0.1)

    @jax.jit
    def lbs(pose):
        v, kp = mano_forward(mano, pose, trans=trans, shaped=shaped)
        return jnp.mean(v), v

    dt = chained(lbs, pose, lambda x0, y: x0 + 0.0 * y[0])
    print(f"mano_forward @5120:    {dt * 1000:8.2f} ms/call")

    # ---- fused energy kernel alone at (5120, 3, 778) ----
    packed = pack_mask(mask)
    pts_cf = jnp.asarray(rng.randn(p, 3, 778).astype(np.float32) * 0.05
                         + np.array([0, 0, 0.45], np.float32).reshape(3, 1))

    @jax.jit
    def energy(pts):
        sdf, hit = fused_hand_energy(
            distilled, packed, jnp.eye(3), jnp.asarray([0.0, 0.0, 0.45]),
            600.0, 600.0, 320.0, 240.0, pts, (480, 640))
        return jnp.mean(sdf) + jnp.mean(hit)

    dt = chained(energy, pts_cf, lambda x0, s: x0 + 0.0 * s)
    print(f"fused energy @5120x778:{dt * 1000:8.2f} ms/call")

    # ---- pack_mask alone (runs once per optimize call) ----
    @jax.jit
    def pack(m):
        return pack_mask(m)

    dt = chained(pack, mask, lambda x0, pk: x0)
    print(f"pack_mask 480x640:     {dt * 1000:8.2f} ms/call")


if __name__ == "__main__":
    main()
