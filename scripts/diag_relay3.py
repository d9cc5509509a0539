"""Localize the handopt slowdown: time the pieces of one optimizer iteration
as separate jitted programs (all args, no big closures, scalar fetches).

  fused_x1      fused_hand_energy on (3, 4M) points        (~10 ms expected)
  sdf_x1        fused_sdf_mlp_cf on (3, 4M) points
  mano_fwd      mano_forward for 5120 particles
  topk          lax.top_k over (5120,) energies + gathers  (cheap)
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
    print(f"{name:12s} {best * 1e3:9.2f} ms/call", flush=True)
    return best


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.mano.model import synthetic_mano_model
    from hotrack_tpu.mano.layer import mano_forward
    from hotrack_tpu.ops.pallas.hand_energy import fused_hand_energy
    from hotrack_tpu.ops.pallas.mask_lookup import pack_mask
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume, eval_distilled_sdf_cf

    rng = np.random.RandomState(0)
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
    def fused1(dist, pk, p, acc):
        s, h = fused_hand_energy(dist, pk, rot, trans, 600.0, 600.0,
                                 320.0, 240.0, p + acc, (480, 640))
        return 0.0 * (jnp.sum(s) + jnp.sum(h))

    timed("fused_x1", lambda acc: fused1(distilled, packed, pts, acc),
          jnp.float32(0.0))

    @jax.jit
    def sdf1(dist, p, acc):
        return 0.0 * jnp.sum(eval_distilled_sdf_cf(dist, p + acc))

    timed("sdf_x1", lambda acc: sdf1(distilled, pts, acc), jnp.float32(0.0))

    mano = synthetic_mano_model()
    theta = jnp.asarray(rng.randn(5120, 48).astype(np.float32) * 0.2)
    beta = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
    beta_b = jnp.broadcast_to(beta, (5120, 10))

    @jax.jit
    def mf(th, be, acc):
        verts, joints = mano_forward(mano, th + acc, be)
        return 0.0 * (jnp.sum(verts) + jnp.sum(joints))

    timed("mano_fwd", lambda acc: mf(theta, beta_b, acc), jnp.float32(0.0))

    en = jnp.asarray(rng.randn(5120).astype(np.float32))

    @jax.jit
    def tk(e, acc):
        v, i = jax.lax.top_k(-(e + acc), 512)
        return 0.0 * (jnp.sum(v) + jnp.sum(i))

    timed("topk", lambda acc: tk(en, acc), jnp.float32(0.0))


if __name__ == "__main__":
    main()
