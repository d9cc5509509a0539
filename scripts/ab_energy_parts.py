"""Intra-kernel cost breakdown of the fused hand-energy Pallas kernel.

The optimizer-level ablations (profile_handopt*.py) showed the fused kernel
dominates the hand-opt stage but bf16 MLP matmuls are wall-clock neutral —
so the kernel is NOT matmul-throughput-bound and the 314 GFLOP/iter analytic
MLP count does not locate the time. This script times the kernel's parts
separately at the 5120x778 point load on the real TPU:

  full        fused_hand_energy (sdf + silhouette, one pass)
  full_bf16   fused_hand_energy with bf16 MLP matmuls (re-confirmation)
  sdf_only    fused_sdf_mlp_cf  (fourier features + MLP, no silhouette)
  depth_d     sdf_only with d hidden layers (random weights, timing only)
  freqs_f     sdf_only with f fourier frequencies (first layer resized)
  mask_only   packed_mask_lookup (one-hot silhouette, iy/ix precomputed)

Timing discipline (learned the hard way, see diag_relay*.py): every device
value is a jit ARGUMENT (big jit-closed constants are embedded in the
remote-compile HTTP request — a 32 MB closure adds minutes), the chain
carries a SCALAR (fetching a 48 MB carry through the tunnel contaminates
every number), minima over interleaved rounds.
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
    from hotrack_tpu.ops.pallas.hand_energy import fused_hand_energy
    from hotrack_tpu.ops.pallas.mask_lookup import pack_mask, packed_mask_lookup
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import (DistilledSDF, distill_sdf_volume,
                                         eval_distilled_sdf_cf)

    m = 5120 * 778
    rng = np.random.RandomState(0)
    volume = synthetic_box_sdf_setup(151, 0.003)
    distilled = distill_sdf_volume(volume, 0.003, jax.random.PRNGKey(3))
    pts = jnp.asarray(
        np.concatenate([rng.randn(2, m).astype(np.float32) * 0.05,
                        0.45 + rng.rand(1, m).astype(np.float32) * 0.1]))
    mask = jnp.asarray(rng.rand(480, 640) > 0.5)
    packed = pack_mask(mask)
    hw = (480, 640)
    rot = jnp.eye(3)
    trans = jnp.asarray([0.0, 0.0, 0.45])
    iy = jnp.asarray(rng.randint(0, 480, size=(m,)).astype(np.int32))
    ix = jnp.asarray(rng.randint(0, 640, size=(m,)).astype(np.int32))

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

    # every variant: jitted fn(pts, acc, *extras) -> scalar; chain on acc
    variants = {}

    def add_fused(name, dtype):
        @jax.jit
        def f(p, acc, model, pk):
            s, h = fused_hand_energy(model, pk, rot, trans, 600.0, 600.0,
                                     320.0, 240.0, p + acc, hw,
                                     compute_dtype=dtype)
            return 0.0 * (jnp.sum(s) + jnp.sum(h))
        variants[name] = lambda acc: f(pts, acc, distilled, packed)

    add_fused("full", None)
    add_fused("full_bf16", jnp.bfloat16)

    def add_sdf(name, model):
        @jax.jit
        def f(p, acc, mdl):
            return 0.0 * jnp.sum(eval_distilled_sdf_cf(mdl, p + acc))
        variants[name] = lambda acc, _m=model: f(pts, acc, _m)

    add_sdf("sdf_only", distilled)
    for d in (0, 1, 2, 3):
        add_sdf(f"depth_{d}", rand_model(d, len(distilled.freqs)))
    for nf in (1, 3):
        add_sdf(f"freqs_{nf}", rand_model(4, nf))

    @jax.jit
    def fmask(a, b, acc, pk):
        hit = packed_mask_lookup(pk, a + 0 * acc.astype(jnp.int32), b)
        return 0.0 * jnp.sum(hit)

    variants["mask_only"] = lambda acc: fmask(iy, ix, acc, packed)

    zero = jnp.float32(0.0)
    for name, run in variants.items():   # compile all
        np.asarray(run(zero))

    reps = int(os.environ.get("AB_REPS", 5))
    rounds = int(os.environ.get("AB_ROUNDS", 4))
    mins = {k: float("inf") for k in variants}
    for r in range(rounds):
        for name, run in variants.items():
            acc = zero
            t0 = time.perf_counter()
            for _ in range(reps):
                acc = run(acc)
            np.asarray(acc)
            dt = (time.perf_counter() - t0) / reps
            mins[name] = min(mins[name], dt)
            print(f"round {r} {name:10s} {dt * 1e3:8.2f} ms", flush=True)

    print("\n== minima (ms per call, %d pts) ==" % m)
    for name, v in mins.items():
        print(f"{name:10s} {v * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
