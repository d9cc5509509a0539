"""Per-sequence object-stage setup cost on device: the 201^3 DeepSDF volume
bake (8.1M grid points through the shipped 8x512 weight-norm decoder,
reference optimization_obj.py:133-143's 10-piece fp16 loop rebuilt as one
chunked lax.map jit) followed by the pooled-sample SDF distillation the TPU
query path runs on top of it.

These are the one-time costs the tracking stages amortize per sequence —
reported separately from the per-frame stage numbers in BENCHMARKS.md.
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
    from hotrack_tpu.sdf.decoder import SDFDecoder
    from hotrack_tpu.sdf.distill import distill_sdf_volume
    from hotrack_tpu.sdf.volume import bake_sdf_volume, volume_coords

    decoder = SDFDecoder()
    latent = jax.random.normal(jax.random.PRNGKey(0), (256,)) * 0.01
    variables = decoder.init(jax.random.PRNGKey(1),
                             jnp.zeros((2, 256 + 3)))
    coords = volume_coords(201, 0.002)

    def bake(lat):
        return bake_sdf_volume(decoder.apply, variables, lat, coords,
                               201, 1.0)

    # warm-up / compile
    v = bake(latent)
    np.asarray(v[0, 0, 0])

    def timed(fn, arg, reps=3, rounds=3):
        best = float("inf")
        for _ in range(rounds):
            a = arg
            t0 = time.perf_counter()
            for i in range(reps):
                out = fn(a)
                a = arg + 0.0 * jnp.mean(out[:1]).reshape(())
            np.asarray(a)[..., :1]
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    bake_s = timed(bake, latent)
    print(f"201^3 DeepSDF bake: {bake_s * 1000:.1f} ms", flush=True)

    def distill(key):
        return distill_sdf_volume(v, 0.002, key)

    d = distill(jax.random.PRNGKey(2))
    np.asarray(d.weights[0])

    def distill_once(i):
        t0 = time.perf_counter()
        dd = distill(jax.random.PRNGKey(i))
        np.asarray(dd.weights[0])
        return time.perf_counter() - t0

    dist_s = min(distill_once(i) for i in range(3, 6))
    print(f"distillation (pooled): {dist_s * 1000:.1f} ms", flush=True)
    print(f"total per-sequence obj setup: {(bake_s + dist_s) * 1000:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
