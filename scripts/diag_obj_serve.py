"""Decompose the obj-only serving gap (VERDICT r4 item 5).

Round 4 measured obj-only `tracker.serve()` at 22.9 ms/frame vs a 17.9
ms/frame device-resident bound (+28%), while hand-only and combined serve
land within 3-9%. This isolates where the extra ~5 ms/frame lives by
toggling one component at a time:

  A. device-resident bound      (pre-staged clouds, chained steps, one fetch)
  B. serve, pre-staged clouds, fetch=()      -> adds per-frame dispatch only
  C. serve, host clouds,       fetch=()      -> + per-frame host upload
  D. serve, pre-staged clouds, fetch=(r, t)  -> + per-frame async fetch
  E. serve, host clouds,       fetch=(r, t)  -> the full product loop (22.9)

min over 4 interleaved rounds x 30 frames, chained where applicable.
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
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume
    from hotrack_tpu.track import ObjTracker
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()

    volume = synthetic_box_sdf_setup(201, 0.002)
    distilled = distill_sdf_volume(volume, 0.002, jax.random.PRNGKey(7))
    particles = presample_particles(jax.random.PRNGKey(8), 2048, 6)
    tracker = ObjTracker(volume, particles, voxel_scale=0.002, bbox_res=201,
                         distilled=distilled)
    rng = np.random.RandomState(13)
    n = 30
    host_clouds = [np.asarray(rng.randn(1024, 3), np.float32) * 0.04
                   for _ in range(n)]
    dev_clouds = [jax.device_put(c) for c in host_clouds]
    state0 = tracker.init_state(jnp.eye(3), jnp.zeros((3, 1)))

    s, out = tracker.step(state0, dev_clouds[0])  # compile
    np.asarray(out["rotation"])

    def timed(fn, label, rounds=4):
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            fn()
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"{label}: {1000 * best:.1f} ms/frame", flush=True)
        return best

    def bound():
        st = state0
        for f in range(n):
            st, o = tracker.step(st, dev_clouds[f])
        np.asarray(o["rotation"])
    timed(bound, "A device-resident bound (pre-staged, fetch at end)")

    def serve(clouds, fetch):
        def run():
            for _ in tracker.serve(state0, clouds, fetch=fetch):
                pass
        return run

    timed(serve(dev_clouds, ()), "B serve pre-staged, fetch=()")
    timed(serve(host_clouds, ()), "C serve host clouds, fetch=()")
    timed(serve(dev_clouds, ("rotation", "translation")),
          "D serve pre-staged, fetch=(r,t)")
    timed(serve(host_clouds, ("rotation", "translation")),
          "E serve host clouds, fetch=(r,t)  [product loop]")
    timed(serve(host_clouds, ("rotation",)),
          "F serve host clouds, fetch=(rotation,)")

    def serve_d(clouds, fetch, depth):
        def run():
            for _ in tracker.serve(state0, clouds, fetch=fetch, depth=depth):
                pass
        return run

    timed(serve_d(host_clouds, ("rotation", "translation"), 2),
          "G serve host clouds, fetch=(r,t), depth=2")
    timed(serve_d(host_clouds, ("rotation", "translation"), 3),
          "H serve host clouds, fetch=(r,t), depth=3")


if __name__ == "__main__":
    main()
