"""Numerics + timing check of the one-hot-MXU gather kernel inside the real
train step (run twice: with and without HOTRACK_NO_PALLAS_GATHER=1; the
data, seeds and schedule are deterministic, so step-0 losses must match
bitwise — the kernel forward is bit-exact — and later steps to f32
round-off via the backward's add order)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax


def main():
    import bench
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.mano import synthetic_mano_model

    print("HOTRACK_NO_PALLAS_GATHER =",
          os.environ.get("HOTRACK_NO_PALLAS_GATHER"), flush=True)
    mano = synthetic_mano_model()
    trainer, batch = bench._build_train_point(mano)
    keys = jax.random.split(jax.random.PRNGKey(1), 16)
    for i in range(5):
        ld = trainer.update(batch, keys[i])
        print(f"step {i}: total_loss {float(ld['total_loss']):.9e}",
              flush=True)
    # chained timing, min of 4 rounds x 10 reps
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for i in range(10):
            ld = trainer.update(batch, keys[i % 15])
        np.asarray(ld["total_loss"])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"step_ms (min over 4x10): {1000 * best:.2f}", flush=True)


if __name__ == "__main__":
    main()
