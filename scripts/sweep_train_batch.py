"""Train-step batch-size sweep (round-5 train campaign, VERDICT r4 item 2).

The round-4/5 device trace (scripts/trace_train.py) shows the batch-32 step
is gather-bound (grouping take_along_axis + scatter-add grads ~40%, FPS
~20%, sorts ~7%, matmuls negligible) — so throughput should scale
sublinearly in cost with batch size until the gathers saturate HBM.
This measures step time + samples/s/chip at batch 32/64/128/256 with the
same chained-state protocol as bench.py's train stage.

Usage: python scripts/sweep_train_batch.py [batch sizes...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def measure(batch_size: int, mano, reps: int = 10, rounds: int = 4):
    import bench
    from hotrack_tpu.config import get_config
    from hotrack_tpu.data import get_dataloader
    from hotrack_tpu.train import Trainer
    from hotrack_tpu.train.cli import prepare

    bench._ensure_bench_data(mano)
    cfg = get_config({"config": "handtracknet_train_SimGrasp.yml",
                      "batch_size": batch_size,
                      "experiment_dir": f"sweep_train_b{batch_size}"},
                     save=False)
    loader = get_dataloader(cfg, "train")
    cfg["dataset_len"] = len(loader)
    trainer = Trainer(cfg)
    trainer.mano = mano
    raw, _ = next(iter(loader))
    key = jax.random.PRNGKey(0)
    batch = prepare(trainer, raw, key, cfg)
    n = batch["hand_points"].shape[0]
    if n < batch_size:  # dataset smaller than batch: tile up
        batch = jax.tree.map(
            lambda a: np.resize(np.asarray(a), (batch_size,) + a.shape[1:])
            if getattr(a, "ndim", 0) else a, batch)
        n = batch_size
    trainer.init_state(jax.tree.map(lambda a: a[:1], batch))
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    ld = trainer.update(batch, keys[-1])  # probe + compile
    np.asarray(ld["total_loss"])

    best = med = None
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for i in range(reps):
            ld = trainer.update(batch, keys[i % (len(keys) - 1)])
        np.asarray(ld["total_loss"])  # forces the chained state
        times.append((time.perf_counter() - t0) / reps)
    times.sort()
    best, med = times[0], times[len(times) // 2]
    return {"batch": n, "step_ms": round(1000 * best, 2),
            "step_ms_median": round(1000 * med, 2),
            "samples_per_sec": round(n / best, 1)}


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.mano import synthetic_mano_model

    sizes = [int(a) for a in sys.argv[1:]] or [32, 64, 128, 256]
    mano = synthetic_mano_model()
    out = []
    for b in sizes:
        r = measure(b, mano)
        out.append(r)
        print(r, flush=True)
    print("\nbatch  step_ms(min/med)  samples/s/chip")
    for r in out:
        print(f"{r['batch']:5d}  {r['step_ms']:8.2f}/{r['step_ms_median']:<8.2f}"
              f"  {r['samples_per_sec']:10.1f}")


if __name__ == "__main__":
    main()
