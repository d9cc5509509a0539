"""Device-level profile of one jitted train step (Trainer._train_step) at
the shipped operating point (HandTrackNet, 512 pts, 384-dim, batch 32 —
bench.py's `train` stage, reference counterpart Trainer.update,
network/trainer.py:278-302).

The step runs ~22 ms for 1.38e11 HLO FLOPs (~3% of bf16 peak) — this trace
shows where the non-MXU time goes (candidates: in-backbone FPS scans,
ball-query top_k, grouping gather/scatter grads, BN) so the training-path
perf work targets measured ops, not guesses.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    import bench
    from hotrack_tpu.mano import synthetic_mano_model

    mano = synthetic_mano_model()
    trainer, batch = bench._build_train_point(mano)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    ld = trainer.update(batch, keys[-1])  # reachability probe + compile
    np.asarray(ld["total_loss"])

    trace_dir = "/tmp/train_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for i in range(3):
        ld = trainer.update(batch, keys[i])  # steps chain through state
    np.asarray(ld["total_loss"])
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    for f in files:
        with gzip.open(f, "rt") as fh:
            trace = json.load(fh)
        events = trace.get("traceEvents", [])
        per_op = defaultdict(float)
        per_pid_name = {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                per_pid_name[ev["pid"]] = ev["args"].get("name", "")
        dev_pids = {p for p, n in per_pid_name.items()
                    if "TPU" in n or "tpu" in n or "Device" in n
                    or "/device" in n}
        total = 0.0
        for ev in events:
            if ev.get("ph") != "X":
                continue
            if dev_pids and ev.get("pid") not in dev_pids:
                continue
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            per_op[ev.get("name", "?")[:70]] += dur
            total += dur
        print(f"\n== {f}: total device lane time {total:.2f} ms"
              f" over 3 steps ==")
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:45]:
            print(f"{ms:9.3f} ms ({ms / 3:7.3f}/step)  {name}")
        seen = set()
        heavy = {n for n, ms in per_op.items() if ms > 1.0}
        for ev in events:
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "?")[:70]
            if name in heavy and name not in seen:
                seen.add(name)
                args = ev.get("args", {})
                info = {k: str(v)[:140] for k, v in args.items()
                        if k in ("long_name", "tf_op", "source", "shape",
                                 "hlo_module", "hlo_op", "kind")}
                if info:
                    print(f"-- {name}: {info}")


if __name__ == "__main__":
    main()
