"""Device-level profile of one optimize_hand_pose call: capture a
jax.profiler trace on the real TPU and print the top device ops by self
time. This is the in-context breakdown the standalone ablations cannot give
(scripts/ab_energy_parts.py: standalone kernel calls are floored by ~9 ms of
relay dispatch latency, hiding anything smaller)."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

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
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume

    mano = synthetic_mano_model()
    volume = synthetic_box_sdf_setup(151, 0.003)
    distilled = distill_sdf_volume(volume, 0.003, jax.random.PRNGKey(3))
    particles = presample_particles(jax.random.PRNGKey(4), 5120, 16)
    zones = hp.load_contact_zones()
    rng = np.random.RandomState(5)

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

    def full(t):
        kp, th, r, tt, e = hp.optimize_hand_pose(
            mano, particles, zones, volume, hand_shape, r0, t, theta0,
            pred_kp, vis, pred_kp, jnp.asarray(1.0), jnp.eye(3),
            jnp.asarray([0.0, 0.0, 0.45]), mask, intr, weights,
            distilled=distilled)
        return e

    e = full(t0_)
    np.asarray(e)  # compile + settle

    trace_dir = "/tmp/handopt_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t = t0_
    for _ in range(3):
        e = full(t)
        t = t0_ + 0.0 * jnp.minimum(e, 1.0)
    np.asarray(t)
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    for f in files:
        with gzip.open(f, "rt") as fh:
            trace = json.load(fh)
        events = trace.get("traceEvents", [])
        # device-lane complete events, grouped by op name
        per_op = defaultdict(float)
        per_pid_name = {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                per_pid_name[ev["pid"]] = ev["args"].get("name", "")
        dev_pids = {p for p, n in per_pid_name.items()
                    if "TPU" in n or "tpu" in n or "Device" in n or "/device" in n}
        print("processes:", per_pid_name, flush=True)
        total = 0.0
        for ev in events:
            if ev.get("ph") != "X":
                continue
            if dev_pids and ev.get("pid") not in dev_pids:
                continue
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            per_op[ev.get("name", "?")[:70]] += dur
            total += dur
        print(f"\n== {f}: total device lane time {total:.2f} ms over 3 calls ==")
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
            print(f"{ms:9.3f} ms  {name}")
        # op metadata (source line / shapes) for the heavy ops
        seen = set()
        heavy = {n for n, ms in per_op.items() if ms > 1.0}
        for ev in events:
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "?")[:70]
            if name in heavy and name not in seen:
                seen.add(name)
                args = ev.get("args", {})
                info = {k: str(v)[:120] for k, v in args.items()
                        if k in ("long_name", "tf_op", "source", "shape",
                                 "hlo_module", "hlo_op", "kind")}
                if info:
                    print(f"-- {name}: {info}")


if __name__ == "__main__":
    main()
