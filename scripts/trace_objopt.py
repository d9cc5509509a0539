"""Device-level profile of one optimize_obj_pose call (2048x1024x10, the
reference operating point) — top device ops by self time, same method as
trace_handopt.py."""

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
import jax.numpy as jnp


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.opt.obj_pose import optimize_obj_pose
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume

    key = jax.random.PRNGKey(0)
    volume = synthetic_box_sdf_setup(201, 0.002)
    distilled = distill_sdf_volume(volume, 0.002, key)
    particles = presample_particles(jax.random.PRNGKey(1), 2048, 6)
    rng = np.random.RandomState(2)
    pcld = jnp.asarray(rng.randn(1024, 3).astype(np.float32) * 0.04)
    r0, t0_ = jnp.eye(3), jnp.zeros((3, 1))

    def run(r, t):
        return optimize_obj_pose(volume, particles, pcld, r, t,
                                 distilled=distilled)

    r, t, e = run(r0, t0_)
    np.asarray(e)

    trace_dir = "/tmp/objopt_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    r, t = r0, t0_
    for _ in range(3):
        r, t, e = run(r, t)
        z = 0.0 * jnp.minimum(e, 1.0)
        r, t = r0 + z * r, t0_ + z * t
    np.asarray(r)
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    for f in files:
        with gzip.open(f, "rt") as fh:
            trace = json.load(fh)
        events = trace.get("traceEvents", [])
        per_pid_name = {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                per_pid_name[ev["pid"]] = ev["args"].get("name", "")
        dev_pids = {p for p, n in per_pid_name.items() if "TPU" in n}
        per_op = defaultdict(float)
        meta = {}
        for ev in events:
            if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
                continue
            name = ev.get("name", "?")[:70]
            per_op[name] += ev.get("dur", 0) / 1e3
            if name not in meta:
                a = ev.get("args", {})
                meta[name] = (a.get("source", ""), a.get("long_name", "")[:140])
        print(f"\n== {f} (3 calls) ==")
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
            src, ln = meta.get(name, ("", ""))
            print(f"{ms:9.3f} ms  {name}   [{src}]")
            if ln and ms > 1.0:
                print(f"            {ln}")


if __name__ == "__main__":
    main()
