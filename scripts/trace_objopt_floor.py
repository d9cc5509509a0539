"""Op-by-op evidence for the objopt 'neither' floor (VERDICT r3 item 7).

Round 3 attributed the fused obj kernel's 0.28 ms/iter residual ("slab
stores + lane reductions + grid glue") by SUBTRACTION (ab_obj_incontext.py).
This script gives it the hand-kernel treatment:

1. device traces (jax.profiler, per-op self-time tables) of the full
   optimize_obj_pose program for BOTH the base kernel and the 'neither'
   variant — splitting the out-of-kernel program (argmin, resampling,
   pose composition) from the kernel itself, op by op;
2. an in-kernel micro-ablation of the floor: 'neither' (stores + reduce)
   vs reduce-only vs stores-only kernels, chained-timed in context, so the
   floor's composition is measured rather than asserted.

Same operating point as trace_objopt.py / ab_obj_incontext.py
(2048 particles x 1024 pts x 10 iters, distilled 201^3 box SDF).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def make_floor_kernel(stores: bool, reduce_: bool):
    """Micro-variants of ab_obj_incontext's 'neither' kernel: keep only the
    per-group VMEM slab stores, only the per-particle lane reductions, or
    neither (grid glue alone). Per-(g,i) scales block Mosaic from
    hoisting/deduping stores across iterations, as in the parent variant."""
    import hotrack_tpu.ops.pallas.obj_energy as oe

    def kernel(scale_ref, clamp_ref, rts_ref, pcld_ref, freqs_ref, *refs,
               n_layers, n_valid, tb, compute_dtype=None, fourier_da=False):
        out_ref, x_ref = refs[-2], refs[-1]
        np_ = pcld_ref.shape[1]
        sub = min(oe.SUB, tb)
        for g in range(tb // sub):
            if stores:
                for c in range(3):
                    for i in range(sub):
                        x_ref[c:c + 1, i * np_:(i + 1) * np_] = \
                            pcld_ref[c:c + 1, :] * (1.0 + 1e-6 * (g * sub + i))
            for i in range(sub):
                p = g * sub + i
                if reduce_:
                    if stores:
                        seg = jnp.abs(x_ref[2:3, i * np_:(i + 1) * np_])
                    else:
                        seg = jnp.abs(pcld_ref[2:3, :]) * (1.0 + 1e-6 * p)
                    out_ref[p:p + 1, :] = jnp.sum(seg, axis=1, keepdims=True)
                elif stores:
                    out_ref[p:p + 1, :] = x_ref[0:1, 0:1] * (1.0 + 1e-6 * p)
                else:
                    out_ref[p:p + 1, :] = pcld_ref[0:1, 0:1] * (1.0 + 1e-6 * p)
    return kernel


def print_trace_table(trace_dir: str, label: str, n_calls: int):
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
        for ev in events:
            if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
                continue
            per_op[ev.get("name", "?")[:70]] += ev.get("dur", 0) / 1e3
        total = sum(per_op.values())
        print(f"\n== {label}: device ops over {n_calls} calls "
              f"(total {total:.2f} ms = {total / n_calls:.2f} ms/call) ==")
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{ms:9.3f} ms ({ms / n_calls:7.3f}/call)  {name}")


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    import hotrack_tpu.ops.pallas.obj_energy as oe
    from hotrack_tpu.opt import obj_pose as op
    from hotrack_tpu.opt.particle import presample_particles
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume
    from ab_obj_incontext import make_noxform_kernel, nomlp_core

    key = jax.random.PRNGKey(0)
    volume = synthetic_box_sdf_setup(201, 0.002)
    distilled = distill_sdf_volume(volume, 0.002, key)
    particles = presample_particles(jax.random.PRNGKey(1), 2048, 6)
    rng = np.random.RandomState(2)
    pcld = jnp.asarray(rng.randn(1024, 3).astype(np.float32) * 0.04)
    r0, t0_ = jnp.eye(3), jnp.zeros((3, 1))

    orig_mlp, orig_kernel = oe._sdf_mlp_core, oe._obj_energy_kernel

    def run(r, t):
        return op.optimize_obj_pose(volume, particles, pcld, r, t,
                                    distilled=distilled)

    def with_variant(mlp_core, kernel, fn):
        oe._sdf_mlp_core, oe._obj_energy_kernel = mlp_core, kernel
        try:
            oe._obj_impl.clear_cache()
            oe._obj_vmapped.cache_clear()
            op.optimize_obj_pose.clear_cache()
            return fn()
        finally:
            oe._sdf_mlp_core, oe._obj_energy_kernel = orig_mlp, orig_kernel

    def trace(label, n_calls=3):
        trace_dir = f"/tmp/objopt_floor_trace_{label}"
        os.system(f"rm -rf {trace_dir}")
        r, t, e = run(r0, t0_)
        np.asarray(e)  # warm-up / compile
        jax.profiler.start_trace(trace_dir)
        r, t = r0, t0_
        for _ in range(n_calls):
            r, t, e = run(r, t)
            z = 0.0 * jnp.minimum(e, 1.0)
            r, t = r0 + z * r, t0_ + z * t
        np.asarray(r)
        jax.profiler.stop_trace()
        print_trace_table(trace_dir, label, n_calls)

    def timed(reps=16, rounds=4):
        r, t, e = run(r0, t0_)
        np.asarray(e)
        best = float("inf")
        for _ in range(rounds):
            r, t = r0, t0_
            t_start = time.perf_counter()
            for _ in range(reps):
                r, t, e = run(r, t)
                z = 0.0 * jnp.minimum(e, 1.0)
                r, t = r0 + z * r, t0_ + z * t
            np.asarray(r)
            best = min(best, (time.perf_counter() - t_start) / reps)
        return best * 1000.0

    # 1) op-by-op device traces: base program and the 'neither' program
    trace("base")
    with_variant(nomlp_core, make_noxform_kernel(),
                 lambda: trace("neither"))

    # 2) in-kernel micro-ablation of the floor
    rows = [("neither (stores+reduce)", nomlp_core, make_noxform_kernel()),
            ("reduce_only", nomlp_core, make_floor_kernel(False, True)),
            ("stores_only", nomlp_core, make_floor_kernel(True, False)),
            ("glue_only", nomlp_core, make_floor_kernel(False, False)),
            ("base (check)", orig_mlp, orig_kernel)]
    print("\n== in-kernel floor micro-ablation (full program, chained, "
          "min over 4 rounds x 16 reps) ==")
    for name, mlp_core, kernel in rows:
        dt = with_variant(mlp_core, kernel, timed)
        print(f"{name:24s} {dt:8.2f} ms/frame  ({dt / 10:6.3f} ms/iter)",
              flush=True)


if __name__ == "__main__":
    main()
