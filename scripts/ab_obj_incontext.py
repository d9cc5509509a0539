"""IN-CONTEXT cost split of the fused obj-energy kernel (obj_energy.py):
time the full optimize_obj_pose program (2048 x 1024 x 10, the reference
operating point — same setup as trace_objopt.py) with kernel variants that
skip parts of the work, mirroring ab_skin_incontext.py's protocol for the
hand kernel.

  base      unmodified
  nomlp     MLP+fourier replaced by sdf = clip(obj_z) (isolates MLP cost)
  noxform   per-candidate transform assembly replaced by broadcasting the
            raw cloud (isolates the VPU slab transform + scratch stores)
  neither   both skipped (floor: reduce + out-of-kernel program: argmin,
            resampling, pose composition)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


import hotrack_tpu.ops.pallas.obj_energy as oe


def nomlp_core(x, scale, clamp, freqs, wb, n_layers, compute_dtype,
               fourier_da=False):
    return jnp.clip(x[2], -clamp, clamp)


def make_noxform_kernel():
    def kernel(scale_ref, clamp_ref, rts_ref, pcld_ref, freqs_ref,
               *refs, n_layers, n_valid, tb, compute_dtype=None,
               fourier_da=False):
        out_ref, x_ref = refs[-2], refs[-1]
        wb = refs[:-2]
        np_ = pcld_ref.shape[1]
        sub = min(oe.SUB, tb)
        if n_valid != np_:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
            valid = (lane < n_valid).astype(jnp.float32)
        else:
            valid = None
        for g in range(tb // sub):
            for c in range(3):
                for i in range(sub):
                    # per-(g,i) scale so Mosaic can't hoist/dedupe the
                    # stores across group iterations — the per-group VMEM
                    # store traffic must match the real kernel's
                    x_ref[c:c + 1, i * np_:(i + 1) * np_] = \
                        pcld_ref[c:c + 1, :] * (1.0 + 1e-6 * (g * sub + i))
            obj = x_ref[:]
            sdf = oe._sdf_mlp_core(obj, scale_ref[0, 0], clamp_ref[0, 0],
                                   freqs_ref[:], [r[:] for r in wb],
                                   n_layers, compute_dtype,
                                   fourier_da=fourier_da)
            absd = jnp.abs(sdf)[None]
            for i in range(sub):
                seg = absd[:, i * np_:(i + 1) * np_]
                if valid is not None:
                    seg = seg * valid
                p = g * sub + i
                out_ref[p:p + 1, :] = jnp.sum(seg, axis=1, keepdims=True)
    return kernel


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.opt import obj_pose as op
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

    orig_mlp = oe._sdf_mlp_core
    orig_kernel = oe._obj_energy_kernel

    def timed(mlp_core, kernel, reps=16, rounds=4):
        oe._sdf_mlp_core = mlp_core
        oe._obj_energy_kernel = kernel
        try:
            oe._obj_impl.clear_cache()
            oe._obj_vmapped.cache_clear()
            op.optimize_obj_pose.clear_cache()

            def run(r, t):
                return op.optimize_obj_pose(volume, particles, pcld, r, t,
                                            distilled=distilled)

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
        finally:
            oe._sdf_mlp_core = orig_mlp
            oe._obj_energy_kernel = orig_kernel

    for name, mlp_core, kernel in (
            ("base", orig_mlp, orig_kernel),
            ("nomlp", nomlp_core, orig_kernel),
            ("noxform", orig_mlp, make_noxform_kernel()),
            ("neither", nomlp_core, make_noxform_kernel()),
            ("base2", orig_mlp, orig_kernel),
    ):
        dt = timed(mlp_core, kernel)
        print(f"{name:9s} {dt:8.2f} ms/frame  ({dt / 10:6.3f} ms/iter)",
              flush=True)


if __name__ == "__main__":
    main()
