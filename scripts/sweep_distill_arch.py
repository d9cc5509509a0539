"""Accuracy sweep of the distilled-SDF architecture (depth x fourier freqs).

The in-context ablation (ab_handopt_incontext.py) measured the fourier
features at ~2.7 ms/iter and the hidden-layer stack at ~1.2 ms/iter/layer in
the hand-opt stage — the same MLP dominates the object stage. This sweep
checks what architecture shrinkage costs in DISTILLATION ERROR on two
volumes (the hand stage's 151^3 @ 3 mm box and a harder compound shape:
box + spheres union) before any defaults change.

Errors are vs the trilinear interpolant (the exact function being replaced),
at near-surface continuous points (|sdf| < 0.02, the band the optimizer
energies read) and uniform points. Units: meters.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HOTRACK_JAX_CACHE", ".jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def compound_volume(v: int, voxel_scale: float) -> jnp.ndarray:
    """Box + three spheres union, clamped like the baked volumes."""
    half = v // 2
    ax = (np.arange(v) - half) * voxel_scale
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")

    def box(cx, cy, cz, hx, hy, hz):
        qx, qy, qz = (np.abs(x - cx) - hx, np.abs(y - cy) - hy,
                      np.abs(z - cz) - hz)
        outside = np.sqrt(np.maximum(qx, 0) ** 2 + np.maximum(qy, 0) ** 2
                          + np.maximum(qz, 0) ** 2)
        inside = np.minimum(np.maximum(qx, np.maximum(qy, qz)), 0.0)
        return outside + inside

    def sphere(cx, cy, cz, r):
        return np.sqrt((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2) - r

    sdf = box(0, 0, 0, 0.05, 0.03, 0.08)
    sdf = np.minimum(sdf, sphere(0.04, 0.03, 0.06, 0.035))
    sdf = np.minimum(sdf, sphere(-0.05, -0.02, -0.05, 0.03))
    sdf = np.minimum(sdf, sphere(0.0, -0.04, 0.02, 0.025))
    return jnp.asarray(np.clip(sdf, -0.05, 0.05).astype(np.float32))


def main():
    from hotrack_tpu.train.cli import setup_compilation_cache
    setup_compilation_cache()
    from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
    from hotrack_tpu.sdf.distill import distill_sdf_volume, _raw_sdf
    from hotrack_tpu.sdf.volume import trilinear_sdf

    volumes = {
        "box151": (synthetic_box_sdf_setup(151, 0.003), 0.003),
        "compound151": (compound_volume(151, 0.003), 0.003),
    }

    rng = np.random.RandomState(0)

    def sample_points(volume, voxel_scale, n=200000):
        v = volume.shape[0]
        half = v // 2
        extent = half * voxel_scale
        flat = np.asarray(volume).reshape(-1)
        near = np.flatnonzero(np.abs(flat) < 0.02)
        idx = near[rng.randint(0, len(near), n)]
        centres = np.stack([idx // (v * v) - half, (idx // v) % v - half,
                            idx % v - half], -1).astype(np.float32) * voxel_scale
        pts_near = centres + rng.uniform(-voxel_scale, voxel_scale,
                                         centres.shape).astype(np.float32)
        pts_uni = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
        return jnp.asarray(pts_near), jnp.asarray(pts_uni)

    @jax.jit
    def errors(model, volume, pts, voxel_scale):
        v = volume.shape[0]
        pred = jnp.clip(_raw_sdf(model, pts), -model.clamp, model.clamp)
        target = trilinear_sdf(volume, pts, voxel_scale, v,
                               bbox_min=-(v // 2) * voxel_scale, clamp=0.05)
        err = jnp.abs(pred - target)
        return (jnp.sqrt(jnp.mean(err ** 2)), jnp.percentile(err, 95),
                jnp.max(err))

    archs = [(4, 8), (4, 4), (4, 3), (3, 8), (3, 4), (3, 3), (2, 8), (2, 4)]
    for vname, (volume, vs) in volumes.items():
        pts_near, pts_uni = sample_points(volume, vs)
        print(f"\n== {vname} (voxel {vs * 1000:.0f} mm) ==", flush=True)
        for depth, mf in archs:
            model = distill_sdf_volume(volume, vs, jax.random.PRNGKey(3),
                                       depth=depth, max_freqs=mf)
            rn, p95n, mxn = (float(x) for x in errors(model, volume,
                                                      pts_near, vs))
            ru, p95u, mxu = (float(x) for x in errors(model, volume,
                                                      pts_uni, vs))
            nf = len(model.freqs)
            print(f"depth={depth} freqs={nf}: near rmse {rn * 1000:6.3f} mm "
                  f"p95 {p95n * 1000:6.3f} max {mxn * 1000:6.2f} | "
                  f"uniform rmse {ru * 1000:6.3f} p95 {p95u * 1000:6.3f} "
                  f"max {mxu * 1000:6.2f}", flush=True)


if __name__ == "__main__":
    main()
