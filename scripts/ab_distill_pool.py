"""A/B: pooled-sample distillation vs per-step fresh sampling.

Times distill_sdf_volume on the real TPU at the hand-stage operating point
(151^3 @ 3 mm) and the obj-stage one (201^3 @ 2 mm), chained-dependency
timing, min over rounds; checks near-surface accuracy of both variants
against the trilinear volume.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_distill_pool.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from hotrack_tpu.sdf.distill import distill_sdf_volume, eval_distilled_sdf
from hotrack_tpu.sdf.volume import trilinear_sdf, volume_coords


def box_volume(size, voxel_scale, half=(0.04, 0.06, 0.02)):
    c = volume_coords(size, voxel_scale)
    q = jnp.abs(c) - jnp.asarray(half)
    outside = jnp.linalg.norm(jnp.clip(q, min=0.0), axis=-1)
    inside = jnp.clip(jnp.max(q, axis=-1), max=0.0)
    return (outside + inside).reshape(size, size, size)


def compound_volume(size, voxel_scale):
    """Box + offset sphere union — the sweep script's harder target."""
    c = volume_coords(size, voxel_scale)
    q = jnp.abs(c) - jnp.asarray([0.05, 0.03, 0.02])
    box = (jnp.linalg.norm(jnp.clip(q, min=0.0), axis=-1)
           + jnp.clip(jnp.max(q, axis=-1), max=0.0))
    sph = jnp.linalg.norm(c - jnp.asarray([0.03, 0.04, 0.0]), axis=-1) - 0.035
    return jnp.minimum(box, sph).reshape(size, size, size)


def rmse_near(vol, model, size, scale, seed=0):
    rng = np.random.RandomState(seed)
    ext = (size // 2) * scale
    pts = jnp.asarray(rng.uniform(-ext, ext, (200000, 3)), jnp.float32)
    gt = trilinear_sdf(vol, pts, scale, size, bbox_min=-(size // 2) * scale)
    pred = eval_distilled_sdf(model, pts)
    err = np.asarray(pred) - np.asarray(gt)
    near = np.abs(np.asarray(gt)) < 0.02
    return float(np.sqrt(np.mean(err[near] ** 2))), float(
        np.sqrt(np.mean(err ** 2)))


def time_distill(vol, scale, pool_batches, rounds=3, reps=3):
    best = float("inf")
    for _ in range(rounds):
        key = jax.random.PRNGKey(0)
        v = vol
        t0 = time.time()
        for _ in range(reps):
            m = distill_sdf_volume(v, scale, key, pool_batches=pool_batches)
            # chain: next rep's volume depends on this rep's output
            v = vol + 0.0 * jnp.mean(m.weights[0])
            key = jax.random.fold_in(key, 1)
        np.asarray(jnp.mean(v))
        best = min(best, (time.time() - t0) / reps)
    return best, m


def main():
    print("backend:", jax.default_backend())
    for name, size, scale, mk in (
            ("hand 151^3@3mm box", 151, 0.003, box_volume),
            ("hand 151^3@3mm compound", 151, 0.003, compound_volume),
            ("obj 201^3@2mm box", 201, 0.002, box_volume)):
        vol = mk(size, scale)
        np.asarray(jnp.mean(vol))
        for pb in (0, 64):
            t, m = time_distill(vol, scale, pb)
            rn, ra = rmse_near(vol, m, size, scale)
            print(f"{name:28s} pool={pb:3d}: {t*1000:8.1f} ms/distill  "
                  f"near-RMSE {rn*1000:.3f} mm  all {ra*1000:.3f} mm")


if __name__ == "__main__":
    main()
