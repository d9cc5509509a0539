"""Object tracking driver: per-frame SDF particle optimization as one scan.

Parity: ObjTrackModel_Optimization (/root/reference/network/models/
track_network.py:322-475): per frame, run the gradient-free pose optimizer
seeded with the previous frame's pose (jittered gt on frame 0,
track_network.py:351-369). The reference's per-frame Python loop becomes one
lax.scan; the SDF volume is baked once per sequence (optimization_obj.py:
133-143 -> sdf/volume.bake_sdf_volume).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..opt.obj_pose import optimize_obj_pose
from .types import ObjTrackResult


@partial(jax.jit, static_argnames=("bbox_res",))
def track_obj_sequence(
    sdf_volume: jnp.ndarray,      # (V, V, V)
    presampled: jnp.ndarray,      # (P, 6) particle bank
    obj_points: jnp.ndarray,      # (T, N, 3) per-frame observed clouds
    init_rotation: jnp.ndarray,   # (3, 3) jittered gt pose of frame 0
    init_translation: jnp.ndarray,  # (3, 1)
    voxel_scale: float = 0.002,
    bbox_res: int = 201,
    distilled=None,               # DistilledSDF (sdf/distill.py)
) -> ObjTrackResult:
    def step(carry, pcld):
        r, t = carry
        r, t, energy = optimize_obj_pose(
            sdf_volume, presampled, pcld, r, t,
            voxel_scale=voxel_scale, bbox_res=bbox_res, distilled=distilled)
        return (r, t), (r, t, energy)

    _, (rs, ts, energies) = jax.lax.scan(
        step, (init_rotation, init_translation), obj_points)
    return ObjTrackResult(rotation=rs, translation=ts, sdf_energy=energies)


def track_obj_sequences_batched(sdf_volumes, presampled, obj_points,
                                init_rotations, init_translations,
                                voxel_scale: float = 0.002,
                                bbox_res: int = 201,
                                distilled=None) -> ObjTrackResult:
    """Track S sequences concurrently: vmap of the per-sequence scan.

    Tracking is sequential within a sequence but embarrassingly parallel
    across sequences (SURVEY §2.3); one chip runs S particle optimizations in
    lockstep, and sharding the S axis over a Mesh scales further. Inputs gain
    a leading S axis: sdf_volumes (S, V, V, V), obj_points (S, T, N, 3), ...

    `distilled`: optional stacked per-sequence DistilledSDF (each leaf with a
    leading S axis). On TPU the vmapped queries run through the batched
    Pallas kernel (ops/pallas/sdf_mlp._cf_impl_batched) — one launch with a
    (sequence, tile) grid, each sequence's grid steps reading its own
    weights.
    """
    if distilled is None:
        fn = jax.vmap(
            lambda vol, pts, r, t: track_obj_sequence(
                vol, presampled, pts, r, t, voxel_scale=voxel_scale,
                bbox_res=bbox_res))
        return fn(sdf_volumes, obj_points, init_rotations, init_translations)
    fn = jax.vmap(
        lambda vol, pts, r, t, d: track_obj_sequence(
            vol, presampled, pts, r, t, voxel_scale=voxel_scale,
            bbox_res=bbox_res, distilled=d))
    return fn(sdf_volumes, obj_points, init_rotations, init_translations,
              distilled)


def track_obj_with_shape_update(
    decoder_apply, decoder_variables, latent,
    bake_fn,                      # (latent) -> (V, V, V) sdf volume
    cat_to_ins,                   # (points (.., 3)) -> instance frame
    presampled, obj_points,       # (T, N, 3)
    init_rotation, init_translation,
    camera_origin=None,           # (3,) camera centre in camera frame
    voxel_scale: float = 0.002, bbox_res: int = 201,
    update_every: int = 10, key=None,
):
    """Object tracking with online shape refinement
    (optimization_obj.py:305-397 + track_network.py:380-382).

    Host loop over `update_every`-frame chunks: each chunk is a jitted scan
    (pose opt + observation merging); between chunks the latent code is
    refined by Adam on the merged cloud and the SDF volume is re-baked.
    Returns (ObjTrackResult, final_latent)."""
    import jax.numpy as jnp
    from ..opt.shape_update import (estimate_normals, merge_observations,
                                    update_shape)
    from ..sdf.volume import trilinear_sdf

    key = key if key is not None else jax.random.PRNGKey(0)
    camera_origin = (jnp.zeros(3) if camera_origin is None
                     else jnp.asarray(camera_origin))
    t_total = obj_points.shape[0]
    sdf_volume = bake_fn(latent)

    # seed the merged buffer with frame-0 observations in the instance frame
    r, t = init_rotation, init_translation
    obj0 = cat_to_ins(jnp.matmul(obj_points[0] - t[:, 0], r))
    cam0 = cat_to_ins(jnp.matmul(camera_origin[None] - t[:, 0], r))[0]
    merged_pc = obj0
    merged_normals = estimate_normals(obj0, cam0)
    merge_num = 1

    rs, ts, energies = [], [], []
    for start in range(0, t_total, update_every):
        chunk = obj_points[start:start + update_every]
        for f in range(chunk.shape[0]):
            r, t, energy = optimize_obj_pose(
                sdf_volume, presampled, chunk[f], r, t,
                voxel_scale=voxel_scale, bbox_res=bbox_res)
            rs.append(r), ts.append(t), energies.append(energy)
            # accumulate good observations (optimization_obj.py:310-328)
            obj_frame = jnp.matmul(chunk[f] - t[:, 0], r)
            sdf = trilinear_sdf(sdf_volume, obj_frame, voxel_scale, bbox_res)
            good = jnp.abs(sdf) < 0.02
            ins_pts = cat_to_ins(obj_frame)
            cam = cat_to_ins(jnp.matmul(camera_origin[None] - t[:, 0], r))[0]
            normals = estimate_normals(ins_pts, cam)
            merge_num += 1
            key, k1 = jax.random.split(key)
            merged_pc, merged_normals = merge_observations(
                merged_pc, merged_normals, ins_pts, normals, good,
                jnp.asarray(merge_num), k1)
        # shape refinement + volume re-bake (optimization_obj.py:331-332,387-396)
        key, k2 = jax.random.split(key)
        latent = update_shape(decoder_apply, decoder_variables, latent,
                              merged_pc, merged_normals, k2)
        sdf_volume = bake_fn(latent)

    result = ObjTrackResult(rotation=jnp.stack(rs), translation=jnp.stack(ts),
                            sdf_energy=jnp.stack(energies))
    return result, latent


def track_obj_sequences_sharded(sdf_volumes, presampled, obj_points,
                                init_rotations, init_translations,
                                devices=None, **kwargs):
    """Multi-chip object tracking: `track_obj_sequences_batched` with the
    sequence axis sharded over a 1-D device mesh (params/particle bank
    replicated, per-sequence volumes/clouds/poses split; no collectives —
    sequences are independent)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices() if devices is None else devices)
    mesh = Mesh(devices, ("seq",))
    seq = NamedSharding(mesh, P("seq"))
    repl = NamedSharding(mesh, P())
    sdf_volumes, obj_points, init_rotations, init_translations = (
        jax.device_put(x, seq) for x in (sdf_volumes, obj_points,
                                         init_rotations, init_translations))
    presampled = jax.device_put(presampled, repl)
    distilled = kwargs.pop("distilled", None)
    if distilled is not None:
        distilled = jax.device_put(distilled, seq)
    return track_obj_sequences_batched(
        sdf_volumes, presampled, obj_points, init_rotations,
        init_translations, distilled=distilled, **kwargs)
