"""Object tracking runner: per-sequence SDF bake + scan + eval + save.

Parity: the track='obj_opt' path of network/test.py + ObjTrackModel_
Optimization (track_network.py:322-475): load SDF assets per sequence, bake
the 201^3 volume, run the particle optimizer per frame seeded by the last
pose, evaluate symmetry-aware pose errors, and --save trajectory pickles in
the format the hand stage consumes (HO3D_dataset.py:223-234).
"""

from __future__ import annotations

import os
import pickle
import time
from os.path import join as pjoin

import numpy as np
import jax
import jax.numpy as jnp

from ..data import get_dataloader, prepare_batch
from ..opt import presample_particles
from ..sdf.assets import (
    cat_to_ins_coords,
    load_obj_for_opt,
    load_torch_decoder,
    load_torch_latent,
    synthetic_box_sdf_setup,
)
from ..sdf.distill import distill_sdf_volume
from ..sdf.volume import bake_sdf_volume, volume_coords
from ..track.eval import eval_obj_sequence
from ..track.obj import track_obj_sequence
from ..utils.dicts import add_dict, cvt_numpy

VOLUME_SIZE = 201     # (optimization_obj.py:84)
VOXEL_SCALE = 0.002


def _sequence_volume(cfg, meta0):
    """Bake (or synthesize) the instance SDF volume for one sequence."""
    source = cfg.get("sdf_code_source", "pred")
    if source == "synthetic":
        return synthetic_box_sdf_setup(VOLUME_SIZE, VOXEL_SCALE)
    assets = load_obj_for_opt(cfg["data_cfg"]["basepath"],
                              cfg["data_cfg"]["dataset_name"], source,
                              meta0["file_name"], meta0["category"])
    decoder, variables = load_torch_decoder(assets.model_pth,
                                            cfg["opt"]["NetworkSpecs"])
    latent = load_torch_latent(assets.latent_code_pth)
    coords = volume_coords(VOLUME_SIZE, VOXEL_SCALE)
    ins_coords = cat_to_ins_coords(coords, assets.normalization)
    return bake_sdf_volume(decoder.apply, variables, latent, ins_coords,
                           VOLUME_SIZE, float(assets.normalization["scale"][0]))


def run_obj_tracking(cfg, save_flag: bool = False):
    loader = get_dataloader(cfg, "test")
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    key, kp = jax.random.split(key)
    particles = presample_particles(kp, 2048, 6)

    oj = cfg["obj_jitter_cfg"]
    obj_jitter = {"rotation": float(np.deg2rad(oj["r"])),
                  "translation": oj["t"], "scale": oj["s"]}
    from ..mano.model import get_mano_model
    mano = get_mano_model(cfg.get("mano_root"))

    total, per_seq = {}, []
    n_frames, net_time, data_time = 0, 0.0, 0.0
    for seq_idx in range(len(loader)):
        t0 = time.time()
        raw, metas = loader[seq_idx]
        batch = prepare_batch(mano, jax.tree.map(jnp.asarray, raw), key,
                              cfg["num_points"], obj_jitter=obj_jitter,
                              obj_jitter_kind=oj["type"])
        volume = _sequence_volume(cfg, metas[0])
        # default on TPU: distill the volume into an MXU-bound neural SDF
        # (sdf/distill.py) — the trilinear gather path runs at ~scalar speed
        # on TPU (26x slower measured). cfg sdf_query: distilled|volume.
        sdf_query = cfg.get("sdf_query",
                            "distilled" if jax.default_backend() == "tpu"
                            else "volume")
        distilled = None
        if sdf_query == "distilled":
            key, kd = jax.random.split(key)
            distilled = distill_sdf_volume(volume, VOXEL_SCALE, kd)
        init_r = batch["jittered_obj_pose"]["rotation"][0]
        init_t = batch["jittered_obj_pose"]["translation"][0]
        jax.block_until_ready((batch["obj_points"], volume))
        t1 = time.time()

        # chunked scans: keep single device programs bounded (long volume-mode
        # scans can trip the worker watchdog; HO3D sequences reach 2000 frames)
        chunk = int(cfg.get("scan_chunk", 100 if distilled is not None else 10))
        results = []
        r, t = init_r, init_t
        pts = batch["obj_points"]
        for s in range(0, pts.shape[0], chunk):
            part = track_obj_sequence(volume, particles, pts[s:s + chunk],
                                      r, t, voxel_scale=VOXEL_SCALE,
                                      bbox_res=VOLUME_SIZE, distilled=distilled)
            r, t = part.rotation[-1], part.translation[-1]
            results.append(part)
        result = jax.tree.map(lambda *xs: jnp.concatenate(xs), *results)
        jax.block_until_ready(result)
        t2 = time.time()
        data_time += t1 - t0
        net_time += t2 - t1
        n_frames += batch["obj_points"].shape[0]

        metrics = eval_obj_sequence(
            result, batch["gt_obj_pose"]["rotation"],
            batch["gt_obj_pose"]["translation"], cfg["obj_sym"])
        metrics = cvt_numpy(metrics)
        means = {k: float(v) for k, v in metrics.items() if k.startswith("mean/")}
        add_dict(total, means)
        per_seq.append(means)
        print(f"seq {seq_idx}: {means}")

        if save_flag:
            _save_sequence(cfg, metas, result, batch, metrics)

    avg = {k: v / max(len(per_seq), 1) for k, v in total.items()}
    fps_all = n_frames / max(net_time + data_time, 1e-9)
    fps_net = n_frames / max(net_time, 1e-9)
    print(f"frames {n_frames}  FPS(all) {fps_all:.1f}  FPS(network) {fps_net:.1f}")
    print("overall:", {k: round(v, 5) for k, v in avg.items()})
    return avg, {"fps_all": fps_all, "fps_network": fps_net}


def _save_sequence(cfg, metas, result, batch, metrics):
    """Trajectory pickle in the reference format (track_network.py:435-468)."""
    t = result.rotation.shape[0]
    save_dict = {
        "pred_obj_poses": [
            {"rotation": np.asarray(result.rotation[i]),
             "translation": np.asarray(result.translation[i])}
            for i in range(t)],
        "gt_obj_poses": [
            {"rotation": np.asarray(batch["gt_obj_pose"]["rotation"][i]),
             "translation": np.asarray(batch["gt_obj_pose"]["translation"][i])}
            for i in range(t)],
        "file_name": [m["file_name"] for m in metas],
        "r_error_0": np.asarray(metrics["rdiff_0"]),
        "t_error_0": np.asarray(metrics["tdiff_0"]),
        "CAD_ID": metas[0]["category"],
    }
    ds = cfg["data_cfg"]["dataset_name"]
    if ds in ("HO3D", "DexYCB"):
        name = metas[0]["file_name"].replace("/", "_") + ".pkl"
    else:
        name = metas[0]["category"] + "_" + metas[0]["file_name"][:-4] + ".pkl"
    os.makedirs(cfg["save_dir"], exist_ok=True)
    with open(pjoin(cfg["save_dir"], name), "wb") as f:
        pickle.dump(save_dict, f)
