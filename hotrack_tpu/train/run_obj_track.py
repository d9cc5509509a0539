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


def _sequence_assets(cfg, meta0):
    """Resolve the per-sequence SDF assets: volume + (when the DeepSDF
    checkpoints exist) decoder/latent/bake closure for online shape update."""
    source = cfg.get("sdf_code_source", "pred")
    if source == "synthetic":
        return {"volume": synthetic_box_sdf_setup(VOLUME_SIZE, VOXEL_SCALE),
                "decoder": None}
    assets = load_obj_for_opt(cfg["data_cfg"]["basepath"],
                              cfg["data_cfg"]["dataset_name"], source,
                              meta0["file_name"], meta0["category"])
    decoder, variables = load_torch_decoder(assets.model_pth,
                                            cfg["opt"]["NetworkSpecs"])
    latent = load_torch_latent(assets.latent_code_pth)
    coords = volume_coords(VOLUME_SIZE, VOXEL_SCALE)
    ins_coords = cat_to_ins_coords(coords, assets.normalization)
    norm_scale = float(assets.normalization["scale"][0])

    def bake_fn(lat):
        return bake_sdf_volume(decoder.apply, variables, lat, ins_coords,
                               VOLUME_SIZE, norm_scale)

    def cat_to_ins(points):
        return cat_to_ins_coords(points, assets.normalization)

    return {"volume": bake_fn(latent), "decoder": decoder,
            "variables": variables, "latent": latent, "bake_fn": bake_fn,
            "cat_to_ins": cat_to_ins, "assets": assets}


def _sequence_volume(cfg, meta0):
    """Bake (or synthesize) the instance SDF volume for one sequence."""
    return _sequence_assets(cfg, meta0)["volume"]


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
                              obj_jitter_kind=oj["type"],
                              sample_kind=cfg.get("point_sample", "fps"))
        seq_assets = _sequence_assets(cfg, metas[0])
        volume = seq_assets["volume"]
        update_shape_flag = bool(cfg.get("opt", {}).get("updateobjshape")) \
            and seq_assets["decoder"] is not None
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

        if update_shape_flag:
            # online shape refinement path (optimization_obj.py:305-397)
            from ..track.obj import track_obj_with_shape_update
            key, ku = jax.random.split(key)
            result, new_latent = track_obj_with_shape_update(
                seq_assets["decoder"].apply, seq_assets["variables"],
                seq_assets["latent"], seq_assets["bake_fn"],
                seq_assets["cat_to_ins"], particles, batch["obj_points"],
                init_r, init_t, voxel_scale=VOXEL_SCALE,
                bbox_res=VOLUME_SIZE, key=ku)
            _export_updated_mesh(cfg, seq_assets, new_latent)
        else:
            # chunked scans: keep single device programs bounded (long
            # volume-mode scans can trip the worker watchdog; HO3D sequences
            # reach 2000 frames)
            chunk = int(cfg.get("scan_chunk",
                                100 if distilled is not None else 10))
            results = []
            r, t = init_r, init_t
            pts = batch["obj_points"]
            for s in range(0, pts.shape[0], chunk):
                part = track_obj_sequence(volume, particles, pts[s:s + chunk],
                                          r, t, voxel_scale=VOXEL_SCALE,
                                          bbox_res=VOLUME_SIZE,
                                          distilled=distilled)
                r, t = part.rotation[-1], part.translation[-1]
                results.append(part)
            result = jax.tree.map(lambda *xs: jnp.concatenate(xs), *results)
        jax.block_until_ready(result)
        t2 = time.time()
        data_time += t1 - t0
        net_time += t2 - t1
        n_frames += batch["obj_points"].shape[0]

        # 'can'/'box' categories get the extra up/down flip at eval
        # (HO3D_dataset.py:236-239, DexYCB_dataset.py:223-226)
        cat = metas[0]["category"] or ""
        up_down = ("can" in cat) or ("box" in cat)
        gt_r, gt_t = batch["gt_obj_pose"]["rotation"], batch["gt_obj_pose"]["translation"]
        pred_r, pred_t = result.rotation, result.translation
        fix = _cat2ins_fixup(cfg, cat)
        if fix is not None:
            # YCB category->instance frame change before eval
            # (track_network.py:417-425)
            r_fix, t_fix = fix
            gt_r2 = jnp.matmul(gt_r, r_fix.T)
            gt_t = gt_t - jnp.matmul(gt_r2, t_fix.reshape(1, 3, 1))
            pred_r2 = jnp.matmul(pred_r, r_fix.T)
            pred_t = pred_t - jnp.matmul(pred_r2, t_fix.reshape(1, 3, 1))
            gt_r, pred_r = gt_r2, pred_r2
            result_eval = result._replace(rotation=pred_r, translation=pred_t)
        else:
            result_eval = result
        metrics = eval_obj_sequence(result_eval, gt_r, gt_t, cfg["obj_sym"],
                                    up_and_down_sym=up_down)
        chamfer = _chamfer_eval(cfg, metas[0], result, batch)
        if chamfer:
            metrics.update(chamfer)
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


def _export_updated_mesh(cfg, seq_assets, new_latent):
    """Marching-tetrahedra export of the refined shape
    (sdf2mesh + track_network.py:380-382)."""
    try:
        from ..sdf.mesh import create_mesh, write_ply
        verts, faces = create_mesh(seq_assets["decoder"].apply,
                                   seq_assets["variables"], new_latent, n=128)
        out = seq_assets["assets"].recon_mesh_path.replace(".ply", "_update.ply")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        write_ply(out, verts, faces)
        print(f"updated mesh written to {out}")
    except Exception as e:
        print(f"mesh export skipped: {e}")


def _chamfer_eval(cfg, meta0, result, batch):
    """Chamfer vs. the gt mesh, raw + posed (track_network.py:391-433, x1000
    to mm). Needs the reconstruction/gt mesh assets; silently skipped for the
    synthetic fixture."""
    if cfg.get("sdf_code_source", "pred") == "synthetic":
        return None
    try:
        assets = load_obj_for_opt(cfg["data_cfg"]["basepath"],
                                  cfg["data_cfg"]["dataset_name"],
                                  cfg.get("sdf_code_source", "pred"),
                                  meta0["file_name"], meta0["category"])
        from ..sdf.mesh import chamfer_distance, load_mesh, sample_surface
        from ..ops.pointops import farthest_point_sample
        gt_v, gt_f = load_mesh(assets.gt_mesh_path)
        pred_v, _ = load_mesh(assets.recon_mesh_path)
        gt_samples = jnp.asarray(sample_surface(gt_v, gt_f, 2048), jnp.float32)
        pred_v = jnp.asarray(pred_v, jnp.float32)
        if len(pred_v) > 2048:
            idx = farthest_point_sample(pred_v[None], 2048)[0]
            pred_v = pred_v[idx]
        if cfg.get("sdf_code_source") != "gt":
            # instance -> category frame (InsCS2CatCS, optimization_obj.py:39-53)
            fix = _cat2ins_fixup(cfg, meta0["category"])
            if fix is not None:
                r_fix, t_fix = fix
                pred_v = jnp.matmul(pred_v - t_fix, r_fix)
            pred_v = (pred_v / jnp.asarray(assets.normalization["scale"])
                      - jnp.asarray(assets.normalization["offset"]))
        raw = float(chamfer_distance(gt_samples, pred_v)) * 1000.0
        # posed chamfer: mean over frames of posed mesh distance
        t_frames = result.rotation.shape[0]
        posed = []
        for i in range(0, t_frames, max(t_frames // 10, 1)):
            g = gt_samples @ batch["gt_obj_pose"]["rotation"][i].T \
                + batch["gt_obj_pose"]["translation"][i][:, 0]
            p = pred_v @ result.rotation[i].T + result.translation[i][:, 0]
            posed.append(float(chamfer_distance(g, p)) * 1000.0)
        return {"mean/raw_obj_chamfer(mm)": raw,
                "mean/pred_obj_chamfer(mm)": float(np.mean(posed))}
    except (FileNotFoundError, OSError):
        return None


def _cat2ins_fixup(cfg, instance: str):
    """Per-instance category->instance frame change for HO3D/DexYCB eval
    (get_RT + track_network.py:417-425), from data/YCB/CatPose2InsPose.npy.
    Returns (R (3,3), T (3,)) jnp arrays or None."""
    if cfg["data_cfg"]["dataset_name"] not in ("HO3D", "DexYCB"):
        return None
    path = pjoin(cfg["root_dir"], "YCB", "CatPose2InsPose.npy")
    if not os.path.exists(path):
        return None
    change = np.load(path, allow_pickle=True).item()
    if instance not in change:
        return None
    return (jnp.asarray(change[instance]["rotation"], jnp.float32),
            jnp.asarray(change[instance]["translation"], jnp.float32))


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
    if ds in ("HO3D", "DexYCB", "HOI4D"):
        # HOI4D shares the flat "<path-with-underscores>.pkl" convention
        # (track_network.py:445-464; the reference ships the HOI4D save
        # branches but no HOI4D loader)
        name = metas[0]["file_name"].replace("/", "_") + ".pkl"
    else:
        name = metas[0]["category"] + "_" + metas[0]["file_name"][:-4] + ".pkl"
    os.makedirs(cfg["save_dir"], exist_ok=True)
    with open(pjoin(cfg["save_dir"], name), "wb") as f:
        pickle.dump(save_dict, f)
