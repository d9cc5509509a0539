"""Hand tracking runner: sequence scan + eval + trajectory pickles.

Parity: the track='hand'/'hand_IKNet' paths of network/test.py +
HandTrackModel (track_network.py:96-320). Loads the HandTrackNet (and IKNet)
checkpoints — composed from separate experiment dirs like the reference's
handnet./IKnet. prefixes (trainer.py:206-227) — then runs the jitted scan
driver per sequence, evaluates, and optionally saves trajectory pickles.
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
from ..mano.model import get_mano_model
from ..models.hand_network import HandTrackNet, IKNet
from ..opt import load_contact_zones, presample_particles
from ..pose.rotations import mano_quat2axisang, matrix_to_unit_quaternion
from ..track.eval import eval_hand_sequence
from ..track.hand import track_hand_sequence
from ..utils.dicts import add_dict, cvt_numpy
from .run_obj_track import _sequence_volume
from .trainer import Trainer

HAND_VOLUME_SIZE = 151    # (optimization_hand.py:148-149)
HAND_VOXEL_SCALE = 0.003


def _load_model(cfg, network_type: str, experiment_dir: str, example_batch):
    sub = dict(cfg)
    sub["network"] = dict(cfg["network"])
    sub["network"]["type"] = network_type
    sub["experiment_dir"] = experiment_dir
    trainer = Trainer(sub)
    trainer.init_state(example_batch, cfg.get("seed", 0))
    if not trainer.resume():
        print(f"WARNING: no checkpoint found in {experiment_dir}/ckpt; "
              f"using random init")
    return trainer


def run_hand_tracking(cfg, save_flag: bool = False):
    loader = get_dataloader(cfg, "test")
    mano = get_mano_model(cfg.get("mano_root"))
    key = jax.random.PRNGKey(cfg.get("seed", 0))

    use_iknet = cfg["track"] == "hand_IKNet"
    use_opt = bool(cfg.get("use_optimization", False)) and use_iknet
    shape_mode = cfg.get("use_pred_hand_shape", False)

    hj = cfg["hand_jitter_cfg"]

    # init models from the first sequence's first frames
    raw0, metas0 = loader[0]
    key, k0 = jax.random.split(key)
    batch0 = prepare_batch(mano, jax.tree.map(jnp.asarray, raw0), k0,
                           cfg["num_points"],
                           hand_jitter_scale=hj["rand_scale"],
                           jitter_kind=hj["rand_type"],
                           sample_kind=cfg.get("point_sample", "fps"))
    example = jax.tree.map(lambda a: a[:1], batch0)
    handnet_tr = _load_model(cfg, "HandTrackNet", cfg["experiment_dir"], example)
    iknet_tr = None
    if use_iknet:
        iknet_tr = _load_model(cfg, "iknet", cfg.get("IKNet_dir",
                                                     cfg["experiment_dir"]),
                               example)

    shape_particles = pose_particles = zones = sdf_volume = None
    energy_weight = None
    if use_iknet and shape_mode:
        key, k1 = jax.random.split(key)
        shape_particles = presample_particles(k1, 5120, 10)
    if use_opt:
        key, k2 = jax.random.split(key)
        pose_particles = presample_particles(k2, 5120, 16)
        zones_path = cfg.get("contact_zones_path")
        zones = load_contact_zones(zones_path if zones_path and
                                   os.path.exists(zones_path) else None)
        energy_weight = {k: float(v)
                         for k, v in cfg["opt"]["energy_weight"].items()}

    # batched multi-sequence evaluation: tracking is sequential within a
    # sequence but embarrassingly parallel across sequences — vmap N
    # equal-length sequences through one scan (cfg eval_batch_seqs).
    # Controlled device-side measurements show near-linear aggregate scaling
    # (BENCHMARKS.md); the end-to-end runner wall-clock is currently
    # dominated by per-sequence host I/O + dispatch, so treat this as the
    # deployment skeleton rather than a tuned path. vmap also fp-reorders
    # per-frame math (metrics equal to ~fp-chaos level). The optimization
    # path vmaps per-sequence SDFs/masks too — on TPU those land in the
    # batched Pallas kernels (ops/pallas/sdf_mlp.py, mask_lookup.py).
    batch_seqs = int(cfg.get("eval_batch_seqs", 1))
    if batch_seqs > 1:
        return _run_batched(cfg, save_flag, loader, mano, key, hj,
                            handnet_tr, iknet_tr, use_iknet, shape_mode,
                            shape_particles, batch_seqs,
                            use_opt=use_opt, pose_particles=pose_particles,
                            zones=zones, energy_weight=energy_weight)

    total, n_seq = {}, 0
    n_frames, net_time, data_time = 0, 0.0, 0.0
    for seq_idx in range(len(loader)):
        t0 = time.time()
        raw, metas = loader[seq_idx]
        key, k1 = jax.random.split(key)
        batch = prepare_batch(mano, jax.tree.map(jnp.asarray, raw), k1,
                              cfg["num_points"],
                              hand_jitter_scale=hj["rand_scale"],
                              jitter_kind=hj["rand_type"],
                              sample_kind=cfg.get("point_sample", "fps"))
        background_masks = None
        distilled = None
        if use_opt:
            sdf_volume = _hand_volume(cfg, metas[0])
            if cfg.get("sdf_query", "distilled" if jax.default_backend() == "tpu"
                       else "volume") == "distilled":
                from ..sdf.distill import distill_sdf_volume
                key, kd = jax.random.split(key)
                distilled = distill_sdf_volume(sdf_volume, HAND_VOXEL_SCALE, kd)
            background_masks = jnp.asarray(load_background_masks(cfg, metas))
        jax.block_until_ready(batch["hand_points"])
        t1 = time.time()

        result = track_hand_sequence(
            handnet_tr.model, handnet_tr.variables, mano, batch,
            iknet=iknet_tr.model if iknet_tr else None,
            ik_variables=iknet_tr.variables if iknet_tr else None,
            use_opt=use_opt, shape_mode=shape_mode,
            shape_particles=shape_particles, pose_particles=pose_particles,
            zones=zones, sdf_volume=sdf_volume,
            background_masks=background_masks,
            energy_weight=energy_weight,
            use_pred_obj_pose=bool(cfg.get("use_pred_obj_pose", False)),
            sdf_voxel_scale=HAND_VOXEL_SCALE, distilled=distilled)
        jax.block_until_ready(result)
        t2 = time.time()
        data_time += t1 - t0
        net_time += t2 - t1
        n_frames += batch["hand_points"].shape[0]

        metrics = cvt_numpy(eval_hand_sequence(
            result, batch["gt_hand_kp"],
            batch["gt_hand_pose"]["palm_template"][0]))
        means = {k[5:]: float(v) for k, v in metrics.items()
                 if k.startswith("mean/")}
        add_dict(total, means)
        n_seq += 1
        print(f"seq {seq_idx}: {({k: round(v, 5) for k, v in means.items()})}")

        if save_flag:
            _save_sequence(cfg, metas, result, batch, metrics, use_iknet)
        if cfg.get("debug") or cfg.get("debug_save"):
            _debug_visualize(cfg, metas, result, batch)

    avg = {k: v / max(n_seq, 1) for k, v in total.items()}
    fps_all = n_frames / max(net_time + data_time, 1e-9)
    fps_net = n_frames / max(net_time, 1e-9)
    print(f"frames {n_frames}  FPS(all) {fps_all:.1f}  FPS(network) {fps_net:.1f}")
    print("overall:", {k: round(v, 5) for k, v in avg.items()})
    return avg, {"fps_all": fps_all, "fps_network": fps_net}


def _run_batched(cfg, save_flag, loader, mano, key, hj, handnet_tr, iknet_tr,
                 use_iknet, shape_mode, shape_particles, batch_seqs,
                 use_opt=False, pose_particles=None, zones=None,
                 energy_weight=None):
    """vmap groups of equal-length sequences through the scan driver.

    With use_opt, each chunk stacks per-sequence SDFs (distilled models) and
    silhouette masks on the vmapped axis; the Pallas kernels batch them as a
    (sequence, tile) grid on TPU."""
    # group sequence indices by length
    groups = {}
    for seq_idx in range(len(loader)):
        t = len(loader.sequences[seq_idx])
        groups.setdefault(t, []).append(seq_idx)

    common = dict(iknet=iknet_tr.model if iknet_tr else None,
                  ik_variables=iknet_tr.variables if iknet_tr else None,
                  shape_mode=shape_mode, shape_particles=shape_particles)
    if not use_opt:
        track_vmapped = jax.vmap(
            lambda b: track_hand_sequence(
                handnet_tr.model, handnet_tr.variables, mano, b, **common))
    else:
        opt_common = dict(use_opt=True, pose_particles=pose_particles,
                          zones=zones, energy_weight=energy_weight,
                          use_pred_obj_pose=bool(
                              cfg.get("use_pred_obj_pose", False)),
                          sdf_voxel_scale=HAND_VOXEL_SCALE, **common)
        track_vmapped_vol = jax.vmap(
            lambda b, vol, masks: track_hand_sequence(
                handnet_tr.model, handnet_tr.variables, mano, b,
                sdf_volume=vol, background_masks=masks, **opt_common))
        track_vmapped_dist = jax.vmap(
            lambda b, vol, masks, dist: track_hand_sequence(
                handnet_tr.model, handnet_tr.variables, mano, b,
                sdf_volume=vol, background_masks=masks, distilled=dist,
                **opt_common))

    use_distill = (cfg.get("sdf_query",
                           "distilled" if jax.default_backend() == "tpu"
                           else "volume") == "distilled")

    total, n_seq, n_frames = {}, 0, 0
    t_start = time.time()
    for t_len, idxs in groups.items():
        for s in range(0, len(idxs), batch_seqs):
            chunk = idxs[s:s + batch_seqs]
            raws, metas_list = zip(*(loader[i] for i in chunk))
            key, k1 = jax.random.split(key)
            batches = [prepare_batch(mano, jax.tree.map(jnp.asarray, r), k1,
                                     cfg["num_points"],
                                     hand_jitter_scale=hj["rand_scale"],
                                     jitter_kind=hj["rand_type"],
                                     sample_kind=cfg.get("point_sample", "fps"))
                       for r in raws]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
            if not use_opt:
                results = track_vmapped(stacked)
            else:
                vols = jnp.stack([_hand_volume(cfg, metas[0])
                                  for metas in metas_list])
                masks = [load_background_masks(cfg, metas)
                         for metas in metas_list]
                mh = max(m.shape[1] for m in masks)
                mw = max(m.shape[2] for m in masks)
                # edge-replicated padding: the optimizer clips projections to
                # the PADDED dims, so vertices past a smaller mask's true
                # boundary must read the edge-clamped pixel (what the
                # unbatched path's clipping produces), not padded zeros
                masks = jnp.stack([
                    np.pad(m, ((0, 0), (0, mh - m.shape[1]),
                               (0, mw - m.shape[2])), mode="edge")
                    for m in masks])
                if use_distill:
                    from ..sdf.distill import distill_sdf_volume
                    models = []
                    for vol in vols:
                        key, kd = jax.random.split(key)
                        models.append(distill_sdf_volume(
                            vol, HAND_VOXEL_SCALE, kd))
                    dist = jax.tree.map(lambda *xs: jnp.stack(xs), *models)
                    results = track_vmapped_dist(stacked, vols, masks, dist)
                else:
                    results = track_vmapped_vol(stacked, vols, masks)
            for bi, (batch, metas) in enumerate(zip(batches, metas_list)):
                result = jax.tree.map(lambda a: a[bi], results)
                metrics = cvt_numpy(eval_hand_sequence(
                    result, batch["gt_hand_kp"],
                    batch["gt_hand_pose"]["palm_template"][0]))
                means = {k[5:]: float(v) for k, v in metrics.items()
                         if k.startswith("mean/")}
                add_dict(total, means)
                n_seq += 1
                n_frames += t_len
                if save_flag:
                    _save_sequence(cfg, metas, result, batch, metrics,
                                   use_iknet)
    wall = time.time() - t_start
    avg = {k: v / max(n_seq, 1) for k, v in total.items()}
    fps = n_frames / max(wall, 1e-9)
    print(f"frames {n_frames}  sequences {n_seq}  batched({batch_seqs}) "
          f"FPS(all) {fps:.1f}")
    print("overall:", {k: round(v, 5) for k, v in avg.items()})
    return avg, {"fps_all": fps, "fps_network": fps}


def load_background_masks(cfg, metas) -> "np.ndarray":
    """Pre-load the per-frame background silhouette masks for one sequence
    (True = background pixel). The reference reads these from disk *inside*
    the 5120-particle optimizer's per-frame setup (optimization_hand.py:
    316-333); here the whole (T, H, W) stack is loaded once per sequence and
    scanned on device."""
    import cv2
    ds = cfg["data_cfg"]["dataset_name"]
    root = cfg["data_cfg"]["basepath"]
    masks = []
    for meta in metas:
        fname = meta["file_name"]
        if ds == "HO3D":
            seq, fid = fname.split("/")
            img = cv2.imread(pjoin(root, f"train/{seq}/seg/{fid}.png"))
            img = cv2.resize(img, (640, 480), interpolation=cv2.INTER_NEAREST)
            masks.append(img.sum(axis=-1) == 0)
        elif ds == "SimGrasp":
            path = pjoin(root, "masks/%s/seq/%s.png" % (meta["category"], fname))
            if os.path.exists(path):
                img = cv2.imread(path)
                masks.append(img.sum(axis=-1) == 0)
            else:  # synthetic datasets ship no masks -> no silhouette term
                masks.append(np.zeros((1, 1), bool))
        elif ds == "DexYCB":
            parts = fname.split("+")
            lbl = np.load(pjoin(root, "%s/%s/%s/labels_%s.npz"
                                % (parts[0], parts[1], parts[2], parts[3])))
            masks.append(lbl["seg"] == 0)
        else:
            masks.append(np.zeros((1, 1), bool))
    h = max(m.shape[0] for m in masks)
    w = max(m.shape[1] for m in masks)
    out = np.zeros((len(masks), h, w), bool)
    for i, m in enumerate(masks):
        out[i, :m.shape[0], :m.shape[1]] = m
    return out


def _hand_volume(cfg, meta0):
    """151^3 @ 3mm volume for the hand optimizer (optimization_hand.py:189-214)."""
    import functools
    from ..sdf.assets import synthetic_box_sdf_setup
    if cfg.get("sdf_code_source") == "synthetic":
        return synthetic_box_sdf_setup(HAND_VOLUME_SIZE, HAND_VOXEL_SCALE)
    from ..sdf.assets import (cat_to_ins_coords, load_obj_for_opt,
                              load_torch_decoder, load_torch_latent)
    from ..sdf.volume import bake_sdf_volume, volume_coords
    assets = load_obj_for_opt(cfg["data_cfg"]["basepath"],
                              cfg["data_cfg"]["dataset_name"],
                              cfg.get("sdf_code_source", "pred"),
                              meta0["file_name"], meta0["category"])
    decoder, variables = load_torch_decoder(assets.model_pth,
                                            cfg["opt"]["NetworkSpecs"])
    latent = load_torch_latent(assets.latent_code_pth)
    coords = volume_coords(HAND_VOLUME_SIZE, HAND_VOXEL_SCALE)
    ins = cat_to_ins_coords(coords, assets.normalization)
    return bake_sdf_volume(decoder.apply, variables, latent, ins,
                           HAND_VOLUME_SIZE,
                           float(assets.normalization["scale"][0]))


def _debug_visualize(cfg, metas, result, batch):
    """Per-frame cloud + init/pred/gt skeleton figures for --debug /
    --debug_save (model.visualize, track_network.py:311-320 +
    hand_network.py:223-243). The per-frame tracker init is reconstructed
    from the recentering rule (track_network.py:161-163): frame 0 uses the
    jittered keypoints; frame i uses pred_{i-1} shifted by the cloud-mean
    delta."""
    from ..utils.vis import hand_vis
    points = np.asarray(batch["hand_points"])
    pred = np.asarray(result.pred_kp)
    gt = np.asarray(batch["gt_hand_kp"])
    means = points.mean(axis=1)  # (T, 3)
    init = np.concatenate(
        [np.asarray(batch["jittered_hand_kp"][:1]),
         pred[:-1] - means[:-1, None, :] + means[1:, None, :]], axis=0)
    folder = pjoin(cfg["experiment_dir"], "debug")
    save = bool(cfg.get("debug_save"))
    for i in range(pred.shape[0]):
        hand_vis(points[i], init[i], pred[i], gt[i],
                 show_fig=bool(cfg.get("debug")) and not save, save_fig=save,
                 save_folder=folder, save_name=str(metas[i]["file_name"]))


def _save_sequence(cfg, metas, result, batch, metrics, use_iknet):
    """Trajectory pickle (track_network.py:252-298)."""
    t = result.pred_kp.shape[0]
    save_dict = {
        "gt_hand_kp": [np.asarray(batch["gt_hand_kp"][i]) for i in range(t)],
        "pred_hand_kp": [np.asarray(result.pred_kp[i]) for i in range(t)],
        "file_name": [m["file_name"] for m in metas],
        "kp_error": np.asarray(metrics["hand_pred_kp_diff"]),
        "r_error": np.asarray(metrics["hand_pred_r_diff"]),
        "t_error": np.asarray(metrics["hand_pred_t_diff"]),
    }
    if use_iknet:
        quat = matrix_to_unit_quaternion(result.global_rotation)
        global_aa = mano_quat2axisang(quat)
        save_dict["pred_hand_poses"] = {
            "mano_pose": np.asarray(jnp.concatenate(
                [global_aa, result.mano_theta], axis=-1)),
            "mano_trans": np.asarray(result.global_translation[..., 0]),
            "mano_beta": np.asarray(result.pred_beta),
        }
        save_dict["baseline_pred_kp"] = [
            np.asarray(result.baseline_pred_kp[i]) for i in range(t)]

    ds = cfg["data_cfg"]["dataset_name"]
    if ds in ("HO3D", "DexYCB", "HOI4D"):
        name = metas[0]["file_name"].replace("/", "_") + ".pkl"
        if ds == "HOI4D":
            # HOI4D additionally strips the "_preprocess" suffix from the
            # flattened path (track_network.py:285-293; the reference ships
            # these save branches but no HOI4D loader)
            name = name.replace("_preprocess", "")
        save_dict["CAD_ID"] = metas[0]["category"]
    else:
        name = metas[0]["category"] + "_" + metas[0]["file_name"][:-4] + ".pkl"
    os.makedirs(cfg["save_dir"], exist_ok=True)
    with open(pjoin(cfg["save_dir"], name), "wb") as f:
        pickle.dump(save_dict, f)
