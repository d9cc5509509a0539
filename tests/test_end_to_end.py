"""End-to-end harness tests on the synthetic dataset: training reduces loss;
single-frame eval runs; both tracking drivers produce sane trajectories."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hotrack_tpu.config import get_config
from hotrack_tpu.data import get_dataloader, prepare_batch
from hotrack_tpu.data.synthetic import generate_simgrasp_dataset
from hotrack_tpu.mano import synthetic_mano_model
from hotrack_tpu.opt import presample_particles
from hotrack_tpu.sdf.assets import synthetic_box_sdf_setup
from hotrack_tpu.track import track_hand_sequence, track_obj_sequence
from hotrack_tpu.track.eval import eval_hand_sequence, eval_obj_sequence
from hotrack_tpu.train import Trainer

SMALL_NET = {"pointnet_cfg": {"camera": "pointnet2_camera_shallow1.yml"}}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_root")
    mano = synthetic_mano_model()
    generate_simgrasp_dataset(str(root), num_instances=2, num_frames=8,
                              points_per_part=400, mano_model=mano)
    os.environ["HOTRACK_DATA_ROOT"] = str(root)
    return root, mano


def _small_cfg(extra=None):
    args = {"config": "handtracknet_train_SimGrasp.yml",
            "num_points": 64, "batch_size": 4,
            "network/backbone_out_dim": 48}
    args.update(extra or {})
    cfg = get_config(args, save=False)
    # shrink the backbone for test compile times
    cfg["pointnet"]["camera"] = {
        "sa1": {"npoint": 32, "radius_list": [0.1], "nsample_list": [8],
                "mlp_list": [[16, 16, 32]]},
        "sa2": {"npoint": 16, "radius_list": [0.2], "nsample_list": [8],
                "mlp_list": [[32, 32, 64]]},
        "sa3": {"mlp": [64, 64, 128]},
        "fp3": {"mlp": [64, 64]},
        "fp2": {"mlp": [64, 64]},
        "fp1": {"mlp": [64, 64]},
    }
    return cfg


@pytest.mark.slow
def test_training_reduces_loss(env):
    _, mano = env
    cfg = _small_cfg()
    loader = get_dataloader(cfg, "train")
    trainer = Trainer(cfg)
    trainer.mano = mano

    key = jax.random.PRNGKey(0)
    batches = []
    for raw, _ in loader:
        key, k = jax.random.split(key)
        batches.append(prepare_batch(mano, jax.tree.map(jnp.asarray, raw), k,
                                     cfg["num_points"], hand_jitter_scale=0.02))
    trainer.init_state(batches[0])

    losses = []
    for step in range(14):
        key, k = jax.random.split(key)
        loss = trainer.update(batches[step % len(batches)], k)
        losses.append(float(loss["hand_pred_kp_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses

    eval_loss = trainer.test(batches[0])
    assert np.isfinite(float(eval_loss["hand_pred_kp_diff"]))

    # checkpoint roundtrip
    path = trainer.save(0)
    before = jax.tree_util.tree_leaves(trainer.state.params)[0]
    trainer.resume(path)
    after = jax.tree_util.tree_leaves(trainer.state.params)[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


@pytest.mark.slow
def test_hand_tracking_driver(env):
    _, mano = env
    cfg = _small_cfg({"track": "hand", "batch_size": 1,
                      "hand_jitter_cfg/rand_scale": 0.01})
    loader = get_dataloader(cfg, "test")
    raw, metas = loader[0]
    key = jax.random.PRNGKey(1)
    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, raw), key,
                          cfg["num_points"], hand_jitter_scale=0.01)

    trainer = Trainer(cfg)
    trainer.mano = mano
    trainer.init_state(jax.tree.map(lambda a: a[:1], batch))

    result = track_hand_sequence(trainer.model, trainer.variables, mano, batch)
    assert result.pred_kp.shape == (8, 21, 3)
    metrics = eval_hand_sequence(result, batch["gt_hand_kp"],
                                 batch["gt_hand_pose"]["palm_template"][0])
    assert np.isfinite(float(metrics["mean/hand_pred_kp_diff"]))
    # untrained net: random per-frame deltas (scaled by the 0.2 hand frame)
    # compound across the sequence — just require boundedness; quality is
    # covered by the training test + the rigid-equivariance test
    assert float(metrics["mean/hand_pred_kp_diff"]) < 10.0


@pytest.mark.slow
def test_obj_tracking_driver(env):
    _, mano = env
    cfg = _small_cfg({"track": "obj_opt", "batch_size": 1, "num_points": 128,
                      "obj_jitter_cfg/r": 5, "obj_jitter_cfg/t": 0.02})
    loader = get_dataloader(cfg, "test")
    raw, metas = loader[0]
    key = jax.random.PRNGKey(2)
    batch = prepare_batch(
        mano, jax.tree.map(jnp.asarray, raw), key, cfg["num_points"],
        obj_jitter={"rotation": float(np.deg2rad(5)), "translation": 0.02,
                    "scale": 0.0})

    volume = synthetic_box_sdf_setup(101, 0.004)
    particles = presample_particles(jax.random.PRNGKey(3), 512, 6)
    result = track_obj_sequence(
        volume, particles, batch["obj_points"],
        batch["jittered_obj_pose"]["rotation"][0],
        batch["jittered_obj_pose"]["translation"][0],
        voxel_scale=0.004, bbox_res=101)
    assert result.rotation.shape == (8, 3, 3)

    metrics = eval_obj_sequence(result, batch["gt_obj_pose"]["rotation"],
                                batch["gt_obj_pose"]["translation"],
                                sym_axis=1)
    # tracked pose should beat the jittered init on average
    init_t_err = float(jnp.linalg.norm(
        batch["jittered_obj_pose"]["translation"][0]
        - batch["gt_obj_pose"]["translation"][0]))
    assert float(metrics["mean/tdiff_0"]) < max(init_t_err, 0.02) * 1.5
    assert np.isfinite(float(metrics["mean/rdiff_0"]))


@pytest.mark.slow
def test_hand_tracking_shape_modes(env):
    """IKNet tracking with shape modes 1/2/3 runs and returns finite betas."""
    from hotrack_tpu.models import IKNet
    from hotrack_tpu.opt import presample_particles

    _, mano = env
    cfg = _small_cfg({"track": "hand_IKNet", "batch_size": 1})
    loader = get_dataloader(cfg, "test")
    raw, _ = loader[0]
    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, raw),
                          jax.random.PRNGKey(3), cfg["num_points"],
                          hand_jitter_scale=0.01)

    trainer = Trainer(cfg)
    trainer.mano = mano
    trainer.init_state(jax.tree.map(lambda a: a[:1], batch))
    iknet = IKNet()
    ik_vars = iknet.init(jax.random.PRNGKey(4), batch["jittered_hand_kp"][:1],
                         batch["gt_hand_pose"]["palm_template"][:1])
    particles = presample_particles(jax.random.PRNGKey(5), 256, 10)

    for mode in (1, 2, 3):
        result = track_hand_sequence(
            trainer.model, trainer.variables, mano, batch,
            iknet=iknet, ik_variables=ik_vars,
            shape_mode=mode, shape_particles=particles)
        assert result.pred_kp.shape == (8, 21, 3)
        assert np.isfinite(np.asarray(result.pred_beta)).all(), mode


@pytest.mark.slow
def test_tracking_determinism(env):
    """The jitted tracking loop is deterministic: identical inputs give
    identical trajectories (SURVEY §4: determinism tests for the tracker)."""
    _, mano = env
    cfg = _small_cfg({"track": "hand", "batch_size": 1})
    loader = get_dataloader(cfg, "test")
    raw, _ = loader[0]
    batch = prepare_batch(mano, jax.tree.map(jnp.asarray, raw),
                          jax.random.PRNGKey(9), cfg["num_points"],
                          hand_jitter_scale=0.01)
    trainer = Trainer(cfg)
    trainer.mano = mano
    trainer.init_state(jax.tree.map(lambda a: a[:1], batch))

    r1 = track_hand_sequence(trainer.model, trainer.variables, mano, batch)
    r2 = track_hand_sequence(trainer.model, trainer.variables, mano, batch)
    np.testing.assert_array_equal(np.asarray(r1.pred_kp),
                                  np.asarray(r2.pred_kp))


def test_obj_tracking_batched_distilled(env):
    """Batched multi-sequence object tracking with per-sequence distilled
    SDFs: results match per-sequence tracking (XLA fallback on CPU; on TPU
    the same call lands in the batched Pallas kernel)."""
    from hotrack_tpu.sdf.distill import distill_sdf_volume
    from hotrack_tpu.track.obj import track_obj_sequences_batched

    _, mano = env
    cfg = _small_cfg({"track": "obj_opt", "batch_size": 1, "num_points": 128,
                      "obj_jitter_cfg/r": 5, "obj_jitter_cfg/t": 0.02})
    loader = get_dataloader(cfg, "test")
    raw, _ = loader[0]
    key = jax.random.PRNGKey(2)
    batch = prepare_batch(
        mano, jax.tree.map(jnp.asarray, raw), key, cfg["num_points"],
        obj_jitter={"rotation": float(np.deg2rad(5)), "translation": 0.02,
                    "scale": 0.0})

    volume = synthetic_box_sdf_setup(65, 0.006)
    particles = presample_particles(jax.random.PRNGKey(3), 256, 6)
    model = distill_sdf_volume(volume, 0.006, jax.random.PRNGKey(4),
                               steps=300, batch=1024)
    pts = batch["obj_points"][:4]
    r0 = batch["jittered_obj_pose"]["rotation"][0]
    t0 = batch["jittered_obj_pose"]["translation"][0]

    # two "sequences": the same frames and a reversed copy
    volumes = jnp.stack([volume, volume])
    pts_b = jnp.stack([pts, pts[::-1]])
    r_b = jnp.stack([r0, r0])
    t_b = jnp.stack([t0, t0])
    models = jax.tree.map(lambda a: jnp.stack([a, a]), model)

    batched = track_obj_sequences_batched(
        volumes, particles, pts_b, r_b, t_b, voxel_scale=0.006, bbox_res=65,
        distilled=models)
    single = track_obj_sequence(volume, particles, pts, r0, t0,
                                voxel_scale=0.006, bbox_res=65,
                                distilled=model)
    assert batched.rotation.shape == (2, 4, 3, 3)
    np.testing.assert_allclose(np.asarray(batched.rotation[0]),
                               np.asarray(single.rotation), atol=1e-4)
    np.testing.assert_allclose(np.asarray(batched.translation[0]),
                               np.asarray(single.translation), atol=1e-5)


def test_sharded_multi_sequence_tracking(env):
    """Sequence-axis sharding over the 8-device virtual mesh: sharded
    results match the single-device vmap for both trackers (the multi-chip
    eval path — SURVEY §2.3)."""
    from hotrack_tpu.track.hand import track_hand_sequences_sharded
    from hotrack_tpu.track.obj import (track_obj_sequences_batched,
                                       track_obj_sequences_sharded)

    _, mano = env
    assert jax.device_count() >= 8

    # --- hand: 8 sequences (2 real, replicated) over 8 devices ---
    cfg = _small_cfg({"track": "hand", "batch_size": 1,
                      "hand_jitter_cfg/rand_scale": 0.01})
    loader = get_dataloader(cfg, "test")
    key = jax.random.PRNGKey(5)
    batches = []
    for i in range(8):
        raw, _ = loader[i % len(loader)]
        key, k = jax.random.split(key)
        batches.append(prepare_batch(mano, jax.tree.map(jnp.asarray, raw), k,
                                     cfg["num_points"],
                                     hand_jitter_scale=0.01))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    trainer = Trainer(cfg)
    trainer.mano = mano
    trainer.init_state(jax.tree.map(lambda a: a[:1], batches[0]))

    sharded = track_hand_sequences_sharded(
        trainer.model, trainer.variables, mano, stacked)
    plain = jax.vmap(lambda b: track_hand_sequence(
        trainer.model, trainer.variables, mano, b))(stacked)
    assert sharded.pred_kp.shape == (8, 8, 21, 3)
    # partitioned compilation fp-reorders per-frame math; with an untrained
    # net the frame-to-frame feedback amplifies that chaotically (same class
    # as the documented vmap fp-chaos), so compare the feedback-free frame 0
    # tightly and require the rest to stay finite and bounded
    np.testing.assert_allclose(np.asarray(sharded.pred_kp[:, 0]),
                               np.asarray(plain.pred_kp[:, 0]), atol=1e-4)
    assert np.isfinite(np.asarray(sharded.pred_kp)).all()
    assert float(jnp.max(jnp.abs(sharded.pred_kp))) < 100.0

    # --- object: 8 sequences over 8 devices ---
    volume = synthetic_box_sdf_setup(65, 0.006)
    particles = presample_particles(jax.random.PRNGKey(6), 256, 6)
    cfg_o = _small_cfg({"track": "obj_opt", "batch_size": 1,
                        "num_points": 128})
    loader_o = get_dataloader(cfg_o, "test")
    raws = [loader_o[i % len(loader_o)][0] for i in range(8)]
    key, k = jax.random.split(key)
    obj_batches = [prepare_batch(
        mano, jax.tree.map(jnp.asarray, r), k, cfg_o["num_points"],
        obj_jitter={"rotation": 0.05, "translation": 0.01, "scale": 0.0})
        for r in raws]
    pts = jnp.stack([b["obj_points"][:4] for b in obj_batches])
    r0 = jnp.stack([b["jittered_obj_pose"]["rotation"][0]
                    for b in obj_batches])
    t0 = jnp.stack([b["jittered_obj_pose"]["translation"][0]
                    for b in obj_batches])
    vols = jnp.broadcast_to(volume, (8,) + volume.shape)

    sharded_o = track_obj_sequences_sharded(
        vols, particles, pts, r0, t0, voxel_scale=0.006, bbox_res=65)
    plain_o = track_obj_sequences_batched(
        vols, particles, pts, r0, t0, voxel_scale=0.006, bbox_res=65)
    np.testing.assert_allclose(np.asarray(sharded_o.rotation[:, 0]),
                               np.asarray(plain_o.rotation[:, 0]), atol=1e-3)
    assert np.isfinite(np.asarray(sharded_o.rotation)).all()


def test_vmapped_opt_tracking_with_per_sequence_assets(env):
    """IKNet+pose-opt tracking under vmap with per-sequence SDF volumes,
    distilled models, and masks (the batched full-pipeline path): frame-0
    parity with per-sequence execution, finite trajectories."""
    from hotrack_tpu.models import IKNet
    from hotrack_tpu.opt import load_contact_zones
    from hotrack_tpu.sdf.distill import distill_sdf_volume

    _, mano = env
    cfg = _small_cfg({"track": "hand_IKNet", "batch_size": 1,
                      "hand_jitter_cfg/rand_scale": 0.01})
    loader = get_dataloader(cfg, "test")
    key = jax.random.PRNGKey(9)
    batches = []
    for i in range(2):
        raw, _ = loader[i % len(loader)]
        key, k = jax.random.split(key)
        b = prepare_batch(mano, jax.tree.map(jnp.asarray, raw), k,
                          cfg["num_points"], hand_jitter_scale=0.01)
        batches.append(jax.tree.map(lambda a: a[:3], b))  # 3 frames
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    trainer = Trainer(cfg)
    trainer.mano = mano
    trainer.init_state(jax.tree.map(lambda a: a[:1], batches[0]))
    iknet = IKNet()
    ik_vars = iknet.init(jax.random.PRNGKey(10),
                         batches[0]["jittered_hand_kp"][:1],
                         batches[0]["gt_hand_pose"]["palm_template"][:1])

    vol = synthetic_box_sdf_setup(65, 0.006)
    vols = jnp.stack([vol, vol])
    model = distill_sdf_volume(vol, 0.006, jax.random.PRNGKey(11),
                               steps=200, batch=1024)
    models = jax.tree.map(lambda a: jnp.stack([a, a]), model)
    masks = jnp.zeros((2, 3, 8, 8), bool)
    zones = load_contact_zones(None)
    key, kp_ = jax.random.split(key)
    pose_particles = presample_particles(kp_, 64, 16)
    key, ks_ = jax.random.split(key)
    shape_particles = presample_particles(ks_, 64, 10)
    ew = {k: 1.0 for k in ("sil_loss", "penetrate_sum_loss", "vis_regu_loss",
                           "invis_regu_loss", "temporal_smooth",
                           "attraction_loss")}

    def run_one(b, vol, mask, dist):
        return track_hand_sequence(
            trainer.model, trainer.variables, mano, b,
            iknet=iknet, ik_variables=ik_vars, use_opt=True, shape_mode=1,
            shape_particles=shape_particles, pose_particles=pose_particles,
            zones=zones, sdf_volume=vol, background_masks=mask,
            energy_weight=ew, sdf_voxel_scale=0.006, distilled=dist)

    batched = jax.vmap(run_one)(stacked, vols, masks, models)
    single = run_one(jax.tree.map(lambda a: a[0], stacked), vol, masks[0],
                     model)
    assert batched.pred_kp.shape == (2, 3, 21, 3)
    assert np.isfinite(np.asarray(batched.pred_kp)).all()
    np.testing.assert_allclose(np.asarray(batched.pred_kp[0, 0]),
                               np.asarray(single.pred_kp[0]), atol=5e-3)
