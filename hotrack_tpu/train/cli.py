"""Command-line harness: training and evaluation entry points.

Surface parity with the reference CLIs (README.md:100-114):

    python -m hotrack_tpu.train --config handtracknet_train_SimGrasp.yml
    python -m hotrack_tpu.test  --config handtracknet_test_SimGrasp.yml [--save]

plus arbitrary nested overrides `--key/subkey value` (parse_args.py:30-33).
The epoch loop mirrors network/train.py:61-88 (train + per-epoch test, loss
accumulation, periodic checkpoints); the test loop mirrors network/test.py:
34-98 including the data-proc vs. network FPS split — the headline metric.
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle
import time
from os.path import join as pjoin

import numpy as np
import jax
import jax.numpy as jnp

from ..config import get_config
from ..data import get_dataloader, prepare_batch
from ..utils.dicts import add_dict, cvt_numpy, divide_dict, log_loss_summary
from .trainer import Trainer


def build_arg_parser(name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(name)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--save", action="store_true", default=None,
                   help="dump per-sequence trajectory pickles")
    p.add_argument("--debug", action="store_true", default=None,
                   help="render per-frame hand figures (parse_args.py:11)")
    p.add_argument("--debug_save", action="store_true", default=None,
                   help="save per-frame hand figures under "
                        "<experiment_dir>/debug (parse_args.py:12)")
    p.add_argument("--epochs", type=int, default=None,
                   help="override total_epoch")
    p.add_argument("--profile", type=str, default=None,
                   help="capture a jax.profiler trace into this directory")
    return p


def parse_with_overrides(parser: argparse.ArgumentParser):
    """Known args + arbitrary --key/subkey value overrides."""
    args, unknown = parser.parse_known_args()
    extra = {}
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        assert tok.startswith("--"), f"unexpected arg {tok}"
        val = unknown[i + 1]
        try:
            val = int(val)
        except ValueError:
            try:
                val = float(val)
            except ValueError:
                pass
        extra[tok[2:]] = val
        i += 2
    d = vars(args)
    epochs = d.pop("epochs", None)
    if epochs is not None:
        extra["total_epoch"] = epochs
    d.update(extra)
    return d


def setup_compilation_cache():
    """Persistent XLA compile cache: first axon compile is minutes, cached
    re-runs are ~1s (measured on TPU v5e via the tunnel).

    The directory is scoped by a host-CPU fingerprint: serialized
    CPU-target executables embed the compile machine's feature set and
    XLA's AOT loader only warns on mismatch — a stale cross-machine cache
    SEGFAULTED the round-5 test suite (utils/cache_fingerprint.py)."""
    from ..utils.cache_fingerprint import machine_fingerprint
    cache = os.environ.get("HOTRACK_JAX_CACHE",
                           pjoin(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    cache = os.path.abspath(cache) + "-" + machine_fingerprint()
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _jitter_cfg(cfg):
    hj = cfg["hand_jitter_cfg"]
    oj = cfg["obj_jitter_cfg"]
    obj = {"rotation": float(np.deg2rad(oj["r"])), "translation": oj["t"],
           "scale": oj["s"]}
    return hj["rand_scale"], hj["rand_type"], obj, oj["type"]


def prepare(trainer: Trainer, raw, key, cfg):
    scale, kind, obj, obj_kind = _jitter_cfg(cfg)
    return prepare_batch(trainer.mano, jax.tree.map(jnp.asarray, raw), key,
                         cfg["num_points"], hand_jitter_scale=scale,
                         jitter_kind=kind, obj_jitter=obj,
                         obj_jitter_kind=obj_kind,
                         include_obb=cfg["network"].get("handframe") == "OBB",
                         sample_kind=cfg.get("point_sample", "fps"))


def train_main(argv=None):
    setup_compilation_cache()
    args = parse_with_overrides(build_arg_parser("train"))
    cfg = get_config(args, save=True)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("train")

    train_loader = get_dataloader(cfg, "train")
    test_loader = get_dataloader(cfg, "test", shuffle=False)
    # iterations per epoch, consumed by the CyclicLR step size
    # (reference trainer.py:54, dataset_len argument)
    cfg["dataset_len"] = len(train_loader)
    trainer = Trainer(cfg)

    # init from one example batch
    raw0, _ = next(iter(train_loader))
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    key, k0 = jax.random.split(key)
    batch0 = prepare(trainer, raw0, k0, cfg)
    trainer.init_state(batch0, cfg.get("seed", 0))
    trainer.resume()

    writer = _tb_writer(cfg)
    start = int(trainer.state.epoch)
    for epoch in range(start, cfg["total_epoch"]):
        t0 = time.time()
        total, cnt = {}, 0
        for raw, _ in train_loader:
            key, k1, k2 = jax.random.split(key, 3)
            batch = prepare(trainer, raw, k1, cfg)
            loss = trainer.update(batch, k2)
            add_dict(total, cvt_numpy(loss))
            cnt += 1
        log.info("epoch %d train (%d it, %.1fs): %s", epoch, cnt,
                 time.time() - t0,
                 {k: round(v / max(cnt, 1), 5) for k, v in total.items()})
        log_loss_summary(total, cnt,
                         lambda k, v: _tb_add(writer, f"train/{k}", v, epoch))

        total, cnt = {}, 0
        for raw, _ in test_loader:
            key, k1 = jax.random.split(key)
            batch = prepare(trainer, raw, k1, cfg)
            loss = trainer.test(batch)
            add_dict(total, cvt_numpy(loss))
            cnt += 1
        log.info("epoch %d test: %s", epoch,
                 {k: round(v / max(cnt, 1), 5) for k, v in total.items()})
        log_loss_summary(total, cnt,
                         lambda k, v: _tb_add(writer, f"test/{k}", v, epoch))

        trainer.step_epoch()
        if (epoch + 1) % cfg["freq"]["save"] == 0 or epoch + 1 == cfg["total_epoch"]:
            trainer.save()
    return trainer


def _tb_writer(cfg):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(pjoin(cfg["experiment_dir"], "log"))
    except Exception:
        return None


def _tb_add(writer, key, value, step):
    if writer is not None:
        writer.add_scalar(key, value, step)


def test_main(argv=None):
    setup_compilation_cache()
    args = parse_with_overrides(build_arg_parser("test"))
    cfg = get_config(args, save=False)
    save_flag = bool(cfg.pop("save", False))
    profile_dir = cfg.pop("profile", None)

    if profile_dir:
        # jax profiler trace of the whole eval (SURVEY §5.1: the reference
        # has wall-clock timers only; this adds device-level tracing)
        jax.profiler.start_trace(profile_dir)
    try:
        track = cfg.get("track")
        if not track:
            return _test_single_frame(cfg)
        if track == "obj_opt":
            from .run_obj_track import run_obj_tracking
            return run_obj_tracking(cfg, save_flag)
        from .run_hand_track import run_hand_tracking
        return run_hand_tracking(cfg, save_flag)
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {profile_dir}")


def _test_single_frame(cfg):
    loader = get_dataloader(cfg, "test", shuffle=False)
    trainer = Trainer(cfg)
    raw0, _ = next(iter(loader))
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    key, k0 = jax.random.split(key)
    trainer.init_state(prepare(trainer, raw0, k0, cfg))
    trainer.resume()

    total, cnt, n_batches = {}, 0, 0
    data_time, net_time = 0.0, 0.0
    t0 = time.time()
    for raw, _ in loader:
        key, k1 = jax.random.split(key)
        batch = prepare(trainer, raw, k1, cfg)
        jax.block_until_ready(batch)
        t1 = time.time()
        loss = trainer.test(batch)
        # force materialization: the remote-TPU tunnel's block_until_ready is
        # unreliable for timing, a host fetch is not
        loss = cvt_numpy(loss)
        t2 = time.time()
        data_time += t1 - t0
        net_time += t2 - t1
        add_dict(total, loss)
        cnt += batch["hand_points"].shape[0]
        n_batches += 1
        t0 = time.time()
    avg = divide_dict(total, max(n_batches, 1))
    fps_all = cnt / max(data_time + net_time, 1e-9)
    fps_net = cnt / max(net_time, 1e-9)
    print(f"frames {cnt}  FPS(all) {fps_all:.1f}  FPS(network) {fps_net:.1f}")
    print({k: round(v, 5) for k, v in avg.items()})
    return avg, {"fps_all": fps_all, "fps_network": fps_net}
