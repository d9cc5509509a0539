"""Convert checkpoints between this package's format and the reference's.

Import (reference .pt -> orbax):

    python -m hotrack_tpu.convert --ckpt <model_XXXX.pt> \
        --config handtracknet_test_SimGrasp.yml \
        [--experiment_dir <out>] [--IKNet_dir <out_iknet>] [--epoch N]

Export (trained orbax -> reference .pt, utils/torch_export.py):

    python -m hotrack_tpu.convert --export <out.pt> \
        --config handtracknet_test_SimGrasp.yml \
        --experiment_dir <trained_exp> [--IKNet_dir <trained_ik>] [--epoch N]

The reference stores `{'epoch', 'iteration', 'model', 'optimizer'}` dicts
(trainer.py:253-268) whose model keys may be plain (single-model training
ckpts) or composed with 'handnet.'/'IKnet.' prefixes (tracking graphs,
trainer.py:206-227). This CLI maps every network found in the file through
`utils/torch_convert.load_reference_checkpoint` (conv(1x1)->Dense transpose,
BN stat relocation, IKNet flatten-order permutation, weight-norm folding
handled there) and writes orbax checkpoints that `Trainer.resume` loads —
HandTrackNet into `--experiment_dir`, IKNet into `--IKNet_dir`, matching how
the tracking runners compose the two directories.

Optimizer state is deliberately not converted (torch Adam moments don't map
onto optax pytrees); converted checkpoints resume for *evaluation or
fine-tuning from fresh optimizer state*, which is how the reference's own
strict=False multi-source composition behaves (trainer.py:240-249).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp


def _example_batch(cfg):
    """Shape-only example batch for model init (params are replaced by the
    converted trees; only tree structure matters)."""
    rng = np.random.RandomState(0)
    n = int(cfg.get("num_points", 512))
    pts = rng.randn(1, n, 3).astype(np.float32) * 0.05
    kp = rng.randn(1, 21, 3).astype(np.float32) * 0.05
    return {
        "hand_points": jnp.asarray(pts),
        "jittered_hand_kp": jnp.asarray(kp),
        "gt_hand_kp": jnp.asarray(kp),
        "gt_hand_pose": {"palm_template": jnp.asarray(kp[:, :6])},
    }


def _save_network(cfg, network_type: str, experiment_dir: str,
                  variables: dict, epoch: int):
    from .train.trainer import Trainer
    sub = dict(cfg)
    sub["network"] = dict(cfg["network"])
    sub["network"]["type"] = network_type
    sub["experiment_dir"] = experiment_dir
    trainer = Trainer(sub)
    trainer.init_state(_example_batch(cfg), cfg.get("seed", 0))

    # structural check: the converted tree must match the flax init exactly
    ref = jax.tree_util.tree_structure(
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats})
    got = jax.tree_util.tree_structure(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    assert ref == got, (
        f"{network_type}: converted tree does not match the model built from "
        f"--config (check backbone_out_dim / pointnet cfg / use_attention)")

    trainer.state = trainer.state._replace(
        params=jax.tree.map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
        epoch=jnp.asarray(epoch))
    return trainer.save(epoch)


def _load_network(cfg, network_type: str, experiment_dir: str,
                  epoch: int | None):
    """Resume a trained orbax checkpoint into a template-initialized Trainer
    and return ({'params', 'batch_stats'}, resumed_epoch)."""
    from .train.trainer import Trainer
    sub = dict(cfg)
    sub["network"] = dict(cfg["network"])
    sub["network"]["type"] = network_type
    sub["experiment_dir"] = experiment_dir
    trainer = Trainer(sub)
    trainer.init_state(_example_batch(cfg), cfg.get("seed", 0))
    path = (os.path.join(trainer.ckpt_dir, f"model_{epoch:04d}")
            if epoch is not None else None)
    assert trainer.resume(path), f"no checkpoint under {experiment_dir}"
    return ({"params": jax.tree.map(np.asarray, trainer.state.params),
             "batch_stats": jax.tree.map(np.asarray,
                                         trainer.state.batch_stats)},
            int(trainer.state.epoch))


def main(argv=None):
    from .config import get_config
    from .utils.torch_convert import load_reference_checkpoint

    p = argparse.ArgumentParser("convert")
    p.add_argument("--ckpt", type=str, default=None,
                   help="reference .pt checkpoint (import direction)")
    p.add_argument("--export", type=str, default=None, metavar="OUT_PT",
                   help="reverse direction: read orbax checkpoints from "
                        "--experiment_dir (HandTrackNet) and/or --IKNet_dir "
                        "(IKNet) and write one reference-format .pt "
                        "(handnet./IKnet.-prefixed when both) to this path")
    p.add_argument("--config", type=str, required=True,
                   help="experiment yml describing the target architecture")
    p.add_argument("--experiment_dir", type=str, default=None,
                   help="output dir for the HandTrackNet checkpoint "
                        "(default: <config experiment_dir>_converted)")
    p.add_argument("--IKNet_dir", type=str, default=None,
                   help="output dir for the IKNet checkpoint")
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch number to stamp (default: from the .pt)")
    args, unknown = p.parse_known_args(argv)

    # --key/subkey architecture overrides, same surface as train/test CLIs
    if len(unknown) % 2:
        p.error(f"dangling override flag {unknown[-1]!r}: overrides are "
                "--key/subkey VALUE pairs")
    overrides = {}
    for i in range(0, len(unknown), 2):
        tok, val = unknown[i], unknown[i + 1]
        if not tok.startswith("--"):
            p.error(f"unexpected arg {tok!r}")
        if val.lower() in ("true", "false"):
            val = val.lower() == "true"
        else:
            for cast in (int, float):
                try:
                    val = cast(val)
                    break
                except ValueError:
                    pass
        overrides[tok[2:]] = val

    if (args.ckpt is None) == (args.export is None):
        p.error("exactly one of --ckpt (import) or --export OUT_PT "
                "(export) is required")

    cfg = get_config({"config": args.config, **overrides}, save=False)
    net_cfg = cfg["pointnet"]["camera"]
    d_model = cfg["network"]["backbone_out_dim"]

    from os.path import join as pjoin

    def resolve(name):
        # bare names land under <root>/exps/ like every experiment_dir
        # (config.py resolution); paths with separators are used as-is
        return name if os.sep in name else pjoin(cfg["root_dir"], "exps", name)

    if args.export is not None:
        from .utils.torch_export import save_reference_checkpoint
        if not (args.experiment_dir or args.IKNet_dir):
            p.error("--export needs --experiment_dir and/or --IKNet_dir "
                    "to read trained checkpoints from")
        handnet = iknet = None
        epoch = hand_epoch = ik_epoch = 0
        if args.experiment_dir:
            handnet, hand_epoch = _load_network(cfg, "HandTrackNet",
                                                resolve(args.experiment_dir),
                                                args.epoch)
            epoch = hand_epoch
        if args.IKNet_dir:
            iknet, ik_epoch = _load_network(cfg, "iknet",
                                            resolve(args.IKNet_dir),
                                            args.epoch)
            # the composed .pt carries ONE epoch; stamp the primary
            # (HandTrackNet) epoch and warn if the two nets were trained to
            # different epochs so the reference's resume log isn't read as
            # mislabeling the handnet (ADVICE r4)
            epoch = hand_epoch if handnet is not None else ik_epoch
            if handnet is not None and hand_epoch != ik_epoch:
                print(f"WARNING: HandTrackNet epoch {hand_epoch} != IKNet "
                      f"epoch {ik_epoch}; stamping the composed checkpoint "
                      f"with the HandTrackNet epoch ({hand_epoch})")
        out = save_reference_checkpoint(args.export, handnet=handnet,
                                        iknet=iknet, epoch=epoch)
        print(f"exported -> {out} (epoch {epoch}; loads via the reference "
              "Trainer.resume, strict=False)")
        return [out]

    # single load, weights_only where supported (untrusted .pt files execute
    # arbitrary pickle code under plain torch.load on older torch)
    import torch
    try:
        raw = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    except TypeError:  # torch without the weights_only kwarg
        raw = torch.load(args.ckpt, map_location="cpu")
    epoch = args.epoch
    if epoch is None:
        epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0

    nets = load_reference_checkpoint(raw, net_cfg, d_model)
    assert nets, f"no recognizable network keys in {args.ckpt}"

    written = []
    if "handnet" in nets:
        out = (resolve(args.experiment_dir) if args.experiment_dir
               else cfg["experiment_dir"] + "_converted")
        written.append(_save_network(cfg, "HandTrackNet", out,
                                     nets["handnet"], epoch))
    if "iknet" in nets:
        out = (resolve(args.IKNet_dir) if args.IKNet_dir
               else cfg["experiment_dir"] + "_converted_iknet")
        written.append(_save_network(cfg, "iknet", out, nets["iknet"], epoch))
    for path in written:
        print(f"converted -> {path}")
    print("NOTE: the reference trains with the SVD palm canonicalization "
          "(hand_utils.py:42-66); evaluate converted checkpoints with "
          "--network/procrustes_solver svd (train/eval solver mismatch "
          "measured +15% tracking MPJPE).")
    return written


if __name__ == "__main__":
    main()
