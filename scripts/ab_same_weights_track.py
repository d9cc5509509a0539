"""Same-weights tracking A/B: ONE trained HandTrackNet through BOTH
frameworks' tracking loops on the same held-out sequences.

The round-4 multi-seed campaign showed that at the 20-epoch A/B budget both
frameworks' nets diverge in tracking (BENCHMARKS.md), so end-quality A/Bs
there compare random walks. This protocol removes training from the
comparison entirely: train ONE net (ours, on TPU, at a contraction-regime
budget), export it to the reference's checkpoint format
(utils/torch_export.py, <0.1 mm forward parity inside the reference model),
and run the SAME weights through

  - ours:      track/hand.py lax.scan driver via the production test CLI
  - reference: HandTrackModel last-frame-kp loop
               (/root/reference/network/models/track_network.py:159-226)

Any difference is eval machinery (tracking driver, cloud sampling, palm
canonicalization), not net quality. Because the reference loop canonicalizes
with its exact-SVD palm Procrustes while our deployment default is Horn, the
jax leg runs BOTH solvers (--solver both): jax-svd vs torch is the
apples-to-apples driver comparison; jax-horn is our native operating point
(solver must match training — BENCHMARKS.md measured +15% for a mismatch,
so a Horn-trained net gives the torch leg a structural handicap we simply
report).

Usage:
  python scripts/ab_same_weights_track.py [--root /tmp/ab_full]
      [--exp ab_full_jax300] [--epoch -1] [--num_points 512]
      [--solver both|horn|svd] [--no_torch_fps]
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
jax.config.update("jax_platforms", os.environ.get("AB_PLATFORM", "cpu"))
import numpy as np


def latest_epoch(ckpt_dir: str) -> int:
    names = [d for d in os.listdir(ckpt_dir)
             if d.startswith("model_") and "tmp" not in d]
    assert names, f"no checkpoints under {ckpt_dir}"
    return max(int(n.split("_")[1]) for n in names)


def load_jax_ckpt(root: str, exp: str, epoch: int):
    """Restore (params, batch_stats, net_cfg, network_cfg) from the
    experiment's orbax checkpoint via a template init (Trainer.resume
    semantics, train/trainer.py:364-383)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import yaml

    from hotrack_tpu.models import HandTrackNet

    exp_dir = os.path.join(root, "exps", exp)
    with open(os.path.join(exp_dir, "config.yml")) as f:
        cfg = yaml.safe_load(f)
    net_cfg = cfg["pointnet"]["camera"]
    model = HandTrackNet(net_cfg=net_cfg,
                         backbone_out_dim=cfg["network"]["backbone_out_dim"],
                         handframe=cfg["network"]["handframe"])
    rng = np.random.RandomState(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(1, 64, 3), jnp.float32) * 0.05,
        jnp.asarray(rng.randn(1, 21, 3), jnp.float32) * 0.04,
        jnp.asarray(rng.randn(1, 6, 3), jnp.float32) * 0.04)
    if epoch <= 0:
        epoch = latest_epoch(os.path.join(exp_dir, "ckpt"))
    tmpl = {"params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "epoch": np.asarray(0)}
    tree = ocp.StandardCheckpointer().restore(
        os.path.join(exp_dir, "ckpt", f"model_{epoch:04d}"), tmpl)
    params = jax.tree.map(np.asarray, tree["params"])
    stats = jax.tree.map(np.asarray, tree["batch_stats"])
    print(f"[load] {exp} epoch {epoch}", flush=True)
    return params, stats, cfg, epoch


def jax_track(args, solver: str, epoch: int) -> float:
    """Our production tracking eval (test CLI -> track/hand.py scan).

    resume_epoch pins the exact checkpoint — without it both legs silently
    evaluate whatever is LATEST in their experiment dirs (this bit: an
    --epoch 250 run against a 300-epoch experiment re-measured e300)."""
    from hotrack_tpu.train.cli import test_main

    sys.argv = ["test", "--config", "handtracknet_test_SimGrasp.yml",
                "--num_points", str(args.num_points),
                "--experiment_dir", args.exp,
                "--resume_epoch", str(epoch),
                "--network/procrustes_solver", solver]
    avg, _fps = test_main()
    return float(avg["hand_pred_kp_diff"])


def torch_track(args, epoch: int) -> float:
    """The reference's own tracking loop on the exported checkpoint."""
    import torch

    from hotrack_tpu.config import get_config
    from reference_loader import pushd, reference_module, write_fake_mano_pkl

    from ab_framework_quality import _patch_torch_fps

    ref_trainer_mod = reference_module("trainer")
    ref_dataset_mod = reference_module("dataset")

    if not args.no_torch_fps:
        # the net was FPS-trained; put the reference dataset on faithful
        # start-0 numpy FPS instead of its CPU random-subset fallback
        _patch_torch_fps()

    mano_dir = os.path.join(args.root, "mano")
    write_fake_mano_pkl(mano_dir, seed=0)

    exp_dir = os.path.join(args.root, "exps", f"{args.exp}_torchdrv")
    tcfg = dict(get_config({"config": "handtracknet_test_SimGrasp.yml",
                            "num_points": args.num_points}, save=False))
    tcfg.update(device="cpu", num_workers=0, use_optimization=False,
                sdf_code_source="gt", mano_root=mano_dir,
                experiment_dir=exp_dir,
                resume_epoch=epoch,  # pin the exported ckpt, not the latest
                save_dir=os.path.join(exp_dir, "results"))

    scratch = tempfile.mkdtemp(prefix="ab_swt_")
    write_fake_mano_pkl(os.path.join(scratch, "third_party", "mano",
                                     "models"))

    torch.manual_seed(0)
    np.random.seed(0)
    dl = ref_dataset_mod.get_dataloader(tcfg, "test", shuffle=False)
    with pushd(scratch):
        trainer = ref_trainer_mod.Trainer(tcfg, None, len(dl))
        trainer.resume(len(dl))
        kp, n_seq = 0.0, 0
        for data in dl:
            ld, _ = trainer.test(data)
            # ld values are per-frame means (track_network.py:301-307)
            kp += float(ld["hand_pred_kp_diff"])
            n_seq += 1
            print(f"[torch-track] seq {n_seq - 1}: kp_diff "
                  f"{float(ld['hand_pred_kp_diff']):.6f} m", flush=True)
    return kp / max(n_seq, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ab_full")
    ap.add_argument("--exp", default="ab_full_jax300")
    ap.add_argument("--epoch", type=int, default=-1,
                    help="checkpoint epoch (-1 = latest)")
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--solver", choices=["both", "horn", "svd"],
                    default="both")
    ap.add_argument("--no_torch_fps", action="store_true",
                    help="leave the reference dataset on its CPU "
                         "random-subset sampling")
    ap.add_argument("--skip_jax", action="store_true")
    ap.add_argument("--skip_torch", action="store_true")
    args = ap.parse_args()
    os.environ["HOTRACK_DATA_ROOT"] = args.root

    from hotrack_tpu.utils.torch_export import save_reference_checkpoint

    params, stats, _cfg, epoch = load_jax_ckpt(args.root, args.exp,
                                               args.epoch)
    results = {"epoch": epoch}

    if not args.skip_torch:
        ckpt_dir = os.path.join(args.root, "exps", f"{args.exp}_torchdrv",
                                "ckpt")
        os.makedirs(ckpt_dir, exist_ok=True)
        pt = save_reference_checkpoint(
            os.path.join(ckpt_dir, f"model_{epoch:04d}.pt"),
            handnet={"params": params, "batch_stats": stats}, epoch=epoch)
        print(f"[export] {pt}", flush=True)
        results["torch_track_m"] = torch_track(args, epoch)
        print(f"[torch] TRACKING kp_diff {results['torch_track_m']:.6f} m",
              flush=True)

    if not args.skip_jax:
        solvers = {"both": ["horn", "svd"]}.get(args.solver, [args.solver])
        for s in solvers:
            results[f"jax_track_m_{s}"] = jax_track(args, s, epoch)
            print(f"[jax/{s}] TRACKING kp_diff "
                  f"{results[f'jax_track_m_{s}']:.6f} m", flush=True)

    if "torch_track_m" in results and "jax_track_m_svd" in results:
        print(f"\nsame-weights tracking A/B (epoch {epoch}): "
              f"torch {results['torch_track_m']*100:.3f} cm   "
              f"jax(svd) {results['jax_track_m_svd']*100:.3f} cm   (ratio "
              f"{results['jax_track_m_svd']/results['torch_track_m']:.3f})")

    path = os.path.join(args.root, "same_weights_track.json")
    old = {}
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    old[f"{args.exp}_e{epoch}"] = {**old.get(f"{args.exp}_e{epoch}", {}),
                                   **results}
    with open(path, "w") as f:
        json.dump(old, f, indent=1)
    print(f"[results] -> {path}", flush=True)


if __name__ == "__main__":
    main()
