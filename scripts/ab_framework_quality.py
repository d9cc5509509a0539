"""Framework-vs-framework quality baseline on identical synthetic data.

Trains the reference's OWN torch HandTrackNet (via tests/reference_loader,
CPU fallbacks, reference train loop semantics train.py:61-88) and this
package's TPU/JAX trainer at an EQUAL reduced budget on the SAME synthetic
SimGrasp set + splits, then evaluates both on the held-out split with each
framework's own eval step. Metric: mean hand_pred_kp_diff (the reference's
L2 keypoint error, meters — hand_network.py:188) plus the weighted total
loss. Randomness (jitter draws, shuffling, init) is each framework's native
pipeline; the comparison is END QUALITY at equal data/epochs/hparams, not a
bitwise trajectory (that is test_train_step_parity's job).

Usage: python scripts/ab_framework_quality.py [--epochs 20] [--instances 8]
           [--frames 50] [--num_points 512] [--batch 32]
Writes results to stdout; record them in BENCHMARKS.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
jax.config.update("jax_platforms", os.environ.get("AB_PLATFORM", "cpu"))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--instances", type=int, default=8)  # train_val_split 6/2
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--root", type=str, default="/tmp/ab_quality")
    ap.add_argument("--skip_torch", action="store_true")
    ap.add_argument("--skip_jax", action="store_true")
    args = ap.parse_args()

    import torch
    from reference_loader import (reference_module, write_fake_mano_pkl)
    from hotrack_tpu.mano.model import synthetic_mano_model

    from hotrack_tpu.data.synthetic import generate_simgrasp_dataset

    os.environ["HOTRACK_DATA_ROOT"] = args.root
    mano = synthetic_mano_model()
    if not os.path.exists(os.path.join(args.root, "SimGrasp")):
        generate_simgrasp_dataset(args.root, num_instances=args.instances,
                                  num_frames=args.frames, mano_model=mano)
        print("synthetic set written to", args.root, flush=True)
    mano_dir = os.path.join(args.root, "mano")
    write_fake_mano_pkl(mano_dir, seed=0)

    # shared hyperparameters from the shipped config
    from hotrack_tpu.config import get_config
    # the synthetic generator writes splits/<cat>/seq/{train,test}.txt
    # itself (last instance = test); both loaders prefer existing splits
    cfg = get_config({"config": "handtracknet_train_SimGrasp.yml",
                      "num_points": args.num_points,
                      "batch_size": args.batch,
                      "total_epoch": args.epochs,
                      "experiment_dir": "ab_quality_jax"},
                     save=False)

    results = {}

    # ----------------------------------------------------------- torch side
    if not args.skip_torch:
        t0 = time.time()
        ref_trainer_mod = reference_module("trainer")
        ref_dataset_mod = reference_module("dataset")

        tcfg = dict(cfg)
        tcfg["device"] = "cpu"
        tcfg["mano_root"] = mano_dir
        tcfg["num_workers"] = 0
        tcfg["experiment_dir"] = os.path.join(args.root, "exps", "ab_torch")
        os.makedirs(tcfg["experiment_dir"], exist_ok=True)

        train_dl = ref_dataset_mod.get_dataloader(tcfg, "train")
        test_dl = ref_dataset_mod.get_dataloader(tcfg, "test", shuffle=False)
        torch.manual_seed(0)
        trainer = ref_trainer_mod.Trainer(tcfg, None, len(train_dl))
        for epoch in range(args.epochs):
            trainer.step_epoch()
            ep_loss, n = 0.0, 0
            for data in train_dl:
                ld = trainer.update(data)
                ep_loss += float(ld["total_loss"]); n += 1
            print(f"[torch] epoch {epoch}: train total_loss "
                  f"{ep_loss / max(n, 1):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
        # eval (reference test() returns the raw loss dict, no summarize —
        # trainer.py:304-317; weight it like its update does)
        lw = tcfg["network"]["loss_weight"]
        kp_diff, tot, n = 0.0, 0.0, 0
        for data in test_dl:
            ld, _ = trainer.test(data)
            kp_diff += float(ld["hand_pred_kp_diff"])
            tot += sum(w * float(ld[k]) for k, w in lw.items()); n += 1
        results["torch"] = {"kp_diff_m": kp_diff / n, "total_loss": tot / n,
                            "train_s": time.time() - t0}
        print(f"[torch] TEST hand_pred_kp_diff {results['torch']['kp_diff_m']:.6f} m, "
              f"total_loss {results['torch']['total_loss']:.4f}, "
              f"wall {results['torch']['train_s']:.0f}s", flush=True)

    # ------------------------------------------------------------- jax side
    # drives the production CLI loop (train/cli.py train_main) verbatim,
    # then evaluates on the test split with the same jittered protocol the
    # reference's per-epoch test pass uses (its datasets always jitter)
    if not args.skip_jax:
        t0 = time.time()
        from hotrack_tpu.data import get_dataloader
        from hotrack_tpu.train import cli as jcli

        sys.argv = ["train", "--config", "handtracknet_train_SimGrasp.yml",
                    "--num_points", str(args.num_points),
                    "--batch_size", str(args.batch),
                    "--epochs", str(args.epochs),
                    "--experiment_dir", "ab_quality_jax"]
        trainer = jcli.train_main()

        jcfg = dict(trainer.cfg)
        test_dl = get_dataloader(jcfg, "test", shuffle=False)
        key = jax.random.PRNGKey(1)
        lw = jcfg["network"]["loss_weight"]
        kp_diff, tot, n = 0.0, 0.0, 0
        for raw, _ in test_dl:
            key, k1 = jax.random.split(key)
            batch = jcli.prepare(trainer, raw, k1, jcfg)
            ld = trainer.test(batch)
            kp_diff += float(ld["hand_pred_kp_diff"])
            tot += sum(w * float(ld[k]) for k, w in lw.items()); n += 1
        results["jax"] = {"kp_diff_m": kp_diff / n, "total_loss": tot / n,
                          "train_s": time.time() - t0}
        print(f"[jax] TEST hand_pred_kp_diff {results['jax']['kp_diff_m']:.6f} m, "
              f"total_loss {results['jax']['total_loss']:.4f}, "
              f"wall {results['jax']['train_s']:.0f}s", flush=True)

    if len(results) == 2:
        r = results
        print(f"\nA/B @ {args.epochs} epochs, {args.instances} instances x "
              f"{args.frames} frames, {args.num_points} pts, batch {args.batch}:")
        print(f"  torch  kp_diff {r['torch']['kp_diff_m']*100:.3f} cm   "
              f"jax kp_diff {r['jax']['kp_diff_m']*100:.3f} cm   "
              f"(ratio {r['jax']['kp_diff_m']/r['torch']['kp_diff_m']:.3f})")


if __name__ == "__main__":
    main()
