"""IKNet quat-L1 gap bisect, part 2 (round 5): eval-protocol vs training.

The 8-seed campaign shows a systematic quat-L1 gap (torch 0.5497 vs jax
0.5791 mean, jax worse 7/8 seeds) while FK-MPJPE through the same rig is
2.1% BETTER for jax. Init is ruled out (both frameworks xavier-reinit with
zeroed biases — trainer.py:20-39 == _xavier_reinit; experimentally
confirmed: a torch-matching pre-init is a no-op because the xavier pass
overwrites it). This splits the remainder: convert a TORCH-trained IKNet
into flax and run it through OUR eval loop on the same held-out set.

  - torch-net-in-jax-eval  ==  its torch-eval value  -> eval protocols are
    equivalent; the gap is a genuine training-dynamics difference.
  - torch-net-in-jax-eval  >>  its torch-eval value  -> our eval jitter /
    canonicalization is harder; the gap is protocol, not quality.

Usage: python scripts/ab_iknet_crosseval.py [--seed 0] [--root /tmp/ab_quality]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--root", default="/tmp/ab_quality")
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()
    os.environ["HOTRACK_DATA_ROOT"] = args.root

    import torch
    from hotrack_tpu.config import get_config
    from hotrack_tpu.data import get_dataloader
    from hotrack_tpu.train import cli as jcli
    from hotrack_tpu.train.trainer import Trainer, _gt_joint_quats
    from hotrack_tpu.utils.torch_convert import load_reference_checkpoint

    pt = os.path.join(args.root, "exps", f"ab_torch_ik_s{args.seed}",
                      "ckpt", f"model_{args.epochs:04d}.pt")
    raw = torch.load(pt, map_location="cpu", weights_only=True)
    cfg = get_config({"config": "iknet_train_SimGrasp.yml",
                      "experiment_dir": f"crosseval_ik_s{args.seed}"},
                     save=False)
    nets = load_reference_checkpoint(raw, cfg["pointnet"]["camera"],
                                     cfg["network"]["backbone_out_dim"])
    assert "iknet" in nets, list(nets)

    trainer = Trainer(cfg)
    test_dl = get_dataloader(cfg, "test", shuffle=False)
    raw0, _ = next(iter(test_dl))
    key = jax.random.PRNGKey(args.seed * 1000 + 1)
    key, k0 = jax.random.split(key)
    trainer.init_state(jcli.prepare(trainer, raw0, k0, cfg))
    trainer.state = trainer.state._replace(
        params=nets["iknet"]["params"],
        batch_stats=nets["iknet"].get("batch_stats",
                                      trainer.state.batch_stats))

    # identical protocol to the A/B's jax eval (ab_framework_quality.py)
    key = jax.random.PRNGKey(args.seed * 1000 + 1)
    met, n = 0.0, 0
    rq, gq, bt = [], [], []
    for raw_b, _ in test_dl:
        key, k1 = jax.random.split(key)
        batch = jcli.prepare(trainer, raw_b, k1, cfg)
        ld = trainer.test(batch)
        met += float(ld["quat_loss"]); n += 1
        ret = trainer.model.apply(trainer.variables,
                                  batch["jittered_hand_kp"],
                                  batch["gt_hand_pose"]["palm_template"],
                                  train=False)
        rq.append(np.asarray(ret["raw_quat"]))
        gq.append(np.asarray(_gt_joint_quats(batch)))
        bt.append(np.asarray(batch["gt_hand_pose"]["mano_beta"]))
    from ab_framework_quality import fk_mpjpe
    fk = fk_mpjpe(np.concatenate(rq), np.concatenate(gq), np.concatenate(bt))
    print(f"torch-trained IKNet s{args.seed} in OUR eval loop: "
          f"quat_loss {met / n:.5f}   fk_mpjpe {fk * 100:.3f} cm")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
