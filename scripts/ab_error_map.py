"""Error-map diagnostics behind the round-4 tracking-A/B analysis.

Maps a trained HandTrackNet's correction behavior f(init error) -> output
error at several jitter levels, and runs the sequence-tracking loop, for
either side of the framework A/B:

  --side jax   — a hotrack_tpu checkpoint through our driver
                 (track/hand.py scan), at both sampling kinds;
  --side torch — the reference's torch checkpoint through its OWN pipeline
                 (dataset jitter + trainer.test), plus a per-frame
                 instrumented run of its tracking loop
                 (track_network.py:159-226).

Findings this tool produced (BENCHMARKS.md "Tracking A/B", round 4):
  - the two frameworks' equal-budget nets have near-identical f(e) maps
    (~3 cm floor at zero init error, f(e) > e everywhere at 20 epochs), so
    BOTH tracking loops diverge at that budget — the torch loop's per-frame
    instrumentation shows the same random walk ours does;
  - eval-time sampling kind (fps vs random subset) does not move f(e);
  - a torch->jax converted checkpoint reproduces the torch-native f(e)
    through our driver (conversion + driver cross-validation).

Usage:
  python scripts/ab_error_map.py --side jax --exp ab_quality_jax_s1 --seed 1
  python scripts/ab_error_map.py --side jax --exp torch2jax_s1 --svd
  python scripts/ab_error_map.py --side torch --exp ab_torch_s1 --seed 1
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

JITTERS = (0.0, 0.005, 0.01, 0.02, 0.04)


def jax_side(args):
    import jax
    jax.config.update("jax_platforms", os.environ.get("AB_PLATFORM", "cpu"))
    import jax.numpy as jnp
    import numpy as np
    from hotrack_tpu.config import get_config
    from hotrack_tpu.data import get_dataloader, prepare_batch
    from hotrack_tpu.mano.model import get_mano_model
    from hotrack_tpu.track.eval import eval_hand_sequence
    from hotrack_tpu.track.hand import track_hand_sequence
    from hotrack_tpu.train.run_hand_track import _load_model

    ov = {"config": "handtracknet_test_SimGrasp.yml",
          "num_points": args.num_points, "experiment_dir": args.exp,
          "seed": args.seed}
    if args.svd:
        # converted reference checkpoints were trained with the SVD palm
        # solver (hand_utils.py:42-66); keep train/eval solver consistent
        ov["network/procrustes_solver"] = "svd"
    cfg = get_config(ov, save=False)
    loader = get_dataloader(cfg, "test")
    mano = get_mano_model(cfg.get("mano_root"))
    raw0, _ = loader[0]
    raw0 = jax.tree.map(jnp.asarray, raw0)

    b0 = prepare_batch(mano, raw0, jax.random.PRNGKey(args.seed),
                       args.num_points, hand_jitter_scale=0.01)
    tr = _load_model(cfg, "HandTrackNet", cfg["experiment_dir"],
                     jax.tree.map(lambda a: a[:1], b0))

    print(f"=== jax side: {args.exp} ===")
    for kind in ("fps", "random"):
        for js in JITTERS:
            k = jax.random.PRNGKey(args.seed * 7 + int(js * 1000))
            b = prepare_batch(mano, raw0, k, args.num_points,
                              hand_jitter_scale=js, sample_kind=kind)
            gt = np.asarray(b["gt_hand_kp"])
            ie = float(np.mean(np.linalg.norm(
                np.asarray(b["jittered_hand_kp"]) - gt, axis=-1)))
            ret = tr.model.apply(tr.variables, b["hand_points"],
                                 b["jittered_hand_kp"],
                                 b["gt_hand_pose"]["palm_template"],
                                 train=False)
            oe = float(np.mean(np.linalg.norm(
                np.asarray(ret["pred_kp"]) - gt, axis=-1)))
            print(f"  sample={kind:6s} jitter={js:.3f}: "
                  f"init {ie*100:6.2f} cm -> out {oe*100:6.2f} cm")

    for kind in ("fps", "random"):
        b = prepare_batch(mano, raw0, jax.random.PRNGKey(args.seed),
                          args.num_points, hand_jitter_scale=0.01,
                          sample_kind=kind)
        result = track_hand_sequence(tr.model, tr.variables, mano, b)
        m = eval_hand_sequence(result, b["gt_hand_kp"],
                               b["gt_hand_pose"]["palm_template"][0])
        pf = np.asarray(m["hand_pred_kp_diff"])
        print(f"  TRACKING sample={kind:6s}: kp_diff "
              f"{float(m['mean/hand_pred_kp_diff'])*100:.2f} cm  "
              f"r {float(m['mean/hand_pred_r_diff']):.1f} deg  "
              f"(f0 {pf[0]*100:.2f} -> f{len(pf)-1} {pf[-1]*100:.2f} cm)")


def torch_side(args):
    import numpy as np
    import torch
    from reference_loader import pushd, reference_module, write_fake_mano_pkl
    from hotrack_tpu.config import get_config

    root = os.environ.get("HOTRACK_DATA_ROOT", "/tmp/ab_quality")
    mano_dir = os.path.join(root, "mano")
    ref_trainer_mod = reference_module("trainer")
    ref_dataset_mod = reference_module("dataset")
    exp_dir = os.path.join(root, "exps", args.exp)
    scratch = tempfile.mkdtemp(prefix="abem_")
    write_fake_mano_pkl(os.path.join(scratch, "third_party", "mano",
                                     "models"))
    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    print(f"=== torch side: {args.exp} ===")
    # f(e) map: the single-frame test path at varied dataset jitter
    base = dict(get_config({"config": "handtracknet_train_SimGrasp.yml",
                            "num_points": args.num_points,
                            "batch_size": 32}, save=False))
    base.update(device="cpu", num_workers=0, mano_root=mano_dir,
                experiment_dir=exp_dir)
    for js in JITTERS:
        tcfg = dict(base)
        tcfg["hand_jitter_cfg"] = dict(base["hand_jitter_cfg"])
        tcfg["hand_jitter_cfg"]["rand_scale"] = js
        dl = ref_dataset_mod.get_dataloader(tcfg, "test", shuffle=False)
        with pushd(scratch):
            trainer = ref_trainer_mod.Trainer(tcfg, None, max(len(dl), 1))
            trainer.resume(max(len(dl), 1))
            ie, oe, n = 0.0, 0.0, 0
            for data in dl:
                ie += float(torch.mean(torch.norm(
                    data["jittered_hand_kp"] - data["gt_hand_kp"], dim=-1)))
                ld, _ = trainer.test(data)
                oe += float(ld["hand_pred_kp_diff"])
                n += 1
        print(f"  jitter={js:.3f}: init {ie/n*100:6.2f} cm -> "
              f"out {oe/n*100:6.2f} cm")

    # per-frame instrumented tracking loop (track_network.py:159-226)
    tcfg = dict(get_config({"config": "handtracknet_test_SimGrasp.yml",
                            "num_points": args.num_points}, save=False))
    tcfg.update(device="cpu", num_workers=0, use_optimization=False,
                sdf_code_source="gt", mano_root=mano_dir,
                experiment_dir=exp_dir,
                save_dir=os.path.join(exp_dir, "results"))
    dl = ref_dataset_mod.get_dataloader(tcfg, "test", shuffle=False)
    with pushd(scratch):
        trainer = ref_trainer_mod.Trainer(tcfg, None, len(dl))
        trainer.resume(len(dl))
        for data in dl:
            flag_dict = trainer.init_flag_dict()
            flag_dict["test_flag"] = True
            flag_dict["save_flag"] = False
            trainer.model.eval()
            with torch.no_grad():
                ret_lst = trainer.model(data, flag_dict)
            errs = [float(torch.mean(torch.norm(
                r["pred_kp"] - d["gt_hand_kp"], dim=-1)))
                for d, r in zip(data, ret_lst)]
            print(f"  TRACKING ({len(errs)} frames): mean "
                  f"{np.mean(errs)*100:.2f} cm  "
                  f"(f0 {errs[0]*100:.2f} -> f{len(errs)-1} "
                  f"{errs[-1]*100:.2f} cm)")
            break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["jax", "torch"], required=True)
    ap.add_argument("--exp", required=True,
                    help="experiment dir name under $HOTRACK_DATA_ROOT/exps")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--svd", action="store_true",
                    help="evaluate with the SVD palm solver (use for "
                         "torch->jax converted checkpoints)")
    args = ap.parse_args()
    os.environ.setdefault("HOTRACK_DATA_ROOT", "/tmp/ab_quality")
    (jax_side if args.side == "jax" else torch_side)(args)


if __name__ == "__main__":
    main()
