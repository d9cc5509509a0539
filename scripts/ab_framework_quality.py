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
           [--frames 50] [--num_points 512] [--batch 32] [--seed N]
       python scripts/ab_framework_quality.py --track_eval [--seed N]
           # after training:
           sequence-tracking MPJPE of both trained nets, each through its own
           tracking driver (reference: HandTrackModel last-frame-kp loop,
           track_network.py:139-226; ours: track/hand.py lax.scan driver)
       python scripts/ab_framework_quality.py --net iknet    # second model
           family: equal-budget IKNet A/B (quat L1 on held-out + an
           articulation FK-MPJPE: both frameworks' predicted joint quats
           through the SAME synthetic rig, identity root / zero trans —
           framework-neutral by construction)

`--seed N` varies each framework's native randomness (weight init, shuffle
order, jitter draws) while the dataset and splits stay fixed — run >= 3
seeds per side to measure the seed spread the single-number A/B sits in.
Per-seed results accumulate under "s{N}" keys in the JSON files; experiment
dirs carry an `_s{N}` suffix so trained checkpoints coexist.

Writes results to stdout; record them in BENCHMARKS.md.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
jax.config.update("jax_platforms", os.environ.get("AB_PLATFORM", "cpu"))
import numpy as np


def faithful_numpy_fps(xyz, npoint, device=None):
    """GPU-semantics FPS for the reference dataset on CPU: random
    presubsample only above 5*npoint (data_utils.py:235-240), then exact
    FPS seeded at index 0 (the CUDA kernel's start, sampling_gpu.cu:115-117)
    — replaces the CPU fallback's pure random subset (data_utils.py:246-249)
    under --torch_fps."""
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    if n > 5 * npoint:
        pre = np.random.permutation(n)[:5 * npoint]
        sub = xyz[pre]
    else:
        pre, sub = None, xyz
    m = min(npoint, len(sub))
    cent = np.zeros(m, np.int64)
    dist = np.full(len(sub), 1e10, np.float32)
    far = 0
    for i in range(m):
        cent[i] = far
        d = np.sum((sub - sub[far]) ** 2, -1)
        np.minimum(dist, d, out=dist)
        far = int(np.argmax(dist))
    return cent if pre is None else pre[cent]


def _patch_torch_fps():
    from reference_loader import reference_module
    # SimGrasp_dataset binds the name by from-import; patch both sites
    reference_module("SimGrasp_dataset").farthest_point_sample = \
        faithful_numpy_fps
    reference_module("data_utils").farthest_point_sample = faithful_numpy_fps


def torch_track_eval(args, mano_dir):
    """Reference tracking: HandTrackModel (handnet-only, GT shape) over the
    test sequences — per-frame handnet with the last-frame-kp recentering
    trick (track_network.py:161-163, 216-218). Returns per-frame-mean
    tracking kp error in meters, averaged over sequences."""
    from reference_loader import pushd, reference_module, write_fake_mano_pkl
    from hotrack_tpu.config import get_config

    ref_trainer_mod = reference_module("trainer")
    ref_dataset_mod = reference_module("dataset")

    if args.torch_fps:
        _patch_torch_fps()
    exp_dir = os.path.join(
        args.root, "exps",
        f"ab_torch_s{args.seed}{args.etag}"
        + ("_fps" if args.torch_fps else ""))
    tcfg = dict(get_config({"config": "handtracknet_test_SimGrasp.yml",
                            "num_points": args.num_points}, save=False))
    tcfg.update(device="cpu", num_workers=0, use_optimization=False,
                sdf_code_source="gt", mano_root=mano_dir,
                experiment_dir=exp_dir,
                save_dir=os.path.join(exp_dir, "results"))

    # HandTrackModel builds OurManoLayer() at its CWD-relative default path
    # (track_network.py:137, our_mano.py:156-165)
    scratch = tempfile.mkdtemp(prefix="abq_track_")
    write_fake_mano_pkl(os.path.join(scratch, "third_party", "mano", "models"))

    dl = ref_dataset_mod.get_dataloader(tcfg, "test", shuffle=False)
    with pushd(scratch):
        trainer = ref_trainer_mod.Trainer(tcfg, None, len(dl))
        trainer.resume(len(dl))
        kp, n_seq = 0.0, 0
        for data in dl:
            ld, _ = trainer.test(data)
            # compute_loss add_dict-sums over frames and then divides by
            # valid_length (track_network.py:301-307) — ld values are already
            # per-frame means. (Round-4 fix: an extra /len(data) here divided
            # by the frame count twice and under-reported the torch leg 50x.)
            kp += float(ld["hand_pred_kp_diff"])
            n_seq += 1
            print(f"[torch-track] seq {n_seq - 1}: kp_diff "
                  f"{float(ld['hand_pred_kp_diff']):.6f} m",
                  flush=True)
    return kp / max(n_seq, 1)


def jax_track_eval(args):
    """Our tracking driver (track/hand.py scan) via the production test CLI
    on the same test sequences + checkpoint trained by the jax leg."""
    from hotrack_tpu.train.cli import test_main

    sys.argv = ["test", "--config", "handtracknet_test_SimGrasp.yml",
                "--num_points", str(args.num_points),
                "--experiment_dir", "ab_quality_jax_s%d%s%s" % (
                    args.seed, args.etag,
                    "_rs" if args.jax_sample == "random" else ""),
                "--seed", str(args.seed)]
    if args.jax_sample == "random":
        sys.argv += ["--point_sample", "random"]
    avg, _fps = test_main()
    return float(avg["hand_pred_kp_diff"])


def fk_mpjpe(raw_quat, gt_quat, beta):
    """Articulation-only FK error in meters: both quat sets (N, 60) through
    the SAME synthetic rig with identity root / zero trans, so the metric is
    framework-neutral (the torch leg's quats are FK'd by the same code)."""
    import jax.numpy as jnp
    from hotrack_tpu.mano.layer import mano_forward
    from hotrack_tpu.mano.model import synthetic_mano_model
    from hotrack_tpu.pose.rotations import mano_quat2axisang

    model = synthetic_mano_model(0)

    def kp(q):
        b = q.shape[0]
        root = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), (b, 1))
        pose = mano_quat2axisang(jnp.concatenate([root, jnp.asarray(q)], -1))
        _, k = mano_forward(model, pose, betas=jnp.asarray(beta),
                            trans=jnp.zeros((b, 3)))
        return k

    d = kp(np.asarray(raw_quat)) - kp(np.asarray(gt_quat))
    return float(jnp.mean(jnp.linalg.norm(d, axis=-1)))


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
    ap.add_argument("--track_eval", action="store_true",
                    help="skip training; run sequence-tracking eval of the "
                         "already-trained checkpoints on both sides")
    ap.add_argument("--net", choices=["handtracknet", "iknet"],
                    default="handtracknet")
    ap.add_argument("--seed", type=int, default=0,
                    help="per-framework randomness seed (init, shuffle, "
                         "jitter); the dataset/splits stay fixed")
    # --- sampling-protocol diagnostics (the named candidate for the round-3
    # 2.7% single-frame gap): the torch leg's CPU fallback downsamples clouds
    # by a FRESH random subset every draw (data_utils.py:246-249 — per-epoch
    # augmentation), while our pipeline runs the reference's GPU-mode
    # deterministic FPS. These flags put either leg on the other protocol.
    ap.add_argument("--jax_sample", choices=["fps", "random"], default="fps",
                    help="'random' = run our pipeline with the torch CPU "
                         "leg's fresh-random-subset sampling")
    ap.add_argument("--torch_fps", action="store_true",
                    help="patch the reference dataset to faithful "
                         "(GPU-semantics, start-index-0) numpy FPS instead "
                         "of its CPU random fallback")
    ap.add_argument("--jax_solver", choices=["horn", "svd"], default=None,
                    help="palm-canonicalization solver for the jax leg "
                         "(default: the package default, Horn; the "
                         "reference always uses exact SVD) — round-5 "
                         "quat-L1 bisect")
    ap.add_argument("--jax_torch_init", action="store_true",
                    help="run the jax leg with torch-matching init "
                         "(network/torch_init: kaiming-uniform kernels + "
                         "uniform bias) — round-5 bisect of the IKNet "
                         "quat-L1 gap")
    args = ap.parse_args()
    assert not (args.track_eval and args.net == "iknet"), \
        "tracking A/B is the handtracknet protocol"
    # result-file key: seed + any protocol-variant tags of this invocation;
    # non-default budgets get their own experiment dirs + result keys so a
    # 150-epoch tracking A/B coexists with the 20-epoch multi-seed campaign
    args.etag = f"_e{args.epochs}" if args.epochs != 20 else ""
    args.tag = (f"s{args.seed}" + args.etag
                + ("_jrand" if args.jax_sample == "random" else "")
                + ("_tfps" if args.torch_fps else "")
                + ("_ti" if args.jax_torch_init else "")
                + (f"_{args.jax_solver}" if args.jax_solver else ""))

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

    if args.track_eval:
        results = {}
        if not args.skip_torch:
            import torch as _t
            _t.manual_seed(args.seed)
            np.random.seed(args.seed)
            results["torch_track_m"] = torch_track_eval(args, mano_dir)
            print(f"[torch] TRACKING kp_diff {results['torch_track_m']:.6f} m",
                  flush=True)
        if not args.skip_jax:
            results["jax_track_m"] = jax_track_eval(args)
            print(f"[jax] TRACKING kp_diff {results['jax_track_m']:.6f} m",
                  flush=True)
        if len(results) == 2:
            print(f"\ntracking A/B [s{args.seed}]: "
                  f"torch {results['torch_track_m']*100:.3f} cm"
                  f"   jax {results['jax_track_m']*100:.3f} cm   (ratio "
                  f"{results['jax_track_m']/results['torch_track_m']:.3f})")
        _accumulate(os.path.join(args.root, "track_results.json"),
                    args.tag, results)
        return

    # shared hyperparameters from the shipped config
    from hotrack_tpu.config import get_config
    # the synthetic generator writes splits/<cat>/seq/{train,test}.txt
    # itself (last instance = test); both loaders prefer existing splits
    cfg_name = ("iknet_train_SimGrasp.yml" if args.net == "iknet"
                else "handtracknet_train_SimGrasp.yml")
    suffix = ("_ik" if args.net == "iknet" else "") + f"_s{args.seed}" + args.etag
    jax_exp = ("ab_quality_jax" + suffix
               + ("_rs" if args.jax_sample == "random" else "")
               + ("_ti" if args.jax_torch_init else "")
               + (f"_{args.jax_solver}" if args.jax_solver else ""))
    torch_exp = "ab_torch" + suffix + ("_fps" if args.torch_fps else "")
    cfg = get_config({"config": cfg_name,
                      "num_points": args.num_points,
                      "batch_size": args.batch,
                      "total_epoch": args.epochs,
                      "experiment_dir": jax_exp,
                      **({"network/torch_init": True}
                         if args.jax_torch_init else {})},
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
        tcfg["experiment_dir"] = os.path.join(args.root, "exps", torch_exp)
        os.makedirs(tcfg["experiment_dir"], exist_ok=True)

        # seed BEFORE dataloader/trainer construction: weight init, shuffle
        # order (torch global RNG at iteration) and the dataset's np.random
        # jitter draws all follow
        torch.manual_seed(args.seed)
        np.random.seed(args.seed)
        if args.torch_fps:
            _patch_torch_fps()
        train_dl = ref_dataset_mod.get_dataloader(tcfg, "train")
        test_dl = ref_dataset_mod.get_dataloader(tcfg, "test", shuffle=False)
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
        metric_key = ("quat_loss" if args.net == "iknet"
                      else "hand_pred_kp_diff")
        met, tot, n = 0.0, 0.0, 0
        rq, gq, bt = [], [], []
        for data in test_dl:
            ld, ret = trainer.test(data)
            met += float(ld[metric_key])
            tot += sum(w * float(ld[k]) for k, w in lw.items()); n += 1
            if args.net == "iknet":
                rq.append(ret["raw_quat"].detach().numpy())
                gq.append(ret["gt_quat"].detach().numpy())
                bt.append(data["gt_hand_pose"]["mano_beta"].numpy())
        results["torch"] = {metric_key: met / n, "total_loss": tot / n,
                            "train_s": time.time() - t0}
        if args.net == "iknet":
            results["torch"]["fk_mpjpe_m"] = fk_mpjpe(
                np.concatenate(rq), np.concatenate(gq), np.concatenate(bt))
        trainer.save()  # model_{epoch:04d}.pt for the tracking leg
        print(f"[torch] TEST {results['torch']}", flush=True)

    # ------------------------------------------------------------- jax side
    # drives the production CLI loop (train/cli.py train_main) verbatim,
    # then evaluates on the test split with the same jittered protocol the
    # reference's per-epoch test pass uses (its datasets always jitter)
    if not args.skip_jax:
        t0 = time.time()
        from hotrack_tpu.data import get_dataloader
        from hotrack_tpu.train import cli as jcli

        sys.argv = ["train", "--config", cfg_name,
                    "--num_points", str(args.num_points),
                    "--batch_size", str(args.batch),
                    "--epochs", str(args.epochs),
                    "--experiment_dir", jax_exp,
                    "--seed", str(args.seed)]
        if args.jax_sample == "random":
            sys.argv += ["--point_sample", "random"]
        if args.jax_torch_init:
            sys.argv += ["--network/torch_init", "true"]
        if args.jax_solver:
            sys.argv += ["--network/procrustes_solver", args.jax_solver]
        trainer = jcli.train_main()

        jcfg = dict(trainer.cfg)
        test_dl = get_dataloader(jcfg, "test", shuffle=False)
        key = jax.random.PRNGKey(args.seed * 1000 + 1)
        lw = jcfg["network"]["loss_weight"]
        metric_key = ("quat_loss" if args.net == "iknet"
                      else "hand_pred_kp_diff")
        met, tot, n = 0.0, 0.0, 0
        rq, gq, bt = [], [], []
        for raw, _ in test_dl:
            key, k1 = jax.random.split(key)
            batch = jcli.prepare(trainer, raw, k1, jcfg)
            ld = trainer.test(batch)
            met += float(ld[metric_key])
            tot += sum(w * float(ld[k]) for k, w in lw.items()); n += 1
            if args.net == "iknet":
                from hotrack_tpu.train.trainer import _gt_joint_quats
                ret = trainer.model.apply(
                    trainer.variables, batch["jittered_hand_kp"],
                    batch["gt_hand_pose"]["palm_template"], train=False)
                rq.append(np.asarray(ret["raw_quat"]))
                gq.append(np.asarray(_gt_joint_quats(batch)))
                bt.append(np.asarray(batch["gt_hand_pose"]["mano_beta"]))
        results["jax"] = {metric_key: met / n, "total_loss": tot / n,
                          "train_s": time.time() - t0}
        if args.net == "iknet":
            results["jax"]["fk_mpjpe_m"] = fk_mpjpe(
                np.concatenate(rq), np.concatenate(gq), np.concatenate(bt))
        print(f"[jax] TEST {results['jax']}", flush=True)

    if len(results) == 2:
        r = results
        mk = "quat_loss" if args.net == "iknet" else "hand_pred_kp_diff"
        print(f"\nA/B [{args.net}] @ {args.epochs} epochs, {args.instances} "
              f"instances x {args.frames} frames, {args.num_points} pts, "
              f"batch {args.batch}:")
        print(f"  torch {mk} {r['torch'][mk]:.5f}   "
              f"jax {mk} {r['jax'][mk]:.5f}   "
              f"(ratio {r['jax'][mk]/r['torch'][mk]:.3f})")
        if args.net == "iknet":
            print(f"  torch fk_mpjpe {r['torch']['fk_mpjpe_m']*100:.3f} cm   "
                  f"jax fk_mpjpe {r['jax']['fk_mpjpe_m']*100:.3f} cm   (ratio "
                  f"{r['jax']['fk_mpjpe_m']/r['torch']['fk_mpjpe_m']:.3f})")
    if results:
        path = os.path.join(args.root,
                            f"singleframe_results_{args.net}.json"
                            if args.net == "iknet" else
                            "singleframe_results.json")
        _accumulate(path, args.tag, results)


def _accumulate(path: str, seed_key: str, results: dict):
    """Merge this run's results into the JSON file under the seed key
    (legacy top-level keys from pre-seed runs are left in place)."""
    old = {}
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    merged = dict(old.get(seed_key, {}))
    merged.update(results)
    old[seed_key] = merged
    with open(path, "w") as f:
        json.dump(old, f, indent=1)
    print(f"[results] {seed_key} -> {path}", flush=True)


if __name__ == "__main__":
    main()
