"""Trainer: optimizer/scheduler factory, jitted train/eval steps, checkpoints.

Parity: /root/reference/network/trainer.py. Reproduced semantics:
  - Adam(weight_decay) == torch-style coupled L2 (optax add_decayed_weights
    feeding adam), SGD momentum 0.9 (trainer.py:66-80);
  - step LR schedule gamma^(epoch//step) with warm-up and lr_clip floor
    (trainer.py:42-63, 167-178);
  - BatchNorm momentum decay momentum_original * momentum_decay^(epoch//step),
    clipped at momentum_min (trainer.py:180-190) — threaded into every BN as a
    call-time argument;
  - model factory keyed on cfg['track'] (trainer.py:113-142);
  - checkpoint save/resume with multi-source composition for tracking
    (handnet/IKnet from separate experiment dirs, trainer.py:192-268) — orbax
    checkpoints of {params, batch_stats, opt_state, epoch}.

The train step is one jit: forward (BN in train mode, dropout rng), weighted
loss (cfg network/loss_weight, trainer.py:157), grads, optax update.
"""

from __future__ import annotations

import os
from functools import partial
from os.path import join as pjoin
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
import orbax.checkpoint as ocp

from ..config.config import ensure_dirs
from ..mano.model import get_mano_model
from ..models.hand_network import (
    HandTrackNet,
    IKNet,
    hand_tracknet_loss,
    iknet_loss,
)
from ..models.hand_utils import handkp2palmkp


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray      # ()
    iteration: jnp.ndarray  # ()


def lr_schedule(cfg: dict, epoch):
    """Learning rate actually applied by the reference's optimizer during
    0-based training epoch `epoch` (trainer.py:42-63, 167-178).

    The reference steps its torch scheduler at the TOP of each epoch
    (train.py:62), so during our epoch e the scheduler has stepped e+1 times.
    Its lr_clip gate (`if scheduler.get_lr()[0] > lr_clip: step()`) does NOT
    clamp at lr_clip: torch StepLR.get_lr() returns gamma*lr right after a
    boundary step, so the gate fails permanently one epoch after the last
    boundary whose *successor* level would be <= lr_clip, freezing the lr at
    base*gamma^n_max with n_max = min{n>=1: base*gamma^(n+1) <= clip}. For
    the shipped config (1e-4/0.5/20/clip 1e-5) that is 1.25e-5 from epoch 59
    on — measured against torch in test_step_lr_schedule_parity.

    Deliberate deviation: the reference's warm-up only writes the *logged*
    self.lr, never the optimizer's param_group (trainer.py:169-171), so
    warm_up > 0 is a no-op there; here it scales the applied lr (no shipped
    config sets warm_up > 0).
    """
    base = cfg["learning_rate"]
    policy = cfg.get("lr_policy", "constant")
    e1 = epoch + 1  # scheduler steps taken when this epoch's updates run
    if policy == "step":
        gamma, step = cfg["lr_gamma"], cfg["lr_step_size"]
        clip = cfg.get("lr_clip", 0.0)
        n = e1 // step
        if clip > 0 and 0 < gamma < 1:
            if base <= clip:
                n = 0  # gate fails before the first step ever happens
            else:
                n_max = 1
                while base * gamma ** (n_max + 1) > clip:
                    n_max += 1
                n = jnp.minimum(n, n_max)
        lr = base * jnp.power(gamma, n)
    elif policy == "CyclicLR":
        # triangular cycle, stepped once per epoch at the top like StepLR
        # (trainer.py:53-61, 167-175): step_size_up =
        # total_epoch * dataset_len // 6 at base 5e-5 / max 5e-4. The lr_clip
        # gate never fires (cyclic lrs exceed every shipped clip).
        base_lr = cfg.get("cyclic_base_lr", 5e-5)
        max_lr = cfg.get("cyclic_max_lr", 5e-4)
        step = max((cfg["total_epoch"] * cfg.get("dataset_len", 1)) // 6, 1)
        cycle = jnp.floor(1.0 + e1 / (2.0 * step))
        pos = jnp.abs(e1 / step - 2.0 * cycle + 1.0)
        lr = base_lr + (max_lr - base_lr) * jnp.clip(1.0 - pos, min=0.0)
    else:
        lr = jnp.asarray(base)
    warm = cfg.get("warm_up", 0)
    if warm > 0:
        lr = jnp.where(epoch < warm, base * (epoch + 1) / warm, lr)
    return lr


def bn_momentum_schedule(cfg: dict, epoch):
    """momentum_original * decay^(e//step), floored (trainer.py:180-190).
    The reference increments its 1-based epoch counter before applying the
    decay (step_epoch runs at the top of each epoch), so 0-based epoch e
    uses (e+1)//step."""
    m = cfg.get("momentum_original", 0.1) * (
        cfg.get("momentum_decay", 0.5)
        ** ((epoch + 1) // cfg.get("momentum_step_size", 20)))
    return jnp.maximum(m, cfg.get("momentum_min", 0.01))


def make_optimizer(cfg: dict):
    """Optimizer with an injectable learning rate (via inject_hyperparams)."""
    if cfg["optimizer"] == "Adam":
        def opt_fn(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(cfg.get("weight_decay", 0.0)),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale_by_learning_rate(learning_rate),
            )
    elif cfg["optimizer"] == "SGD":
        def opt_fn(learning_rate):
            return optax.sgd(learning_rate, momentum=0.9)
    else:
        raise ValueError(cfg["optimizer"])
    return optax.inject_hyperparams(opt_fn)(learning_rate=cfg["learning_rate"])


def summarize_losses(loss_dict: dict, loss_weights: dict):
    """Weighted total (trainer.py:157-165): only keys in loss_weight count."""
    total = 0.0
    for key, w in loss_weights.items():
        total = total + w * loss_dict[key]
    out = dict(loss_dict)
    out["total_loss"] = total
    return total, out


class Trainer:
    """Model factory + train/test steps + checkpoints (trainer.py:105-330)."""

    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.ckpt_dir = os.path.abspath(pjoin(cfg["experiment_dir"], "ckpt"))
        ensure_dirs(self.ckpt_dir)
        self.loss_weights = cfg["network"].get("loss_weight", {})
        self.track = cfg.get("track", False)
        self.mano = get_mano_model(cfg.get("mano_root"))

        net_cfg = cfg["pointnet"]["camera"]
        self.network_type = cfg["network"]["type"]
        if self.network_type == "HandTrackNet":
            self.model = HandTrackNet(
                net_cfg=_freeze(net_cfg),
                backbone_out_dim=cfg["network"]["backbone_out_dim"],
                handframe=cfg["network"]["handframe"],
                use_attention=cfg["network"].get("use_attention", False),
                compute_dtype=cfg["network"].get("compute_dtype"),
                procrustes_solver=cfg["network"].get("procrustes_solver"))
        elif self.network_type == "iknet":
            self.model = IKNet(
                iknetframe=cfg["network"].get("iknetframe", "kp"),
                procrustes_solver=cfg["network"].get("procrustes_solver"),
                torch_init=cfg["network"].get("torch_init", False))
        else:
            raise NotImplementedError(self.network_type)

        self.optimizer = make_optimizer(cfg)
        self.state: TrainState | None = None
        self.checkpointer = ocp.StandardCheckpointer()
        # static reachability mask over param leaves (set by init_state);
        # pytree of Python bools, False = leaf never enters the autodiff
        # graph for this model config (see _train_step)
        self._reach_mask = None

        # data-parallel training over a device mesh: cfg dp_devices = N or
        # "all" (CLI: --dp_devices 8). State is replicated, each batch is
        # sharded along axis 0, and jit/GSPMD inserts the gradient/BN
        # collectives — the train step itself is unchanged (the reference's
        # DataParallel surface, train.py:31, realized TPU-style).
        self.mesh = None
        dp = cfg.get("dp_devices", 0)
        if dp:
            n = len(jax.devices()) if dp in ("all", -1) else int(dp)
            assert len(jax.devices()) >= n, (
                f"dp_devices={dp} but only {len(jax.devices())} devices")
            if n > 1:
                from jax.sharding import Mesh
                self.mesh = Mesh(np.asarray(jax.devices()[:n]), ("dp",))

    # ------------------------------------------------------------- init
    def init_state(self, example_batch: dict, seed: int = 0) -> TrainState:
        key = jax.random.PRNGKey(seed)
        variables = self._init_variables(key, example_batch)
        params = variables["params"]
        if self.cfg.get("weight_init") == "xavier":
            params = _xavier_reinit(params, jax.random.PRNGKey(seed + 1))
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        self.state = TrainState(params, batch_stats, opt_state,
                                jnp.asarray(0), jnp.asarray(0))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(self.mesh, PartitionSpec())
            self.state = jax.device_put(self.state, repl)
        return self.state

    def _init_variables(self, key, batch):
        if self.network_type == "HandTrackNet":
            return self.model.init(
                key, batch["hand_points"], batch["jittered_hand_kp"],
                batch["gt_hand_pose"]["palm_template"],
                obb_pose=_obb_pose(self.model, batch))
        return self.model.init(
            key, batch["jittered_hand_kp"],
            batch["gt_hand_pose"]["palm_template"])

    # ------------------------------------------------------------ steps
    def _make_loss_fn(self, batch: dict, batch_stats, momentum, rng):
        """Forward + weighted loss closure over params (shared by the train
        step and the one-time reachability probe)."""
        obb_pose = _obb_pose(self.model, batch)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": batch_stats}
            if self.network_type == "HandTrackNet":
                ret, mutated = self.model.apply(
                    variables, batch["hand_points"], batch["jittered_hand_kp"],
                    batch["gt_hand_pose"]["palm_template"], obb_pose=obb_pose,
                    train=True, bn_momentum=momentum,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                loss_dict, _ = hand_tracknet_loss(
                    ret, batch["gt_hand_kp"],
                    gt_palm_template=batch["gt_hand_pose"]["palm_template"])
            else:
                ret, mutated = self.model.apply(
                    variables, batch["jittered_hand_kp"],
                    batch["gt_hand_pose"]["palm_template"],
                    train=True, bn_momentum=momentum,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                gt_quat = _gt_joint_quats(batch)
                loss_dict, _ = iknet_loss(ret, gt_quat, batch["gt_hand_kp"])
            total, loss_dict = summarize_losses(loss_dict, self.loss_weights
                                                or _default_weights(loss_dict))
            return total, (loss_dict, mutated["batch_stats"])

        return loss_fn

    @partial(jax.jit, static_argnames=("self",))
    def _probe_reachability(self, params, batch_stats, batch, rng):
        """Per-leaf any(grad != 0) on a probe batch — the one-time
        reachability classification backing the static update mask."""
        loss_fn = self._make_loss_fn(
            batch, batch_stats, bn_momentum_schedule(self.cfg, 0), rng)
        grads = jax.grad(loss_fn, has_aux=True)(params)[0]
        return jax.tree.map(lambda g: jnp.any(g != 0), grads)

    @partial(jax.jit, static_argnames=("self", "reach_mask"))
    def _train_step(self, state: TrainState, batch: dict, rng,
                    reach_mask=None):
        cfg = self.cfg
        lr = lr_schedule(cfg, state.epoch)
        momentum = bn_momentum_schedule(cfg, state.epoch)
        loss_fn = self._make_loss_fn(batch, state.batch_stats, momentum, rng)

        (_, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = _set_lr(state.opt_state, lr)
        updates, opt_state = self.optimizer.update(grads, opt_state, state.params)
        # torch optimizers skip parameters whose .grad is None — tensors that
        # never entered the autograd graph (e.g. the attention stack under
        # use_attention=False, or SharedMLP branches whose output is
        # discarded) get NO update and NO weight decay (reference
        # trainer.py:278-302 + torch.optim.Adam's p.grad guard). JAX autodiff
        # returns zero gradients instead, and optax's coupled weight decay
        # would silently walk those frozen weights; mask whole unreachable
        # leaves with the STATIC mask probed once at init_state — a dynamic
        # any(g != 0) test would also freeze reachable leaves on steps where
        # their gradient is transiently all-zero (dead ReLU path), which
        # torch does not (a zero .grad tensor still gets decay + the
        # momentum-driven Adam step).
        #
        # reach_mask is a STATIC flat tuple of per-leaf bools (not read from
        # self: self hashes by identity, so a trace made while the probe
        # hadn't run yet would be silently cached and keep skipping the mask
        # forever — ADVICE r4). None = no masking (pre-probe / FLOP traces).
        if reach_mask is not None:
            leaves, treedef = jax.tree.flatten(updates)
            assert len(reach_mask) == len(leaves), (
                f"reach_mask has {len(reach_mask)} leaves, updates "
                f"{len(leaves)} — probe/step param trees diverged")
            updates = jax.tree.unflatten(treedef, [
                u if m else jnp.zeros_like(u)
                for u, m in zip(leaves, reach_mask)])
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, new_bs, opt_state, state.epoch,
                               state.iteration + 1)
        return new_state, loss_dict

    @partial(jax.jit, static_argnames=("self",))
    def _eval_step(self, state: TrainState, batch: dict):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if self.network_type == "HandTrackNet":
            ret = self.model.apply(
                variables, batch["hand_points"], batch["jittered_hand_kp"],
                batch["gt_hand_pose"]["palm_template"],
                obb_pose=_obb_pose(self.model, batch), train=False)
            loss_dict, _ = hand_tracknet_loss(
                ret, batch["gt_hand_kp"],
                gt_palm_template=batch["gt_hand_pose"]["palm_template"])
        else:
            ret = self.model.apply(
                variables, batch["jittered_hand_kp"],
                batch["gt_hand_pose"]["palm_template"], train=False)
            loss_dict, _ = iknet_loss(ret, _gt_joint_quats(batch),
                                      batch["gt_hand_kp"])
        return loss_dict

    def update(self, batch: dict, rng) -> dict:
        if self.mesh is not None:
            batch = self._shard_batch(batch, strict=True)
        if self._reach_mask is None:
            # one-time reachability probe (lazy: eval-only Trainers — convert,
            # tracking runners — never pay it). Reachability is architectural,
            # not batch-dependent; a small slice keeps the probe compile cheap.
            # Guard against a degenerate probe slice (e.g. all-invalid
            # empty_frame rows from the real loaders) silently freezing live
            # leaves: an implausibly frozen small-slice mask is re-probed on
            # the full batch, and an all-frozen mask is a hard error rather
            # than a silent no-op training run (ADVICE r4).
            probe = jax.tree.map(
                lambda a: a[:4] if getattr(a, "ndim", 0) else a, batch)
            mask = self._flat_mask(self._probe_reachability(
                self.state.params, self.state.batch_stats, probe, rng))
            if not all(mask):
                mask = self._flat_mask(self._probe_reachability(
                    self.state.params, self.state.batch_stats, batch, rng))
            n_frozen = sum(not m for m in mask)
            if n_frozen == len(mask):
                raise RuntimeError(
                    "reachability probe froze every parameter leaf — the "
                    "probe batch produced identically-zero gradients "
                    "(degenerate/empty rows, or a dead graph); refusing to "
                    "start a training run that would never update")
            if n_frozen:
                print(f"reachability probe: {n_frozen}/{len(mask)} param "
                      "leaves unreachable (frozen, no decay — torch "
                      ".grad-is-None semantics)")
            self._reach_mask = mask
        self.state, loss_dict = self._train_step(self.state, batch, rng,
                                                 reach_mask=self._reach_mask)
        return loss_dict

    @staticmethod
    def _flat_mask(mask_tree):
        """Device mask pytree -> hashable flat tuple of Python bools (leaf
        order = jax.tree.flatten order, matched in _train_step)."""
        return tuple(bool(x) for x in jax.tree.leaves(
            jax.device_get(mask_tree)))

    def test(self, batch: dict) -> dict:
        if self.mesh is not None:
            # eval batches may be ragged (drop_last=False); shard only the
            # divisible ones — the rest run unsharded on the default device
            batch = self._shard_batch(batch, strict=False)
        return self._eval_step(self.state, batch)

    def _shard_batch(self, batch: dict, strict: bool):
        from jax.sharding import NamedSharding, PartitionSpec
        n = self.mesh.devices.size
        sizes = {x.shape[0] for x in jax.tree.leaves(batch)}
        if any(s % n for s in sizes):
            assert not strict, (
                f"dp_devices={n} needs batch_size divisible by it; got "
                f"{sorted(sizes)} (set batch_size to a multiple of {n})")
            return batch
        dp = NamedSharding(self.mesh, PartitionSpec("dp"))
        return jax.tree.map(lambda x: jax.device_put(x, dp), batch)

    def step_epoch(self):
        self.state = self.state._replace(epoch=self.state.epoch + 1)

    # ------------------------------------------------------ checkpoints
    def save(self, epoch: int | None = None):
        epoch = int(self.state.epoch) if epoch is None else epoch
        path = pjoin(self.ckpt_dir, f"model_{epoch:04d}")
        tree = {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "epoch": np.asarray(int(self.state.epoch))}
        self.checkpointer.save(path, tree, force=True)
        # orbax saves asynchronously; block so a process exit right after
        # the final epoch can't leave an .orbax-checkpoint-tmp behind
        self.checkpointer.wait_until_finished()
        print(f"saved checkpoint {path}")
        return path

    def resume(self, path: str | None = None) -> bool:
        """Load latest (or given) checkpoint; tolerant like trainer.py:240-249.

        A positive `resume_epoch` in the config pins the exact checkpoint
        instead of the latest (reference trainer.py:193-196, 230) — without
        it, evals against a still-training or multi-checkpoint experiment
        silently pick whatever is newest."""
        if path is None:
            want = int(self.cfg.get("resume_epoch") or -1)
            if want > 0:
                path = pjoin(self.ckpt_dir, f"model_{want:04d}")
                assert os.path.isdir(path), f"no checkpoint {path}"
            else:
                if not os.path.isdir(self.ckpt_dir):
                    return False
                ckpts = sorted(d for d in os.listdir(self.ckpt_dir)
                               if d.startswith("model_") and "tmp" not in d)
                if not ckpts:
                    return False
                path = pjoin(self.ckpt_dir, ckpts[-1])
        assert self.state is not None, "init_state before resume"
        tmpl = {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "epoch": np.asarray(0)}
        tree = self.checkpointer.restore(path, tmpl)
        self.state = self.state._replace(
            params=tree["params"], batch_stats=tree["batch_stats"],
            epoch=jnp.asarray(int(tree["epoch"])))
        print(f"resumed from {path} (epoch {int(tree['epoch'])})")
        return True

    @property
    def variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}


def _default_weights(loss_dict):
    """Training without explicit loss_weight falls back to the quat loss for
    IKNet (hand_network.py:332) or kp loss for HandTrackNet."""
    if "quat_loss" in loss_dict:
        return {"quat_loss": 1.0}
    return {"hand_pred_kp_loss": 1.0}


def _gt_joint_quats(batch):
    """Annotated MANO joint quats, global stripped (hand_network.py:310-312)."""
    from ..pose.rotations import mano_axisang2quat
    return mano_axisang2quat(batch["gt_hand_pose"]["mano_pose"])[:, 4:]


def _set_lr(opt_state, lr):
    """Poke the injected learning_rate hyperparameter."""
    try:
        opt_state.hyperparams["learning_rate"] = lr
    except (AttributeError, TypeError):
        pass
    return opt_state


def _obb_pose(model, batch):
    """CanonPose from the pipeline's OBB entry for handframe='OBB'."""
    if getattr(model, "handframe", None) != "OBB":
        return None
    from ..models.hand_utils import CanonPose
    p = batch["OBB_pose"]
    return CanonPose(p["rotation"], p["translation"], p["scale"])


def _xavier_reinit(params, key):
    """Re-sample 2D kernels with xavier normal, gain sqrt(2) — the
    reference's weights_init('xavier') (trainer.py:20-39). Biases stay zero;
    norm scales/biases untouched."""
    import math
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for (path, leaf), k in zip(leaves, keys):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name == "kernel" and leaf.ndim == 2:
            fan_in, fan_out = leaf.shape
            std = math.sqrt(2.0) * math.sqrt(2.0 / (fan_in + fan_out))
            leaf = jax.random.normal(k, leaf.shape, leaf.dtype) * std
        elif name == "bias":
            leaf = jnp.zeros_like(leaf)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _freeze(d):
    """Nested dict -> hashable structure for flax module attributes."""
    if isinstance(d, dict):
        return _Frozen({k: _freeze(v) for k, v in d.items()})
    if isinstance(d, list):
        return tuple(_freeze(v) for v in d)
    return d


class _Frozen(dict):
    """Hashable read-only dict (flax module attributes must be hashable)."""

    def __hash__(self):
        return hash(tuple(sorted((k, _hashable(v)) for k, v in self.items())))

    def __setitem__(self, *a):
        raise TypeError("frozen")


def _hashable(v):
    return tuple(v) if isinstance(v, (list, tuple)) else v
