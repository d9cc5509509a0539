"""Flax variables -> PyTorch reference checkpoint exporter (the inverse of
utils/torch_convert.py).

Lets nets trained in this package run inside the reference's own torch
toolchain (its Trainer.resume loads with strict=False,
/root/reference/network/trainer.py:249, so FFN-mode exports that omit the
never-executed MultiheadAttention weights load cleanly). Layout
translations are the exact inverses of the import direction:

  - Dense kernel (in, out) -> Conv2d weight (out, in, 1, 1) inside set-
    abstraction blocks (pointnet_utils.py:204,312,528), Conv1d (out, in, 1)
    in feature propagation / conv1 / final_mlp (pointnet_utils.py:260,
    hand_network.py:76-78), Linear (out, in) in rearrange/attn FFN modules;
  - params {scale, bias} + batch_stats {mean, var} -> torch BatchNorm
    {weight, bias, running_mean, running_var, num_batches_tracked};
  - IKNet's first Linear row permutation (kp-major -> coordinate-major
    flatten, hand_network.py:290-292) is inverted.

Round-trip (export then import) is bit-exact — tests/test_torch_convert.py.
"""

from __future__ import annotations

import numpy as np

from .torch_convert import _iknet_input_perm


def _w(kernel, kind: str):
    """flax Dense kernel (in, out) -> torch weight of the given module kind."""
    w = np.asarray(kernel).T.copy()          # (out, in)
    if kind == "conv2d":
        return w[:, :, None, None]
    if kind == "conv1d":
        return w[:, :, None]
    return w                                  # linear


def _put_dense(sd, prefix, leaf, kind):
    sd[prefix + ".weight"] = _w(leaf["kernel"], kind)
    if "bias" in leaf:
        sd[prefix + ".bias"] = np.asarray(leaf["bias"])


def _put_bn(sd, prefix, p, s):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])
    sd[prefix + ".running_mean"] = np.asarray(s["mean"])
    sd[prefix + ".running_var"] = np.asarray(s["var"])
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _put_shared_mlp(sd, conv_prefix, bn_prefix, p, s, kind):
    n = sum(1 for k in p if k.startswith("Dense_"))
    for j in range(n):
        _put_dense(sd, f"{conv_prefix}.{j}", p[f"Dense_{j}"], kind)
        _put_bn(sd, f"{bn_prefix}.{j}", p[f"BatchNorm_{j}"],
                s[f"BatchNorm_{j}"])


def _put_msg_sa(sd, prefix, p, s):
    n = sum(1 for k in p if k.startswith("SharedMLP_"))
    for i in range(n):
        _put_shared_mlp(sd, f"{prefix}.conv_blocks.{i}",
                        f"{prefix}.bn_blocks.{i}",
                        p[f"SharedMLP_{i}"], s[f"SharedMLP_{i}"], "conv2d")


def _put_plain(sd, prefix, p, s, kind):
    _put_shared_mlp(sd, f"{prefix}.mlp_convs", f"{prefix}.mlp_bns",
                    p["SharedMLP_0"], s["SharedMLP_0"], kind)


def _put_layernorm(sd, prefix, leaf):
    sd[prefix + ".weight"] = np.asarray(leaf["scale"])
    sd[prefix + ".bias"] = np.asarray(leaf["bias"])


def _put_attn_module(sd, prefix, p):
    """FFN-mode attn_module (the shipped graph): norm1 + optional FFN.
    The torch module's MultiheadAttention weights are left absent — its
    attn=False forward never touches them and the reference loads
    checkpoints with strict=False (trainer.py:249).

    Attention-mode (use_attention=True) nets are NOT exportable: the
    strict=False load would silently leave the torch MultiheadAttention
    randomly initialized, so refuse rather than emit a wrong-predicting
    checkpoint."""
    extra = {k for k in p if k not in
             ("LayerNorm_0", "LayerNorm_1", "Dense_0", "Dense_1")}
    if extra:
        raise ValueError(
            f"attention-mode export is unsupported: {prefix} carries "
            f"non-FFN params {sorted(extra)} (e.g. use_attention=True "
            "MultiHeadDotProductAttention); the reference's strict=False "
            "load (trainer.py:249) would silently run random attention "
            "weights. Export only FFN-mode (default) nets.")
    _put_layernorm(sd, prefix + ".norm1", p["LayerNorm_0"])
    if "Dense_0" in p:
        _put_dense(sd, prefix + ".linear1", p["Dense_0"], "linear")
        _put_dense(sd, prefix + ".linear2", p["Dense_1"], "linear")
        _put_layernorm(sd, prefix + ".norm2", p["LayerNorm_1"])


def export_handtracknet(params: dict, batch_stats: dict) -> dict:
    """flax HandTrackNet (params, batch_stats) -> reference state dict
    (numpy values; FFN-mode — hand_network.py:139-140)."""
    sd = {}
    bp, bs = params["bhand"], batch_stats["bhand"]
    for name in ("sa1", "sa2"):
        _put_msg_sa(sd, f"bhand.{name}", bp[name], bs[name])
    _put_plain(sd, "bhand.sa3", bp["sa3"], bs["sa3"], "conv2d")
    for name in ("fp3", "fp2", "fp1"):
        _put_plain(sd, f"bhand.{name}", bp[name], bs[name], "conv1d")
    _put_dense(sd, "bhand.conv1", bp["conv1"], "conv1d")
    _put_bn(sd, "bhand.bn1", bp["bn1"], bs["bn1"])

    for name in ("q1", "q2"):
        _put_msg_sa(sd, name, params[name], batch_stats[name])

    for name in ("r1", "r2"):
        # rearrange_module.linear is a Conv1d (blocks.py rearrange_module)
        _put_dense(sd, f"{name}.linear", params[name]["Dense_0"], "conv1d")

    for i, tname in enumerate(("s11", "s12", "c11", "c12")):
        _put_attn_module(sd, f"transt.{tname}", params["transt"][f"AttnModule_{i}"])
    _put_attn_module(sd, "c3", params["c3"])

    _put_dense(sd, "final_mlp.0", params["final_mlp_0"], "conv1d")
    _put_dense(sd, "final_mlp.2", params["final_mlp_2"], "conv1d")
    return sd


def export_iknet(params: dict, batch_stats: dict) -> dict:
    """flax IKNet -> reference state dict, inverting the first-layer input
    permutation (kp-major flatten -> coordinate-major)."""
    sd = {}
    perm = _iknet_input_perm()
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    n_lin = sum(1 for k in params if k.startswith("linear_"))
    for i in range(n_lin):
        leaf = dict(params[f"linear_{i}"])
        if i == 0:
            leaf["kernel"] = np.asarray(leaf["kernel"])[inv]
        _put_dense(sd, f"linear.{i}", leaf, "linear")
        if f"bn_{i}" in params:
            _put_bn(sd, f"bn.{i}", params[f"bn_{i}"], batch_stats[f"bn_{i}"])
    return sd


def save_reference_checkpoint(path: str, handnet=None, iknet=None,
                              epoch: int = 0):
    """Write a reference-format .pt ({'model', 'epoch', 'iteration'},
    trainer.py:253-268). Pass flax variable dicts ({'params',
    'batch_stats'}): one network -> plain keys (single-model training
    ckpt); both -> 'handnet.'/'IKnet.' prefixes (tracking-graph ckpt,
    trainer.py:206-227)."""
    import torch

    def _sd(vars_, fn):
        return fn(vars_["params"], vars_.get("batch_stats", {}))

    if handnet is not None and iknet is not None:
        sd = {f"handnet.{k}": v
              for k, v in _sd(handnet, export_handtracknet).items()}
        sd.update({f"IKnet.{k}": v
                   for k, v in _sd(iknet, export_iknet).items()})
    elif handnet is not None:
        sd = _sd(handnet, export_handtracknet)
    elif iknet is not None:
        sd = _sd(iknet, export_iknet)
    else:
        raise ValueError("provide handnet and/or iknet variables")

    sd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
          if np.asarray(v).dtype != np.int64
          else torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    torch.save({"model": sd, "epoch": epoch, "iteration": 0}, path)
    return path
