"""PyTorch reference checkpoint -> flax variables converter.

Maps the reference's released .pt state dicts (network/trainer.py:253-268
save format: {'model': state_dict, 'epoch', ...}; tracking checkpoints carry
'handnet.'/'IKnet.' prefixes, trainer.py:206-227) onto this package's flax
param/batch_stats trees.

Layout translations:
  - torch Conv1d/Conv2d(kernel=1) weight (out, in, 1[, 1]) -> Dense kernel
    (in, out): squeeze + transpose;
  - torch BatchNorm {weight, bias, running_mean, running_var} ->
    params {scale, bias} + batch_stats {mean, var};
  - torch MultiheadAttention in_proj_weight (3d, d) -> flax
    MultiHeadDotProductAttention query/key/value kernels (d, heads, head_dim),
    out_proj (d, d) -> out kernel (heads, head_dim, d);
  - IKNet's first Linear consumes a coordinate-major flatten of (B, 3, 21)
    (hand_network.py:292); this package flattens kp-major from (B, 21, 3), so
    the first layer's input rows are permuted accordingly.
"""

from __future__ import annotations

import numpy as np

N_HEADS = 8  # attn_module nhead (transformer.py:32)


def _dense(w, b=None):
    out = {"kernel": np.asarray(w).squeeze().T.copy()}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[prefix + ".weight"]),
              "bias": np.asarray(sd[prefix + ".bias"])}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"]),
             "var": np.asarray(sd[prefix + ".running_var"])}
    return params, stats


def _shared_mlp(sd, conv_prefix, bn_prefix, n_layers):
    """conv_blocks.{j}/bn_blocks.{j} (or mlp_convs/mlp_bns) -> SharedMLP."""
    params, stats = {}, {}
    for j in range(n_layers):
        params[f"Dense_{j}"] = _dense(sd[f"{conv_prefix}.{j}.weight"],
                                      sd[f"{conv_prefix}.{j}.bias"])
        p, s = _bn(sd, f"{bn_prefix}.{j}")
        params[f"BatchNorm_{j}"] = p
        stats[f"BatchNorm_{j}"] = s
    return params, stats


def _msg_sa(sd, prefix, mlp_list):
    """PointNetSetAbstractionMsg(_fast) -> SetAbstractionMsg."""
    params, stats = {}, {}
    for s_idx, mlp in enumerate(mlp_list):
        p, st = _shared_mlp(sd, f"{prefix}.conv_blocks.{s_idx}",
                            f"{prefix}.bn_blocks.{s_idx}", len(mlp))
        params[f"SharedMLP_{s_idx}"] = p
        stats[f"SharedMLP_{s_idx}"] = st
    return params, stats


def _plain_sa_or_fp(sd, prefix, n_layers):
    """PointNetSetAbstraction / FeaturePropagation -> SharedMLP_0."""
    p, st = _shared_mlp(sd, f"{prefix}.mlp_convs", f"{prefix}.mlp_bns", n_layers)
    return {"SharedMLP_0": p}, {"SharedMLP_0": st}


def _layernorm(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _mha(sd, prefix, d_model):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    head = d_model // N_HEADS
    in_w = np.asarray(sd[prefix + ".in_proj_weight"])   # (3d, d)
    in_b = np.asarray(sd[prefix + ".in_proj_bias"])     # (3d,)
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        w = in_w[i * d_model:(i + 1) * d_model]          # (d, d), y = x W^T
        out[name] = {"kernel": w.T.reshape(d_model, N_HEADS, head).copy(),
                     "bias": in_b[i * d_model:(i + 1) * d_model]
                     .reshape(N_HEADS, head).copy()}
    ow = np.asarray(sd[prefix + ".out_proj.weight"])     # (d, d)
    out["out"] = {"kernel": ow.T.reshape(N_HEADS, head, d_model).copy(),
                  "bias": np.asarray(sd[prefix + ".out_proj.bias"])}
    return out


def _attn_module(sd, prefix, d_model, no_linear, include_attention=True):
    """include_attention=False matches FFN-mode flax trees: modules called
    with attn=False never execute the MHA, so flax creates no params for it
    (the torch checkpoint still carries the unused weights)."""
    params = {"LayerNorm_0": _layernorm(sd, prefix + ".norm1")}
    if include_attention:
        params["MultiHeadDotProductAttention_0"] = _mha(sd, prefix + ".attn",
                                                        d_model)
    if not no_linear:
        params["Dense_0"] = _dense(sd[prefix + ".linear1.weight"],
                                   sd[prefix + ".linear1.bias"])
        params["Dense_1"] = _dense(sd[prefix + ".linear2.weight"],
                                   sd[prefix + ".linear2.bias"])
        params["LayerNorm_1"] = _layernorm(sd, prefix + ".norm2")
    return params


def convert_handtracknet(sd: dict, net_cfg: dict, d_model: int = 384,
                         include_attention: bool = False):
    """Reference HandTrackNet state dict -> (params, batch_stats) trees.

    `net_cfg` is the pointnet config (for per-layer mlp list lengths).
    include_attention=False (default) targets the shipped FFN-mode graph
    (hand_network.py:139-140 passes attn=False, so the flax tree has no MHA
    params); set True only for attention-enabled variants."""
    params, stats = {}, {}

    bp, bs = {}, {}
    for name in ("sa1", "sa2"):
        p, st = _msg_sa(sd, f"bhand.{name}", net_cfg[name]["mlp_list"])
        bp[name], bs[name] = p, st
    p, st = _plain_sa_or_fp(sd, "bhand.sa3", len(net_cfg["sa3"]["mlp"]))
    bp["sa3"], bs["sa3"] = p, st
    for name in ("fp3", "fp2", "fp1"):
        p, st = _plain_sa_or_fp(sd, f"bhand.{name}", len(net_cfg[name]["mlp"]))
        bp[name], bs[name] = p, st
    bp["conv1"] = _dense(sd["bhand.conv1.weight"], sd["bhand.conv1.bias"])
    p, st = _bn(sd, "bhand.bn1")
    bp["bn1"], bs["bn1"] = p, st
    params["bhand"], stats["bhand"] = bp, bs

    q_mlps = [[128, 128, d_model // 2], [128, 128, d_model // 2]]
    for name in ("q1", "q2"):
        p, st = _msg_sa(sd, name, q_mlps)
        params[name], stats[name] = p, st

    for flax_name, torch_name in (("r1", "r1"), ("r2", "r2")):
        params[flax_name] = {"Dense_0": _dense(sd[f"{torch_name}.linear.weight"],
                                               sd[f"{torch_name}.linear.bias"])}

    tp = {}
    for i, (tname, no_lin) in enumerate(
            (("s11", True), ("s12", True), ("c11", False), ("c12", False))):
        tp[f"AttnModule_{i}"] = _attn_module(sd, f"transt.{tname}", d_model,
                                             no_lin, include_attention)
    params["transt"] = tp
    params["c3"] = _attn_module(sd, "c3", d_model, no_linear=False,
                                include_attention=include_attention)

    params["final_mlp_0"] = _dense(sd["final_mlp.0.weight"], sd["final_mlp.0.bias"])
    params["final_mlp_2"] = _dense(sd["final_mlp.2.weight"], sd["final_mlp.2.bias"])
    return params, stats


def _iknet_input_perm():
    """Column permutation mapping this package's kp-major flatten onto the
    reference's coordinate-major flatten (hand_network.py:290-292)."""
    perm = np.zeros(126, np.int64)
    for half in (0, 1):
        for i in range(21):
            for c in range(3):
                perm[half * 63 + i * 3 + c] = half * 63 + c * 21 + i
    return perm


def convert_iknet(sd: dict, layer_num: int = 6):
    params, stats = {}, {}
    perm = _iknet_input_perm()
    for i in range(layer_num):
        d = _dense(sd[f"linear.{i}.weight"], sd[f"linear.{i}.bias"])
        if i == 0:
            d["kernel"] = d["kernel"][perm]
        params[f"linear_{i}"] = d
        p, s = _bn(sd, f"bn.{i}")
        params[f"bn_{i}"], stats[f"bn_{i}"] = p, s
    params[f"linear_{layer_num}"] = _dense(sd[f"linear.{layer_num}.weight"],
                                           sd[f"linear.{layer_num}.bias"])
    return params, stats


def split_prefixed(sd: dict, prefix: str) -> dict:
    """Extract 'handnet.'/'IKnet.'-prefixed sub-dicts (trainer.py:206-227)."""
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def load_reference_checkpoint(path_or_ckpt, net_cfg: dict, d_model: int = 384):
    """Load a reference .pt checkpoint (path, or an already-loaded checkpoint
    dict) and return flax variable dicts:
    {'handnet': {'params', 'batch_stats'}, 'iknet': {...} (if present)}."""
    if isinstance(path_or_ckpt, str):
        import torch
        try:
            ckpt = torch.load(path_or_ckpt, map_location="cpu",
                              weights_only=True)
        except TypeError:
            ckpt = torch.load(path_or_ckpt, map_location="cpu")
    else:
        ckpt = path_or_ckpt
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    out = {}
    hand_sd = split_prefixed(sd, "handnet.") or sd
    if any(k.startswith("bhand.") for k in hand_sd):
        p, s = convert_handtracknet(hand_sd, net_cfg, d_model)
        out["handnet"] = {"params": p, "batch_stats": s}
    ik_sd = split_prefixed(sd, "IKnet.")
    if not ik_sd and any(k.startswith("linear.") for k in sd):
        ik_sd = sd
    if ik_sd:
        p, s = convert_iknet(ik_sd)
        out["iknet"] = {"params": p, "batch_stats": s}
    return out
