"""Torch-checkpoint converter tests.

Structure test: a synthetic torch-style state dict (built by inverting the
mapping) must convert into exactly the flax-initialized tree. Numeric tests:
real torch layers (Linear/BatchNorm/MultiheadAttention) produce the same
outputs as flax modules with converted weights, including the IKNet first
layer's flatten-order permutation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from hotrack_tpu.models import HandTrackNet, IKNet
from hotrack_tpu.models.hand_utils import handkp2palmkp
from hotrack_tpu.nn.transformer import AttnModule
from hotrack_tpu.utils.torch_convert import (
    _iknet_input_perm,
    convert_handtracknet,
    convert_iknet,
)

NET_CFG = {
    "sa1": {"npoint": 32, "radius_list": [0.1], "nsample_list": [8],
            "mlp_list": [[16, 16, 32]]},
    "sa2": {"npoint": 16, "radius_list": [0.2], "nsample_list": [8],
            "mlp_list": [[32, 32, 64]]},
    "sa3": {"mlp": [64, 64, 128]},
    "fp3": {"mlp": [64, 64]},
    "fp2": {"mlp": [64, 64]},
    "fp1": {"mlp": [64, 64]},
}
D = 48


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _torch_sd_from_flax(params, stats):
    """Inverse mapping: build a reference-style state dict from flax trees."""
    rng = np.random.RandomState(0)
    sd = {}

    def dense_to(prefix, p, conv=True):
        k = p["kernel"]
        w = k.T
        if conv:
            w = w[..., None]  # (out, in, 1)
        sd[prefix + ".weight"] = w.copy()
        sd[prefix + ".bias"] = p["bias"].copy()

    def bn_to(prefix, p, s):
        sd[prefix + ".weight"] = p["scale"].copy()
        sd[prefix + ".bias"] = p["bias"].copy()
        sd[prefix + ".running_mean"] = s["mean"].copy()
        sd[prefix + ".running_var"] = s["var"].copy()

    def shared_to(conv_prefix, bn_prefix, p, s):
        n = len([k for k in p if k.startswith("Dense_")])
        for j in range(n):
            dense_to(f"{conv_prefix}.{j}", p[f"Dense_{j}"])
            bn_to(f"{bn_prefix}.{j}", p[f"BatchNorm_{j}"], s[f"BatchNorm_{j}"])

    def msg_to(prefix, p, s):
        n = len([k for k in p if k.startswith("SharedMLP_")])
        for i in range(n):
            shared_to(f"{prefix}.conv_blocks.{i}", f"{prefix}.bn_blocks.{i}",
                      p[f"SharedMLP_{i}"], s[f"SharedMLP_{i}"])

    def plain_to(prefix, p, s):
        shared_to(f"{prefix}.mlp_convs", f"{prefix}.mlp_bns",
                  p["SharedMLP_0"], s["SharedMLP_0"])

    def attn_to(prefix, p):
        # the torch checkpoint carries (unused) attention weights even in
        # FFN mode; synthesize them — the converter must skip them
        d = p["LayerNorm_0"]["scale"].shape[0]
        sd[prefix + ".attn.in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32)
        sd[prefix + ".attn.in_proj_bias"] = rng.randn(3 * d).astype(np.float32)
        sd[prefix + ".attn.out_proj.weight"] = rng.randn(d, d).astype(np.float32)
        sd[prefix + ".attn.out_proj.bias"] = rng.randn(d).astype(np.float32)
        sd[prefix + ".norm1.weight"] = p["LayerNorm_0"]["scale"].copy()
        sd[prefix + ".norm1.bias"] = p["LayerNorm_0"]["bias"].copy()
        if "Dense_0" in p:
            dense_to(prefix + ".linear1", p["Dense_0"], conv=False)
            dense_to(prefix + ".linear2", p["Dense_1"], conv=False)
            sd[prefix + ".norm2.weight"] = p["LayerNorm_1"]["scale"].copy()
            sd[prefix + ".norm2.bias"] = p["LayerNorm_1"]["bias"].copy()

    bp, bs = params["bhand"], stats["bhand"]
    for n in ("sa1", "sa2"):
        msg_to(f"bhand.{n}", bp[n], bs[n])
    for n in ("sa3", "fp3", "fp2", "fp1"):
        plain_to(f"bhand.{n}", bp[n], bs[n])
    dense_to("bhand.conv1", bp["conv1"])
    bn_to("bhand.bn1", bp["bn1"], bs["bn1"])
    for n in ("q1", "q2"):
        msg_to(n, params[n], stats[n])
    dense_to("r1.linear", params["r1"]["Dense_0"])
    dense_to("r2.linear", params["r2"]["Dense_0"])
    for i, tname in enumerate(("s11", "s12", "c11", "c12")):
        attn_to(f"transt.{tname}", params["transt"][f"AttnModule_{i}"])
    attn_to("c3", params["c3"])
    dense_to("final_mlp.0", params["final_mlp_0"])
    dense_to("final_mlp.2", params["final_mlp_2"])
    return sd


def test_handtracknet_roundtrip():
    model = HandTrackNet(net_cfg=NET_CFG, backbone_out_dim=D, handframe="kp")
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 64, 3), jnp.float32) * 0.05
    kp = jnp.asarray(rng.randn(2, 21, 3), jnp.float32) * 0.04
    variables = model.init(jax.random.PRNGKey(0), pts, kp, handkp2palmkp(kp)[0])
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = _torch_sd_from_flax(params, stats)
    # q mlps in the converter use d_model//2 head widths
    conv_params, conv_stats = convert_handtracknet(sd, NET_CFG, d_model=D)

    want_p, got_p = _flatten(params), _flatten(conv_params)
    assert set(want_p) == set(got_p), (
        set(want_p) ^ set(got_p))
    for k in want_p:
        np.testing.assert_allclose(got_p[k], want_p[k], atol=1e-6, err_msg=str(k))
    want_s, got_s = _flatten(stats), _flatten(conv_stats)
    assert set(want_s) == set(got_s)
    for k in want_s:
        np.testing.assert_allclose(got_s[k], want_s[k], atol=1e-6)


def test_mha_numeric_equivalence():
    """torch nn.MultiheadAttention == flax MHA with converted weights."""
    d, b, n, m = 48, 2, 5, 7
    torch.manual_seed(0)
    t_attn = torch.nn.MultiheadAttention(d, 8, dropout=0.0).eval()
    sd = {"m.attn." + k: v.detach().numpy() for k, v in
          t_attn.state_dict().items()}
    sd["m.norm1.weight"] = np.ones(d, np.float32)
    sd["m.norm1.bias"] = np.zeros(d, np.float32)
    from hotrack_tpu.utils.torch_convert import _attn_module
    params = _attn_module(sd, "m", d, no_linear=True)
    module = AttnModule(d_model=d, no_linear=True, dropout=0.0)

    rng = np.random.RandomState(2)
    q = rng.randn(b, n, d).astype(np.float32)
    kv = rng.randn(b, m, d).astype(np.float32)

    with torch.no_grad():
        t_out, _ = t_attn(torch.tensor(q).permute(1, 0, 2),
                          torch.tensor(kv).permute(1, 0, 2),
                          torch.tensor(kv).permute(1, 0, 2))
        t_out = t_out.permute(1, 0, 2).numpy()

    # flax AttnModule with attn=True and zero pos embeddings: src1 + attn(out)
    # then LayerNorm. To isolate MHA, compare the residual branch pre-norm:
    out = module.apply({"params": params}, jnp.asarray(q), None,
                       jnp.asarray(kv), None, attn=True, train=False)
    # reproduce the same post-processing on the torch side
    expect = q + t_out
    mean = expect.mean(-1, keepdims=True)
    var = expect.var(-1, keepdims=True)
    expect = (expect - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-3)


def test_iknet_perm_numeric():
    """First-layer permutation: torch coordinate-major == flax kp-major."""
    rng = np.random.RandomState(3)
    w = rng.randn(32, 126).astype(np.float32)
    kp = rng.randn(4, 21, 3).astype(np.float32)
    bones = rng.randn(4, 21, 3).astype(np.float32)

    x_torch = np.concatenate([kp.transpose(0, 2, 1).reshape(4, -1),
                              bones.transpose(0, 2, 1).reshape(4, -1)], -1)
    want = x_torch @ w.T

    perm = _iknet_input_perm()
    kernel = w.T[perm]
    x_flax = np.concatenate([kp.reshape(4, -1), bones.reshape(4, -1)], -1)
    got = x_flax @ kernel
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iknet_structure_roundtrip():
    model = IKNet()
    rng = np.random.RandomState(4)
    kp = jnp.asarray(rng.randn(2, 21, 3), jnp.float32) * 0.04
    variables = model.init(jax.random.PRNGKey(0), kp, handkp2palmkp(kp)[0:1][0])
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = {}
    perm = _iknet_input_perm()
    inv = np.argsort(perm)
    for i in range(7):
        k = params[f"linear_{i}"]["kernel"]
        if i == 0:
            k = k[inv]
        sd[f"linear.{i}.weight"] = k.T.copy()
        sd[f"linear.{i}.bias"] = params[f"linear_{i}"]["bias"].copy()
        if i < 6:
            sd[f"bn.{i}.weight"] = params[f"bn_{i}"]["scale"].copy()
            sd[f"bn.{i}.bias"] = params[f"bn_{i}"]["bias"].copy()
            sd[f"bn.{i}.running_mean"] = stats[f"bn_{i}"]["mean"].copy()
            sd[f"bn.{i}.running_var"] = stats[f"bn_{i}"]["var"].copy()

    conv_p, conv_s = convert_iknet(sd)
    want_p, got_p = _flatten(params), _flatten(conv_p)
    assert set(want_p) == set(got_p)
    for k in want_p:
        np.testing.assert_allclose(got_p[k], want_p[k], atol=1e-6, err_msg=str(k))


def test_export_roundtrip_handtracknet():
    """Export (flax -> torch sd) then import must be bit-exact, and every
    exported tensor must carry the REAL torch module's shape (Conv2d in SA
    blocks, Conv1d in FP/conv1/final_mlp, Linear elsewhere)."""
    from hotrack_tpu.utils.torch_export import export_handtracknet

    model = HandTrackNet(net_cfg=NET_CFG, backbone_out_dim=D, handframe="kp")
    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.randn(2, 64, 3), jnp.float32) * 0.05
    kp = jnp.asarray(rng.randn(2, 21, 3), jnp.float32) * 0.04
    variables = model.init(jax.random.PRNGKey(1), pts, kp, handkp2palmkp(kp)[0])
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = export_handtracknet(params, stats)
    # module-kind shape contract (pointnet_utils.py:204,260; hand_network.py)
    assert sd["bhand.sa1.conv_blocks.0.0.weight"].ndim == 4   # Conv2d
    assert sd["bhand.sa3.mlp_convs.0.weight"].ndim == 4       # Conv2d
    assert sd["bhand.fp1.mlp_convs.0.weight"].ndim == 3       # Conv1d
    assert sd["bhand.conv1.weight"].ndim == 3                 # Conv1d
    assert sd["final_mlp.0.weight"].ndim == 3                 # Conv1d
    assert sd["r1.linear.weight"].ndim == 3                   # Conv1d
    assert sd["transt.c11.linear1.weight"].ndim == 2          # Linear

    conv_p, conv_s = convert_handtracknet(sd, NET_CFG, d_model=D)
    want_p, got_p = _flatten(params), _flatten(conv_p)
    assert set(want_p) == set(got_p)
    for k in want_p:
        np.testing.assert_array_equal(got_p[k], want_p[k], err_msg=str(k))
    want_s, got_s = _flatten(stats), _flatten(conv_s)
    assert set(want_s) == set(got_s)
    for k in want_s:
        np.testing.assert_array_equal(got_s[k], want_s[k])


def test_export_roundtrip_iknet():
    from hotrack_tpu.utils.torch_export import export_iknet

    model = IKNet()
    rng = np.random.RandomState(8)
    kp = jnp.asarray(rng.randn(2, 21, 3), jnp.float32) * 0.04
    variables = model.init(jax.random.PRNGKey(2), kp,
                           handkp2palmkp(kp)[0:1][0])
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = export_iknet(params, stats)
    conv_p, conv_s = convert_iknet(sd)
    want_p, got_p = _flatten(params), _flatten(conv_p)
    assert set(want_p) == set(got_p)
    for k in want_p:
        np.testing.assert_array_equal(got_p[k], want_p[k], err_msg=str(k))
    for k in _flatten(stats):
        np.testing.assert_array_equal(_flatten(conv_s)[k], _flatten(stats)[k])


def test_export_attention_mode_refused():
    """use_attention=True nets must be refused by the exporter: the
    reference's strict=False resume (trainer.py:249) would silently run
    randomly-initialized MultiheadAttention weights (ADVICE r4)."""
    from hotrack_tpu.utils.torch_export import export_handtracknet

    model = HandTrackNet(net_cfg=NET_CFG, backbone_out_dim=D, handframe="kp",
                         use_attention=True)
    rng = np.random.RandomState(11)
    pts = jnp.asarray(rng.randn(1, 64, 3), jnp.float32) * 0.05
    kp = jnp.asarray(rng.randn(1, 21, 3), jnp.float32) * 0.04
    variables = model.init(jax.random.PRNGKey(5), pts, kp,
                           handkp2palmkp(kp)[0])
    with pytest.raises(ValueError, match="attention-mode"):
        export_handtracknet(jax.tree.map(np.asarray, variables["params"]),
                            jax.tree.map(np.asarray,
                                         variables["batch_stats"]))


def test_export_checkpoint_file(tmp_path):
    """save_reference_checkpoint writes a composed .pt the import CLI's
    loader round-trips (handnet.+IKnet. prefixes, trainer.py:206-227)."""
    from hotrack_tpu.utils.torch_convert import load_reference_checkpoint
    from hotrack_tpu.utils.torch_export import save_reference_checkpoint

    hmodel = HandTrackNet(net_cfg=NET_CFG, backbone_out_dim=D, handframe="kp")
    rng = np.random.RandomState(9)
    pts = jnp.asarray(rng.randn(1, 64, 3), jnp.float32) * 0.05
    kp = jnp.asarray(rng.randn(1, 21, 3), jnp.float32) * 0.04
    hvars = hmodel.init(jax.random.PRNGKey(3), pts, kp, handkp2palmkp(kp)[0])
    ivars = IKNet().init(jax.random.PRNGKey(4), kp, handkp2palmkp(kp)[0])

    path = save_reference_checkpoint(
        str(tmp_path / "model_0001.pt"),
        handnet={"params": jax.tree.map(np.asarray, hvars["params"]),
                 "batch_stats": jax.tree.map(np.asarray, hvars["batch_stats"])},
        iknet={"params": jax.tree.map(np.asarray, ivars["params"]),
               "batch_stats": jax.tree.map(np.asarray, ivars["batch_stats"])},
        epoch=1)
    out = load_reference_checkpoint(path, NET_CFG, d_model=D)
    assert set(out) == {"handnet", "iknet"}
    got = _flatten(out["handnet"]["params"])
    want = _flatten(jax.tree.map(np.asarray, hvars["params"]))
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=str(k))


def test_convert_cli_roundtrip(tmp_path, monkeypatch):
    """python -m hotrack_tpu.convert: a composed handnet.+IKnet. reference
    checkpoint converts into two orbax checkpoints that Trainer.resume loads
    with the exact converted weights."""
    from hotrack_tpu import convert as convert_cli
    from hotrack_tpu.train.trainer import Trainer

    monkeypatch.setenv("HOTRACK_DATA_ROOT", str(tmp_path))

    # build a reference-style composed state dict from freshly-initialized
    # flax models (inverse mapping), stamp epoch 7
    model = HandTrackNet(net_cfg=NET_CFG, backbone_out_dim=D, handframe="kp")
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.randn(1, 64, 3), jnp.float32) * 0.05
    kp = jnp.asarray(rng.randn(1, 21, 3), jnp.float32) * 0.04
    hv = model.init(jax.random.PRNGKey(0), pts, kp, handkp2palmkp(kp)[0])
    hand_sd = _torch_sd_from_flax(jax.tree.map(np.asarray, hv["params"]),
                                  jax.tree.map(np.asarray, hv["batch_stats"]))

    ik = IKNet()
    iv = ik.init(jax.random.PRNGKey(1), kp, handkp2palmkp(kp))
    ik_p = jax.tree.map(np.asarray, iv["params"])
    ik_s = jax.tree.map(np.asarray, iv["batch_stats"])
    perm = _iknet_input_perm()
    inv_perm = np.argsort(perm)
    ik_sd = {}
    for i in range(7):
        w = ik_p[f"linear_{i}"]["kernel"]
        if i == 0:
            w = w[inv_perm]
        ik_sd[f"linear.{i}.weight"] = torch.tensor(np.ascontiguousarray(w.T))
        ik_sd[f"linear.{i}.bias"] = torch.tensor(ik_p[f"linear_{i}"]["bias"])
        if i < 6:
            ik_sd[f"bn.{i}.weight"] = torch.tensor(ik_p[f"bn_{i}"]["scale"])
            ik_sd[f"bn.{i}.bias"] = torch.tensor(ik_p[f"bn_{i}"]["bias"])
            ik_sd[f"bn.{i}.running_mean"] = torch.tensor(ik_s[f"bn_{i}"]["mean"])
            ik_sd[f"bn.{i}.running_var"] = torch.tensor(ik_s[f"bn_{i}"]["var"])

    sd = {f"handnet.{k}": (torch.tensor(v) if not torch.is_tensor(v) else v)
          for k, v in hand_sd.items()}
    sd.update({f"IKnet.{k}": v for k, v in ik_sd.items()})
    pt_path = tmp_path / "model_0007.pt"
    torch.save({"epoch": 7, "model": sd}, pt_path)

    written = convert_cli.main([
        "--ckpt", str(pt_path), "--config", "handtracknet_test_SimGrasp.yml",
        "--experiment_dir", "conv_htn", "--IKNet_dir", "conv_ik",
        "--num_points", "64", "--network/backbone_out_dim", str(D),
        "--pointnet_cfg/camera", "pointnet2_tiny.yml"])
    assert len(written) == 2

    # resume both and compare against the source flax trees
    from hotrack_tpu.config import get_config
    cfg = get_config({"config": "handtracknet_test_SimGrasp.yml",
                      "experiment_dir": "conv_htn", "num_points": 64,
                      "network/backbone_out_dim": D,
                      "pointnet_cfg/camera": "pointnet2_tiny.yml"}, save=False)
    tr = Trainer(cfg)
    batch = {"hand_points": pts, "jittered_hand_kp": kp, "gt_hand_kp": kp,
             "gt_hand_pose": {"palm_template": handkp2palmkp(kp)}}
    tr.init_state(batch)
    assert tr.resume()
    assert int(tr.state.epoch) == 7
    want, got = _flatten(jax.tree.map(np.asarray, hv["params"])), _flatten(
        jax.tree.map(np.asarray, tr.state.params))
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6, err_msg=str(k))


def test_export_cli(tmp_path, monkeypatch):
    """python -m hotrack_tpu.convert --export: trained orbax checkpoints
    (handnet + iknet experiment dirs) compose into one reference-format .pt
    whose weights import back bit-exactly."""
    from hotrack_tpu import convert as convert_cli
    from hotrack_tpu.config import get_config
    from hotrack_tpu.train.trainer import Trainer
    from hotrack_tpu.utils.torch_convert import load_reference_checkpoint

    monkeypatch.setenv("HOTRACK_DATA_ROOT", str(tmp_path))
    overrides = {"num_points": 64, "network/backbone_out_dim": D,
                 "pointnet_cfg/camera": "pointnet2_tiny.yml"}

    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(1, 64, 3), jnp.float32) * 0.05
    kp = jnp.asarray(rng.randn(1, 21, 3), jnp.float32) * 0.04
    batch = {"hand_points": pts, "jittered_hand_kp": kp, "gt_hand_kp": kp,
             "gt_hand_pose": {"palm_template": handkp2palmkp(kp)}}

    trees = {}
    for net_type, exp in (("HandTrackNet", "exp_htn"), ("iknet", "exp_ik")):
        cfg = get_config({"config": "handtracknet_test_SimGrasp.yml",
                          "experiment_dir": exp, **overrides}, save=False)
        cfg["network"] = dict(cfg["network"], type=net_type)
        tr = Trainer(cfg)
        tr.init_state(batch, seed=1 if net_type == "iknet" else 0)
        tr.state = tr.state._replace(epoch=jnp.asarray(9))
        tr.save()
        trees[net_type] = jax.tree.map(np.asarray, tr.state.params)

    out = tmp_path / "exported.pt"
    written = convert_cli.main([
        "--export", str(out), "--config", "handtracknet_test_SimGrasp.yml",
        "--experiment_dir", "exp_htn", "--IKNet_dir", "exp_ik",
        "--num_points", "64", "--network/backbone_out_dim", str(D),
        "--pointnet_cfg/camera", "pointnet2_tiny.yml"])
    assert written == [str(out)]

    raw = torch.load(out, weights_only=True)
    assert raw["epoch"] == 9
    nets = load_reference_checkpoint(raw, NET_CFG, d_model=D)
    assert set(nets) == {"handnet", "iknet"}
    for net_type, key in (("HandTrackNet", "handnet"), ("iknet", "iknet")):
        want = _flatten(trees[net_type])
        got = _flatten(jax.tree.map(np.asarray, nets[key]["params"]))
        assert set(want) == set(got)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=str(k))
