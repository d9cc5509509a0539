"""Model-layer tests: backbone, HandTrackNet, IKNet.

The key semantic test is rigid-transform equivariance of HandTrackNet in the
'kp' hand frame: the palm-Procrustes canonicalization (hand_network.py:95-119)
makes the network's hand-frame inputs invariant to camera-frame rigid motions,
so predictions must transform covariantly. This is the property that makes the
tracker work and it exercises the whole stack (Procrustes + backbone + SA
queries + fusion heads).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hotrack_tpu.models import (
    HandTrackNet,
    IKNet,
    hand_tracknet_loss,
    iknet_loss,
    iknet_predict_kp,
)
from hotrack_tpu.mano import synthetic_mano_model, template_keypoints
from hotrack_tpu.models.hand_utils import handkp2palmkp
from hotrack_tpu.nn import PointNet2Msg, RearrangeModule
from hotrack_tpu.pose.rotations import rotvec_to_matrix

# shrunk pointnet config (same structure as
# configs/pointnet_config/pointnet2_camera_shallow1.yml) for fast CI compiles
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
OUT_DIM = 48  # divisible by 6
N_POINTS = 64


def _rand_inputs(b=2, seed=0):
    rng = np.random.RandomState(seed)
    points = jnp.asarray(rng.randn(b, N_POINTS, 3) * 0.05 + [0, 0, 0.5],
                         jnp.float32)
    kp = jnp.asarray(rng.randn(b, 21, 3) * 0.04 + [0, 0, 0.5], jnp.float32)
    return points, kp


@pytest.fixture(scope="module")
def handnet():
    model = HandTrackNet(net_cfg=NET_CFG, backbone_out_dim=OUT_DIM, handframe="kp")
    points, kp = _rand_inputs()
    palm = handkp2palmkp(kp)[0]  # (6, 3) template
    variables = model.init(jax.random.PRNGKey(0), points, kp, palm)
    return model, variables, palm


def test_backbone_shapes():
    model = PointNet2Msg(NET_CFG, OUT_DIM)
    points, _ = _rand_inputs()
    variables = model.init(jax.random.PRNGKey(0), points)
    out = model.apply(variables, points)
    assert out.shape == (2, N_POINTS, OUT_DIM)
    assert bool(jnp.all(jnp.isfinite(out)))
    # train mode must update batch_stats
    _, mutated = model.apply(variables, points, train=True,
                             mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_rearrange_shapes():
    m = RearrangeModule(channel=32)
    x = jnp.ones((2, 21, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (2, 21, 32)


def test_handtracknet_forward(handnet):
    model, variables, palm = handnet
    points, kp = _rand_inputs(seed=1)
    ret = model.apply(variables, points, kp, palm, compute_visibility=True)
    assert ret["pred_kp"].shape == (2, 21, 3)
    assert ret["pred_kp_vis_mask"].shape == (2, 21)
    assert bool(jnp.all(jnp.isfinite(ret["pred_kp"])))
    # decanonicalize(pred_kp_handframe) must invert canonicalize exactly
    from hotrack_tpu.models.hand_utils import canonicalize
    back = canonicalize(ret["pred_kp"], ret["canon_pose"])
    np.testing.assert_allclose(np.asarray(back),
                               np.asarray(ret["pred_kp_handframe"]), atol=1e-5)


def test_handtracknet_rigid_equivariance(handnet):
    """Rotate+translate the camera-frame inputs; predictions must follow."""
    model, variables, palm = handnet
    points, kp = _rand_inputs(seed=2)
    ret0 = model.apply(variables, points, kp, palm)

    rng = np.random.RandomState(3)
    r = rotvec_to_matrix(jnp.asarray(rng.randn(3) * 0.8, jnp.float32))
    t = jnp.asarray(rng.randn(3) * 0.3, jnp.float32)
    ret1 = model.apply(variables, points @ r.T + t, kp @ r.T + t, palm)

    expected = ret0["pred_kp"] @ r.T + t
    np.testing.assert_allclose(np.asarray(ret1["pred_kp"]),
                               np.asarray(expected), atol=2e-4)


def test_handtracknet_loss(handnet):
    model, variables, palm = handnet
    points, kp = _rand_inputs(seed=4)
    ret = model.apply(variables, points, kp, palm)
    gt_kp = kp + 0.01
    loss, ret = hand_tracknet_loss(ret, gt_kp, gt_palm_template=palm)
    for k in ["hand_pred_kp_loss", "hand_pred_kp_diff", "hand_init_kp_diff",
              "hand_pred_r_loss", "hand_pred_t_loss", "hand_pred_r_diff",
              "hand_pred_t_diff"]:
        assert k in loss and np.isfinite(float(loss[k])), k
    # perfect prediction -> zero kp diff
    ret_perfect = dict(ret)
    ret_perfect["pred_kp"] = gt_kp
    from hotrack_tpu.models.hand_utils import canonicalize
    ret_perfect["pred_kp_handframe"] = canonicalize(gt_kp, ret["canon_pose"])
    loss_p, _ = hand_tracknet_loss(ret_perfect, gt_kp, gt_palm_template=palm)
    assert float(loss_p["hand_pred_kp_diff"]) < 1e-6
    assert float(loss_p["hand_pred_r_diff"]) < 0.1  # degrees


def test_handtracknet_gradients(handnet):
    """A train step must produce finite grads for every parameter."""
    model, variables, palm = handnet
    points, kp = _rand_inputs(seed=5)
    gt_kp = kp + 0.005

    def loss_fn(params):
        ret, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            points, kp, palm, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(7)})
        loss, _ = hand_tracknet_loss(ret, gt_kp, gt_palm_template=palm)
        return (10.0 * loss["hand_pred_kp_loss"] + loss["hand_pred_r_loss"]
                + loss["hand_pred_t_loss"])

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_iknet_forward_and_mano():
    mano = synthetic_mano_model()
    model = IKNet()
    rng = np.random.RandomState(6)
    kp = jnp.asarray(rng.randn(2, 21, 3) * 0.04, jnp.float32)
    palm = template_keypoints(mano)[0][list((0, 1, 5, 9, 13, 17)), :]
    variables = model.init(jax.random.PRNGKey(1), kp, palm)
    ret = model.apply(variables, kp, palm)
    assert ret["raw_quat"].shape == (2, 60)
    assert ret["MANO_theta"].shape == (2, 45)

    beta = jnp.zeros((2, 10))
    pred_kp = iknet_predict_kp(mano, ret, beta)
    assert pred_kp.shape == (2, 21, 3)
    assert bool(jnp.all(jnp.isfinite(pred_kp)))

    gt_quat = jnp.asarray(rng.randn(2, 60), jnp.float32)
    loss, _ = iknet_loss(ret, gt_quat, kp)
    assert np.isfinite(float(loss["quat_loss"]))


def test_precomputed_indices_match_inscan(handnet):
    """Hoisted FPS/ball indices (computed on the raw cloud) must reproduce
    the in-module computation on the canonicalized cloud — rigid+fixed-scale
    invariance of distance-based index ops."""
    from hotrack_tpu.models.hand_network import precompute_backbone_indices
    model, variables, palm = handnet
    points, kp = _rand_inputs(seed=11)
    ret0 = model.apply(variables, points, kp, palm)
    pre = precompute_backbone_indices(NET_CFG, points)
    ret1 = model.apply(variables, points, kp, palm, pre_indices=pre)
    np.testing.assert_allclose(np.asarray(ret1["pred_kp"]),
                               np.asarray(ret0["pred_kp"]), atol=2e-4)


def test_batchnorm_compensated_stats_accuracy():
    """The defect-corrected batch statistics (nn/norm.py) must track the
    exact f64 normalization on the pathological input class that broke
    torch-parity: many duplicated rows (ball-query pad-with-first) giving
    near-constant channels whose 1/sqrt(var+eps) amplifies f32 stat error
    ~100-190x. A plain jnp.mean/var XLA reduction loses ~3e-5 on the mean
    here (-> ~3e-3 output error); the compensated stats stay at the 1e-5
    output class."""
    from hotrack_tpu.nn import BatchNorm

    rng = np.random.RandomState(0)
    # 64k positions, heavy duplication: 8 unique rows tiled 8192x + noise
    base = rng.randn(8, 32).astype(np.float32) * 0.01 + 3.0  # big common mode
    x = np.tile(base, (8192, 1))
    x += rng.randn(*x.shape).astype(np.float32) * 1e-3  # tiny channel var
    x = x.reshape(256, 256, 32)

    bn = BatchNorm()
    variables = {"params": {"scale": jnp.ones(32), "bias": jnp.zeros(32)},
                 "batch_stats": {"mean": jnp.zeros(32), "var": jnp.ones(32)}}
    y, st = bn.apply(variables, jnp.asarray(x), True, 0.1,
                     mutable=["batch_stats"])

    x64 = x.astype(np.float64).reshape(-1, 32)
    mu, var = x64.mean(0), x64.var(0)
    y64 = (x64 - mu) / np.sqrt(var + 1e-5)
    err = np.abs(np.asarray(y).reshape(-1, 32) - y64).max()
    assert err < 5e-5, err
    # running stats carry the same accuracy (torch convention, unbiased var)
    n = x64.shape[0]
    want_var = 0.9 * 1.0 + 0.1 * var * n / (n - 1)
    np.testing.assert_allclose(np.asarray(st["batch_stats"]["mean"]),
                               0.1 * mu, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st["batch_stats"]["var"]),
                               want_var, rtol=1e-5)
