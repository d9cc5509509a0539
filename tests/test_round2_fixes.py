"""Round-2 fix coverage: config-keyed Procrustes solver, per-sequence kwargs
in sharded tracking, convert CLI override parsing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_solver_config_field(monkeypatch):
    """solve_hand_frame solver selection: explicit 'svd'/'horn' beat the env
    default; the models thread cfg network/procrustes_solver."""
    from hotrack_tpu.models.hand_utils import solve_hand_frame
    from hotrack_tpu.pose.procrustes import (
        solve_rot_and_trans,
        solve_rot_and_trans_fast,
    )
    from hotrack_tpu.models.hand_utils import handkp2palmkp

    rng = np.random.RandomState(0)
    tpl = jnp.asarray(rng.randn(2, 6, 3).astype(np.float32) * 0.05)
    kp = jnp.asarray(rng.randn(2, 21, 3).astype(np.float32) * 0.05)

    monkeypatch.delenv("HOTRACK_EXACT_PROCRUSTES", raising=False)
    svd = solve_hand_frame(tpl, kp, solver="svd")
    horn = solve_hand_frame(tpl, kp, solver="horn")
    auto = solve_hand_frame(tpl, kp)  # env unset -> horn
    np.testing.assert_array_equal(np.asarray(auto.rotation),
                                  np.asarray(horn.rotation))

    want_svd, _ = solve_rot_and_trans(tpl, handkp2palmkp(kp))
    want_horn, _ = solve_rot_and_trans_fast(tpl, handkp2palmkp(kp))
    np.testing.assert_array_equal(np.asarray(svd.rotation), np.asarray(want_svd))
    np.testing.assert_array_equal(np.asarray(horn.rotation), np.asarray(want_horn))

    monkeypatch.setenv("HOTRACK_EXACT_PROCRUSTES", "1")
    auto_svd = solve_hand_frame(tpl, kp)
    np.testing.assert_array_equal(np.asarray(auto_svd.rotation),
                                  np.asarray(svd.rotation))
    # explicit field overrides the env var
    still_horn = solve_hand_frame(tpl, kp, solver="horn")
    np.testing.assert_array_equal(np.asarray(still_horn.rotation),
                                  np.asarray(horn.rotation))

    with pytest.raises(ValueError):
        solve_hand_frame(tpl, kp, solver="bogus")


def test_trainer_threads_solver():
    from hotrack_tpu.train.trainer import Trainer

    cfg = {"network": {"type": "iknet", "procrustes_solver": "svd"},
           "pointnet": {"camera": {}}, "optimizer": "Adam",
           "learning_rate": 1e-3, "experiment_dir": "/tmp/solver_test"}
    tr = Trainer(cfg)
    assert tr.model.procrustes_solver == "svd"


def test_sharded_per_seq_kwargs(monkeypatch):
    """track_hand_sequences_sharded maps per_seq_kwargs on the sequence axis
    while plain kwargs replicate (a leading-S kwarg used to be silently
    passed whole into every sequence's call)."""
    from hotrack_tpu.track import hand as hand_mod

    s = 4
    recorded = {}

    def stub(handnet, variables, mano_model, frames, **kw):
        recorded["keys"] = sorted(kw)
        # per-seq kwarg must arrive sliced (no leading S axis); replicated
        # kwarg must arrive whole
        assert kw["seq_offset"].shape == (3,)
        assert kw["shared_const"].shape == (s, 3)
        return {"echo": frames["x"] + kw["seq_offset"]}

    monkeypatch.setattr(hand_mod, "track_hand_sequence", stub)

    x = jnp.arange(s * 3, dtype=jnp.float32).reshape(s, 3)
    offsets = jnp.asarray(np.arange(s * 3, dtype=np.float32).reshape(s, 3) * 10)
    shared = jnp.ones((s, 3))

    out = hand_mod.track_hand_sequences_sharded(
        None, {}, None, {"x": x},
        devices=jax.devices()[:4],
        per_seq_kwargs={"seq_offset": offsets},
        shared_const=shared)
    np.testing.assert_allclose(np.asarray(out["echo"]),
                               np.asarray(x + offsets))
    assert recorded["keys"] == ["seq_offset", "shared_const"]


def test_convert_override_parsing():
    """Dangling flags error out instead of IndexError; booleans parse."""
    from hotrack_tpu import convert as convert_cli

    with pytest.raises(SystemExit):
        convert_cli.main(["--ckpt", "/nonexistent.pt", "--config",
                          "handtracknet_test_SimGrasp.yml", "--dangling_flag"])
