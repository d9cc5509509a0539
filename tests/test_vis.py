"""Visualization helpers render without a display and write files."""

import os

import numpy as np

from hotrack_tpu.utils.vis import hand_vis, plot3d_pts
from hotrack_tpu.utils.dicts import dump_csv


def test_plot3d_pts(tmp_path):
    rng = np.random.RandomState(0)
    pts = [[rng.randn(50, 3), rng.randn(20, 3)], [rng.randn(30, 3)]]
    plot3d_pts(pts, save_fig=True, save_folder=str(tmp_path), save_name="p")
    assert os.path.exists(tmp_path / "p.png")


def test_hand_vis(tmp_path):
    rng = np.random.RandomState(1)
    points = rng.randn(100, 3) * 0.05
    kp = rng.randn(21, 3) * 0.04
    hand_vis(points, kp, kp + 0.01, kp - 0.01, save_fig=True,
             save_folder=str(tmp_path), save_name="h/a")
    assert os.path.exists(tmp_path / "h_a.png")


def test_dump_csv(tmp_path):
    path = str(tmp_path / "x.csv")
    dump_csv(path, {"a": [1, 2, 3], "b": np.array([0.5, 0.25, 0.125])})
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "a,b"
    assert len(lines) == 4


def test_debug_visualize_saves_figures(tmp_path):
    """--debug_save path: per-frame figures written under experiment_dir/debug."""
    import numpy as np
    from hotrack_tpu.track.types import HandTrackResult
    from hotrack_tpu.train.run_hand_track import _debug_visualize

    t = 3
    rng = np.random.default_rng(0)
    z = lambda *s: rng.standard_normal(s).astype("float32") * 0.05
    result = HandTrackResult(
        pred_kp=z(t, 21, 3), baseline_pred_kp=z(t, 21, 3),
        canon_rotation=np.tile(np.eye(3, dtype="float32"), (t, 1, 1)),
        canon_translation=np.zeros((t, 3, 1), "float32"),
        global_rotation=np.tile(np.eye(3, dtype="float32"), (t, 1, 1)),
        global_translation=np.zeros((t, 3, 1), "float32"),
        mano_theta=np.zeros((t, 45), "float32"),
        pred_beta=np.zeros((1, 10), "float32"))
    batch = {"hand_points": z(t, 64, 3), "gt_hand_kp": z(t, 21, 3),
             "jittered_hand_kp": z(t, 21, 3)}
    metas = [{"file_name": f"seq/{i:04d}"} for i in range(t)]
    cfg = {"experiment_dir": str(tmp_path), "debug_save": True}
    _debug_visualize(cfg, metas, result, batch)
    pngs = sorted((tmp_path / "debug").glob("*.png"))
    assert len(pngs) == t
