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
