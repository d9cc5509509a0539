"""Matplotlib debug visualization.

Parity: /root/reference/vis_utils.py — 3D scatter grids (plot3d_pts :48) and
hand keypoint skeleton rendering (hand_vis :185). Debug-only (matplotlib Agg);
gated imports so headless/benchmark runs never pay for it.
"""

from __future__ import annotations

import os

import numpy as np

# 21-kp skeleton edges: wrist -> each finger chain (thumb, index, middle,
# ring, pinky in the 21-kp convention)
HAND_EDGES = [(0, 1), (1, 2), (2, 3), (3, 4),
              (0, 5), (5, 6), (6, 7), (7, 8),
              (0, 9), (9, 10), (10, 11), (11, 12),
              (0, 13), (13, 14), (14, 15), (15, 16),
              (0, 17), (17, 18), (18, 19), (19, 20)]
FINGER_COLORS = ["tab:red", "tab:orange", "tab:green", "tab:blue", "tab:purple"]


def _axes3d(n, figsize=4.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(figsize * n, figsize))
    axes = [fig.add_subplot(1, n, i + 1, projection="3d") for i in range(n)]
    return fig, axes


def plot3d_pts(pts_groups, show_fig: bool = False, save_fig: bool = False,
               save_folder: str = "./debug", save_name: str = "plot",
               point_size: float = 2.0):
    """Scatter groups of point sets side by side (vis_utils.py:48-182 surface).

    pts_groups: list of subplots, each a list of (N, 3) arrays."""
    fig, axes = _axes3d(len(pts_groups))
    for ax, group in zip(axes, pts_groups):
        for pts in group:
            pts = np.asarray(pts).reshape(-1, 3)
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=point_size)
        ax.set_box_aspect((1, 1, 1))
    if save_fig:
        os.makedirs(save_folder, exist_ok=True)
        path = os.path.join(save_folder,
                            str(save_name).replace("/", "_") + ".png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
    if show_fig:  # pragma: no cover - interactive
        import matplotlib.pyplot as plt
        plt.show()
    _close(fig)
    return fig


def hand_vis(points, init_kp, pred_kp, gt_kp, show_fig: bool = False,
             save_fig: bool = False, save_folder: str = "./debug",
             save_name: str = "hand"):
    """Hand skeleton overlay: cloud + init/pred/gt keypoints with finger-wise
    coloring (vis_utils.py:185-281 surface)."""
    fig, axes = _axes3d(3)
    titles = ["init", "pred", "gt"]
    for ax, kp, title in zip(axes, [init_kp, pred_kp, gt_kp], titles):
        pts = np.asarray(points).reshape(-1, 3)
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1.5, c="gray", alpha=0.4)
        kp = np.asarray(kp).reshape(-1, 3)
        for e_idx, (a, b) in enumerate(HAND_EDGES):
            color = FINGER_COLORS[e_idx // 4]
            ax.plot([kp[a, 0], kp[b, 0]], [kp[a, 1], kp[b, 1]],
                    [kp[a, 2], kp[b, 2]], c=color, linewidth=1.5)
        ax.scatter(kp[:, 0], kp[:, 1], kp[:, 2], s=8, c="black")
        ax.set_title(title)
        ax.set_box_aspect((1, 1, 1))
    if save_fig:
        os.makedirs(save_folder, exist_ok=True)
        fig.savefig(os.path.join(save_folder,
                                 str(save_name).replace("/", "_") + ".png"),
                    dpi=120, bbox_inches="tight")
    if show_fig:  # pragma: no cover - interactive
        import matplotlib.pyplot as plt
        plt.show()
    _close(fig)
    return fig


def _close(fig):
    import matplotlib.pyplot as plt
    plt.close(fig)
