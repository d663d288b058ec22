"""Camera-pose visualization: matplotlib frustum plots.

Replaces the reference's ``show_cam_pose`` open3d viewer
(dpt_runner.py:644-697), which imports a ``vis_cam_traj`` module absent from
its repo (the mode is broken there). Same content — learned vs initial vs GT
camera frustums — rendered headlessly to a PNG instead of an interactive
window.
"""

from __future__ import annotations

import numpy as np


def frustum_corners(
    c2w: np.ndarray, H: int, W: int, fx: float, length: float = 0.5
) -> np.ndarray:
    """World-space frustum points for one camera: [apex, tl, tr, br, bl].

    Pinhole geometry as in the reference's vis helper call
    (dpt_runner.py:640-642): image-plane half extents (W/2, H/2) / fx at
    depth ``length`` along +z (OpenCV convention), transformed by c2w.
    """
    hw = 0.5 * W / fx * length
    hh = 0.5 * H / fx * length
    pts_cam = np.array(
        [
            [0.0, 0.0, 0.0],
            [-hw, -hh, length],
            [hw, -hh, length],
            [hw, hh, length],
            [-hw, hh, length],
        ],
        dtype=np.float64,
    )
    return pts_cam @ c2w[:3, :3].T + c2w[:3, 3]


def plot_cam_poses(
    path: str,
    pose_sets: dict[str, np.ndarray],
    H: int,
    W: int,
    fx: float,
    length: float = 0.5,
) -> str:
    """Draw every pose set ({label: [N,4,4]}) as colored frustums -> PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")
    colors = {"learned": "tab:red", "init": "tab:blue", "gt": "tab:green"}
    edge_order = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    for i, (label, poses) in enumerate(pose_sets.items()):
        color = colors.get(label, f"C{i}")
        for c2w in np.asarray(poses):
            pts = frustum_corners(c2w, H, W, fx, length)
            for a, b in edge_order:
                ax.plot(
                    *zip(pts[a], pts[b]), color=color, linewidth=0.8,
                    alpha=0.8,
                )
        # one proxy artist per set for the legend
        ax.plot([], [], color=color, label=label)
    ax.scatter([0], [0], [0], color="k", s=12)  # scene origin (unit sphere)
    ax.set_box_aspect((1, 1, 1))
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
