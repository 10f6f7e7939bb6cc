"""Map / trajectory / factor-graph rendering — the Pangolin viewer, reborn.

The reference's optional viewer build renders live cones, the pose trail,
the current pose + heading ray, and pose->cone graph edges with immediate-
mode OpenGL on a Pangolin window (reference viewerbuild/src/drawer.cpp:22-118,
viewer.cpp:43-60). Here the same four layers render with matplotlib to a
window or PNG from a Slam instance, a SlamState, or a checkpoint file; the
live render-thread equivalent is `tpuslam.viz.LiveViewer` (`slamctl run
--viz-png` / `slamctl replay --viz-png`).

Cone colors by type follow the reference drawer (drawer.cpp:22-41):
1 = yellow, 2 = blue, 3/4 = orange.
"""
from __future__ import annotations

import numpy as np

CONE_COLORS = {0: "#888888", 1: "#e6c800", 2: "#1f4fd6", 3: "#ff8c1a",
               4: "#d95000"}


def _mpl():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def plot_state(state, ax=None, show_graph=True, show_poses=True,
               show_cones=True, show_current=True, gt_track=None):
    """Draw a SlamState (or stacked outputs) onto a matplotlib axes."""
    plt = _mpl()
    if ax is None:
        _, ax = plt.subplots(figsize=(8, 8))
    g = state.graph
    n_lm = int(g.n_landmarks)
    n_p = int(g.n_poses)
    lm = np.asarray(g.lm_xy)[:n_lm]
    lt = np.asarray(g.lm_type)[:n_lm]
    poses = np.asarray(g.poses)[:n_p]

    if gt_track is not None:
        ax.plot(gt_track.cones_xy[:, 0], gt_track.cones_xy[:, 1], "x",
                color="#cccccc", ms=4, label="ground-truth cones")

    if show_graph and n_p and n_lm:
        n_obs = int(g.n_obs)
        op = np.asarray(g.obs_pose)[:n_obs]
        ol = np.asarray(g.obs_lm)[:n_obs]
        for p_i, l_i in zip(op, ol):
            if p_i < n_p and l_i < n_lm:
                ax.plot([poses[p_i, 0], lm[l_i, 0]],
                        [poses[p_i, 1], lm[l_i, 1]],
                        color="#bbbbbb", lw=0.2, zorder=1)

    if show_poses and n_p:
        ax.plot(poses[:, 0], poses[:, 1], "-", color="#2a9d2a", lw=1.2,
                label="trajectory", zorder=2)

    if show_cones and n_lm:
        for t in sorted(set(lt.tolist())):
            sel = lt == t
            ax.plot(lm[sel, 0], lm[sel, 1], "o", ms=5,
                    color=CONE_COLORS.get(int(t), "#888888"),
                    label=f"type {t}", zorder=3)

    if show_current and n_p:
        cur = poses[-1]
        ax.plot(cur[0], cur[1], "r^", ms=10, zorder=4)
        ax.plot([cur[0], cur[0] + 2.5 * np.cos(cur[2])],
                [cur[1], cur[1] + 2.5 * np.sin(cur[2])], "r-", lw=2, zorder=4)

    ax.set_aspect("equal")
    ax.grid(alpha=0.3)
    ax.legend(loc="upper right", fontsize=8)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    return ax


def save_state_png(state, path: str, **kw):
    plt = _mpl()
    ax = plot_state(state, **kw)
    ax.figure.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(ax.figure)
    return path
