"""Skeleton / rollout visualization (matplotlib, headless-safe).

Counterpart of poselib's plotter stack
(/root/reference/pacer/poselib/poselib/visualization/*) and the reference's
qualitative video observability (base_task.py:799-844 save_video with reward
overlays): draws skeleton states, animates rollouts to GIF/MP4, overlays
per-frame reward text.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from . import body_model as bm


def _bones(tree):
    return [(int(tree.parents[j]), j) for j in range(1, tree.num_joints)]


def plot_skeleton_state(ax, joint_pos: np.ndarray, tree=None, color="tab:blue"):
    """joint_pos (J, 3) world positions → 3D line plot on `ax`."""
    if tree is None:
        tree = bm.canonical_skeleton()
    for p, c in _bones(tree):
        xs = [joint_pos[p, 0], joint_pos[c, 0]]
        ys = [joint_pos[p, 1], joint_pos[c, 1]]
        zs = [joint_pos[p, 2], joint_pos[c, 2]]
        ax.plot(xs, ys, zs, color=color, linewidth=2)
    ax.scatter(joint_pos[:, 0], joint_pos[:, 1], joint_pos[:, 2], s=8,
               color=color)


def animate_rollout(
    body_pos_frames: np.ndarray,        # (T, J, 3)
    out_path: str = "rollout.gif",
    tree=None,
    rewards: Optional[np.ndarray] = None,
    traj: Optional[np.ndarray] = None,  # (V, 3) target trajectory
    fps: int = 15,
    elev: float = 20.0,
    azim: float = -60.0,
    reward_labels: Optional[list] = None,  # per-frame component strings
):
    """Render a rollout to GIF (reward overlay like the reference's
    env_save_video)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    if tree is None:
        tree = bm.canonical_skeleton()
    frames = np.asarray(body_pos_frames)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")

    def draw(t):
        ax.cla()
        if traj is not None:
            ax.plot(traj[:, 0], traj[:, 1], traj[:, 2] * 0,
                    color="tab:red", linewidth=1, alpha=0.6)
        plot_skeleton_state(ax, frames[t], tree)
        c = frames[t, 0]
        ax.set_xlim(c[0] - 2, c[0] + 2)
        ax.set_ylim(c[1] - 2, c[1] + 2)
        ax.set_zlim(0, 2.2)
        ax.view_init(elev=elev, azim=azim)
        title = f"t={t}"
        if reward_labels is not None:
            # per-step reward component overlay (reference env_save_video,
            # base_task.py:799-844)
            title += "\n" + reward_labels[t]
        elif rewards is not None:
            title += f"  r={float(rewards[t]):+.3f}"
        ax.set_title(title, fontsize=9)

    anim = animation.FuncAnimation(fig, draw, frames=len(frames),
                                   interval=1000 / fps)
    anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path


def plot_heightmap(heights: np.ndarray, out_path: Optional[str] = None):
    """Sensor/terrain debug plot (reference flags.height_debug live plotter,
    humanoid_pedestrain_terrain.py:417-425)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(np.asarray(heights), cmap="terrain")
    fig.colorbar(im, ax=ax)
    if out_path:
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        return out_path
    return fig
