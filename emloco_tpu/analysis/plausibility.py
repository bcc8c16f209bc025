"""Standalone LocoVal probe: score, rank and optimize trajectories.

Counterpart of the reference's plausibl/test_value_mlp.py (:24-297):
  * score procedurally generated or user trajectories with a trained value
    net (no simulator in the loop)
  * rank a candidate set by plausibility (:196-237)
  * test-time trajectory optimization: gradient ascent on the trajectory
    coordinates against the frozen value function — the reference minimizes
    exp(−value) with Adam (:239-274); here the value function is a jax
    module, so the whole optimization is one jitted `lax.scan`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs import traj_gen
from ..learning.networks import ValuePoseNet


def score_trajectories(vnet: ValuePoseNet, params, trajs, init_pose=None,
                       init_vel=None):
    """trajs (B, W, 2) → plausibility values (B,)."""
    return vnet.apply(params, trajs, init_pose, init_vel)


def rank_trajectories(vnet, params, trajs, init_pose=None, init_vel=None):
    """Returns (order, values) with order sorted most→least plausible."""
    v = np.asarray(score_trajectories(vnet, params, trajs, init_pose,
                                      init_vel))
    order = np.argsort(-v)
    return order, v


def sample_candidate_trajs(key, num, num_waypoints=13, dt=0.4,
                           cfg: Optional[traj_gen.TrajConfig] = None):
    """Procedural candidates via the sim's trajectory generator, resampled at
    the prediction waypoint spacing (the reference's Traj wrapper over
    TrajGenerator, test_value_mlp.py:116-208)."""
    cfg = cfg or traj_gen.TrajConfig()
    init = jnp.zeros((num, 3))
    verts, _ = traj_gen.sample_traj(key, cfg, init)
    times = jnp.zeros((num,))
    wp = traj_gen.fetch_samples(verts, times, cfg.episode_dur,
                                num_waypoints, dt)[..., :2]
    return wp - wp[:, 0:1]


def optimize_trajectory(vnet: ValuePoseNet, params, traj0, init_pose=None,
                        init_vel=None, steps: int = 200, lr: float = 0.01,
                        freeze_first: bool = True, record_trajs: bool = False):
    """Gradient-based test-time optimization of trajectory coordinates
    against exp(−value) (reference test_value_mlp.py:239-274).

    Returns (optimized traj (B,W,2), history of values (steps+1, B));
    with record_trajs also the per-step trajectory snapshots
    (steps+1, B, W, 2) for the optimization animation."""
    tx = optax.adam(lr)

    def loss_fn(traj):
        v = vnet.apply(params, traj, init_pose, init_vel)
        return jnp.mean(jnp.exp(-v)), v

    @jax.jit
    def run(traj0):
        opt_state = tx.init(traj0)

        def step(carry, _):
            traj, opt_state = carry
            (_, v), g = jax.value_and_grad(loss_fn, has_aux=True)(traj)
            if freeze_first:
                g = g.at[:, 0].set(0.0)   # origin stays pinned
            updates, opt_state = tx.update(g, opt_state)
            new_traj = optax.apply_updates(traj, updates)
            out = (v, traj) if record_trajs else (v,)
            return (new_traj, opt_state), out

        (traj, _), hist = jax.lax.scan(step, (traj0, opt_state), None,
                                       length=steps)
        final_v = vnet.apply(params, traj, init_pose, init_vel)
        values = jnp.concatenate([hist[0], final_v[None]], 0)
        if record_trajs:
            snaps = jnp.concatenate([hist[1], traj[None]], 0)
            return traj, values, snaps
        return traj, values

    return run(traj0)


def animate_optimization(snapshots, values, out_path: str = "traj_opt.gif",
                         index: int = 0, fps: int = 10, stride: int = 5):
    """GIF of the trajectory-optimization process (reference
    test_value_mlp.py:276-297): the trajectory morphs while its LocoVal
    value climbs in the title."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    snaps = np.asarray(snapshots)[:, index]            # (S, W, 2)
    vals = np.asarray(values)[:, index]
    frames = list(range(0, len(snaps), stride)) + [len(snaps) - 1]
    lo = snaps.min((0, 1)) - 0.5
    hi = snaps.max((0, 1)) + 0.5
    fig, ax = plt.subplots(figsize=(5, 5))

    def draw(i):
        t = frames[i]
        ax.cla()
        ax.plot(snaps[0, :, 0], snaps[0, :, 1], ":", c="gray",
                label="initial")
        ax.plot(snaps[t, :, 0], snaps[t, :, 1], "o-", c="tab:blue",
                label="current")
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_aspect("equal")
        ax.set_title(f"step {t}  value={vals[t]:.3f}")
        ax.legend(loc="upper right", fontsize=8)

    anim = animation.FuncAnimation(fig, draw, frames=len(frames),
                                   interval=1000 / fps)
    anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path
