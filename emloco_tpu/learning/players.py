"""Evaluation players: qualitative observability for policy/value eval.

Parity with the reference AMPPlayerContinuousValue run loop
(/root/reference/pacer/pacer/learning/amp_value_players.py:129-275 —
value-vs-return correlation scatter + histograms) and env_save_video
(/root/reference/pacer/pacer/env/tasks/base_task.py:799-844 — rollout videos
with per-step reward overlays). Artifacts land in an output directory from
the driver-runnable `eval-policy --plots` command (cli/run.py).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def rollout_with_rewards(agent, ts, steps: int, env_index: int = 0,
                         deterministic: bool = True, seed: int = 0):
    """Roll the (frozen) policy and record body positions + reward
    components for one env (the reference player's per-game capture).

    Returns (frames (T, 24, 3), rewards dict of (T,) arrays, traj (V, 3)).

    The whole rollout is one lax.scan under jit — a per-step eager loop
    dispatches the full physics+obs graph op-by-op, which on the remote-TPU
    backend costs a round-trip per op (minutes per GIF)."""
    from ..physics import body_frame_state

    env = agent.env

    @jax.jit
    def _rollout(params, obs_norm, state, key):
        def body(carry, _):
            state, key = carry
            key, k_act = jax.random.split(key)
            obs = env.observe(state)
            a, mu, *_ = agent._policy(params, obs_norm, obs, k_act)
            act = mu if deterministic else a
            state, out = env.step(state, act)
            pos, _, _, _ = body_frame_state(env.model, state.physics)
            return (state, key), (pos[env_index], out.reward[env_index],
                                  out.reward_raw[env_index])
        (state, _), outs = jax.lax.scan(body, (state, key), None,
                                        length=steps)
        return state, outs

    state, (frames, rew, raw) = _rollout(ts.params, ts.obs_norm,
                                         ts.env_state,
                                         jax.random.PRNGKey(seed))
    frames = np.asarray(frames)                           # (T, 24, 3)
    rew = np.asarray(rew)
    raw = np.asarray(raw)                                 # (T, 2+)
    rewards = {"total": rew, "loc": raw[:, 0]}
    if raw.shape[1] > 1:
        rewards["power"] = raw[:, 1]
    traj = np.asarray(state.traj_verts[env_index])
    return frames, rewards, traj


def save_rollout_gif(agent, ts, out_path: str, steps: int = 90,
                     env_index: int = 0) -> str:
    """One rollout GIF with per-step reward overlay (reference
    env_save_video, base_task.py:799-844)."""
    from ..kinematics.visualization import animate_rollout

    frames, rewards, traj = rollout_with_rewards(agent, ts, steps, env_index)
    labels = [
        "  ".join(f"{k}={rewards[k][t]:+.3f}" for k in rewards)
        for t in range(len(frames))
    ]
    return animate_rollout(frames, out_path, rewards=rewards["total"],
                           traj=traj, reward_labels=labels)


def plot_value_scatter(preds: np.ndarray, targets: np.ndarray,
                       out_path: str, mse: Optional[float] = None,
                       corr: Optional[float] = None) -> str:
    """Value-prediction vs realized-return scatter with the y=x diagonal
    (reference amp_value_players.py:198-247 correlation plots)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(targets, preds, s=12, alpha=0.6, edgecolors="none")
    lo = float(min(targets.min(), preds.min(), 0.0))
    hi = float(max(targets.max(), preds.max(), 1.0))
    ax.plot([lo, hi], [lo, hi], color="gray", linestyle="--", linewidth=1)
    ax.set_xlabel("realized normalized return")
    ax.set_ylabel("valuenet prediction")
    title = f"LocoVal prediction ({len(preds)} episodes)"
    if mse is not None:
        title += f"  mse={mse:.4f}"
    if corr is not None:
        title += f"  corr={corr:.3f}"
    ax.set_title(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_value_histograms(preds: np.ndarray, targets: np.ndarray,
                          out_path: str) -> str:
    """Side-by-side distribution of predictions vs realized returns
    (reference amp_value_players.py:248-275 histograms)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    bins = np.linspace(0.0, 1.0, 31)
    ax.hist(targets, bins=bins, alpha=0.55, label="realized return")
    ax.hist(preds, bins=bins, alpha=0.55, label="valuenet prediction")
    ax.set_xlabel("normalized return")
    ax.set_ylabel("episodes")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def save_eval_artifacts(trainer, vts, out_dir: str, name: str = "default",
                        num_epochs: int = 4, gif_steps: int = 90,
                        preds: Optional[np.ndarray] = None,
                        targets: Optional[np.ndarray] = None):
    """Full qualitative eval bundle: scatter + histograms + one rollout GIF.
    Pass (preds, targets) from a prior trainer.collect_predictions to reuse
    its rollouts; otherwise collects num_epochs fresh eval epochs.
    Returns (vts, dict of artifact paths + metrics)."""
    os.makedirs(out_dir, exist_ok=True)
    if preds is None or targets is None:
        vts, preds, targets = trainer.collect_predictions(vts, num_epochs)
    out = {}
    if len(preds):
        mse, corr = trainer.prediction_stats(preds, targets)
        out["mse"], out["corr"] = mse, corr
        out["scatter"] = plot_value_scatter(
            preds, targets, os.path.join(out_dir, f"value_scatter_{name}.png"),
            mse=mse, corr=corr)
        out["hist"] = plot_value_histograms(
            preds, targets, os.path.join(out_dir, f"value_hist_{name}.png"))
    out["gif"] = save_rollout_gif(
        trainer.agent, vts.policy,
        os.path.join(out_dir, f"rollout_{name}.gif"), steps=gif_steps)
    return vts, out
