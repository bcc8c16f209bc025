"""Prediction visualization: multi-model comparison plots, value/ADE bars,
histograms.

Counterpart of the reference's analysis plots:
  * visualize_pred.py:17-148 — multi-model BEV comparison from saved vis_dict
    pkls (observed track, GT future, per-model multi-head predictions).
  * draw_histogram.py — value histograms across prediction sets.
  * evaluate_jta.py:432-493 — value-binned ADE bars, value histograms.

All figures are written to files (headless Agg backend); nothing here touches
the accelerator.
"""
from __future__ import annotations

import pickle
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def save_vis_dict(path: str, vis: Dict):
    """Persist an evaluation's visualization payload (the reference stores
    `vis_dict` pkls from evaluate_jta and replots them in visualize_pred)."""
    with open(path, "wb") as f:
        pickle.dump({k: np.asarray(v) if not isinstance(v, dict) else v
                     for k, v in vis.items()}, f)


def load_vis_dict(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def collect_vis_data(trainer, params, dataset, batch_size=32, num_batches=1,
                     vnet=None, vnet_params=None) -> Dict:
    """Run inference and collect everything the comparison plots need:
    obs trajectory, GT future, multi-head predictions, per-head values."""
    import jax.numpy as jnp

    from . import data as data_mod
    from .evaluate import score_modes

    obs_l, gt_l, pred_l, val_l = [], [], [], []
    for obs, mask, gt, init_pose, init_vel in dataset.batches(batch_size,
                                                              num_batches):
        pred = trainer.predict(params, obs, mask)        # (B,Fp,M,2)
        obs_l.append(np.asarray(obs[:, :, 0, 0, :2]))    # primary-agent track
        gt_l.append(np.asarray(gt))
        pred_l.append(np.asarray(pred))
        if vnet is not None:
            pose = init_pose * jnp.array([1.0, 1.0, -1.0])
            val_l.append(np.asarray(
                score_modes(vnet, vnet_params, pred, pose, init_vel)))
    out = {
        "obs": np.concatenate(obs_l),                    # (S, Fo, 2)
        "gt": np.concatenate(gt_l),                      # (S, Fp, 2)
        "pred": np.concatenate(pred_l),                  # (S, Fp, M, 2)
    }
    if val_l:
        out["values"] = np.concatenate(val_l)            # (S, M)
    return out


def plot_prediction_comparison(vis_by_model: Dict[str, Dict],
                               scene_indices: Sequence[int],
                               out_path: str,
                               value_threshold: Optional[float] = None):
    """BEV multi-model, multi-scene comparison grid (visualize_pred.py
    semantics): black observed track, green GT future, one color per model,
    one faint line per prediction head (dashed when its LocoVal value falls
    below the threshold)."""
    n_models = len(vis_by_model)
    n_scenes = len(scene_indices)
    fig, axes = plt.subplots(n_scenes, n_models,
                             figsize=(3.2 * n_models, 3.2 * n_scenes),
                             squeeze=False)
    colors = plt.cm.tab10.colors
    for col, (name, vis) in enumerate(vis_by_model.items()):
        for row, s in enumerate(scene_indices):
            ax = axes[row][col]
            obs, gt, pred = vis["obs"][s], vis["gt"][s], vis["pred"][s]
            ax.plot(obs[:, 0], obs[:, 1], "k.-", lw=1.5, label="obs")
            gseg = np.concatenate([obs[-1:], gt], 0)
            ax.plot(gseg[:, 0], gseg[:, 1], "-", c="tab:green", lw=2,
                    label="GT")
            vals = vis.get("values")
            for m in range(pred.shape[1]):
                pseg = np.concatenate([obs[-1:, :2], pred[:, m]], 0)
                style = "-"
                if (value_threshold is not None and vals is not None
                        and vals[s, m] < value_threshold):
                    style = ":"
                ax.plot(pseg[:, 0], pseg[:, 1], style,
                        c=colors[col % 10], alpha=0.45, lw=1)
            if row == 0:
                ax.set_title(name)
            ax.set_aspect("equal")
            if row == 0 and col == 0:
                ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def per_sample_min_metrics(vis: Dict):
    """Per-sample min-over-heads ADE/FDE from a vis_dict (the quantities
    draw_histogram.py reads back out of the reference's saved eval tuples,
    indices 6/9)."""
    gt = vis["gt"][:, :, None, :]                        # (S, Fp, 1, 2)
    d = np.linalg.norm(vis["pred"] - gt, axis=-1)        # (S, Fp, M)
    return d.mean(1).min(-1), d[:, -1].min(-1)


def plot_metric_diff_histograms(vis_by_model: Dict[str, Dict], ours: str,
                                out_path: str, bins: int = 10):
    """Per-sample ADE/FDE improvement histograms of `ours` against every
    other model in `vis_by_model` (reference draw_histogram.py: histograms
    of metric_baseline − metric_ours, one figure per metric × baseline,
    10 bins). Positive mass = samples where ours is better; each panel is
    annotated with that improved fraction."""
    ade_o, fde_o = per_sample_min_metrics(vis_by_model[ours])
    baselines = [k for k in vis_by_model if k != ours]
    if not baselines:
        raise ValueError("need at least one baseline vis_dict besides "
                         f"'{ours}'")
    fig, axes = plt.subplots(len(baselines), 2,
                             figsize=(8.0, 3.0 * len(baselines)),
                             squeeze=False)
    for r, name in enumerate(baselines):
        ade_b, fde_b = per_sample_min_metrics(vis_by_model[name])
        for c, (lbl, diffs) in enumerate([("ADE", ade_b - ade_o),
                                          ("FDE", fde_b - fde_o)]):
            ax = axes[r][c]
            ax.hist(diffs, bins=bins, alpha=0.8, edgecolor="black")
            ax.axvline(0.0, color="k", lw=1)
            frac = float((diffs > 0).mean())
            ax.set_title(f"{lbl} {name} − {ours}  "
                         f"(improved {frac:.0%})", fontsize=9)
            ax.set_xlabel(f"Δ{lbl} [m]", fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_value_ade_bars(values: np.ndarray, ades: np.ndarray, out_path: str,
                        num_bins: int = 10):
    """Mean ADE per LocoVal-value bin (evaluate_jta.py:432-493): shows whether
    low-value (implausible) heads really are worse predictions."""
    values = np.asarray(values).reshape(-1)
    ades = np.asarray(ades).reshape(-1)
    edges = np.linspace(0.0, 1.0, num_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    means, counts = [], []
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (values >= lo) & (values < hi)
        means.append(float(ades[m].mean()) if m.any() else 0.0)
        counts.append(int(m.sum()))
    fig, ax1 = plt.subplots(figsize=(6, 4))
    ax1.bar(centers, means, width=0.8 / num_bins, color="tab:blue",
            label="mean ADE")
    ax1.set_xlabel("LocoVal value")
    ax1.set_ylabel("mean ADE [m]")
    ax2 = ax1.twinx()
    ax2.plot(centers, counts, "o-", c="tab:orange", label="count")
    ax2.set_ylabel("samples")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return {"bin_centers": centers, "mean_ade": np.array(means),
            "counts": np.array(counts)}


def plot_value_histogram(values_by_group: Dict[str, np.ndarray],
                         out_path: str, bins: int = 30):
    """Overlaid value histograms across groups (draw_histogram.py), e.g.
    {"pred": ..., "GT": ..., "random": ...}."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, v in values_by_group.items():
        ax.hist(np.asarray(v).reshape(-1), bins=bins, range=(0, 1),
                alpha=0.5, label=name, density=True)
    ax.set_xlabel("LocoVal value")
    ax.set_ylabel("density")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_des_per_step(des_by_model: Dict[str, np.ndarray], out_path: str,
                      dt: float = 0.4):
    """Displacement error vs. prediction horizon (evaluate_jta DES curves)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, des in des_by_model.items():
        des = np.asarray(des)
        t = (np.arange(len(des)) + 1) * dt
        ax.plot(t, des, "o-", label=name)
    ax.set_xlabel("horizon [s]")
    ax.set_ylabel("DES [m]")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
