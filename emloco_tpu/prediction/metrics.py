"""Prediction losses and evaluation metrics.

Parity with /root/reference/social-transmotion/utils/metrics.py:
  * mse_loss        ↔ MSE_LOSS (:4-14): mean L2 over predicted frames ×100
  * mse_loss_multi  ↔ MSE_LOSS_MULTI (:17-26): winner-takes-all min over heads
  * ade / fde       ↔ evaluate_jta.py:214-296 (per mode + mean/min/worst)
  * des             ↔ per-step displacement errors
  * iye             ↔ initial yaw error (:48-65)
  * motion_primitives + chi2 histogram distance ↔ (:67-137)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mse_loss(pred, target):
    """pred (B,Fp,2), target (B,Fp,2) → scalar (mean L2 distance ×100)."""
    d = jnp.linalg.norm(pred - target, axis=-1)
    return d.mean() * 100.0


def mse_loss_multi(pred_modes, target):
    """Winner-takes-all: pred_modes (B,Fp,M,2), target (B,Fp,2) → scalar.
    Min over modes of the per-sample mean L2, averaged over batch, ×100."""
    d = jnp.linalg.norm(pred_modes - target[:, :, None], axis=-1)  # (B,Fp,M)
    per_mode = d.mean(1)                                           # (B,M)
    return per_mode.min(-1).mean() * 100.0


def ade_fde(pred_modes, target):
    """pred_modes (B,Fp,M,2), target (B,Fp,2) →
    dict(ade/fde each mean/min/worst over modes, per-sample arrays)."""
    d = jnp.linalg.norm(pred_modes - target[:, :, None], axis=-1)  # (B,Fp,M)
    ade_m = d.mean(1)                                              # (B,M)
    fde_m = d[:, -1]                                               # (B,M)
    return {
        "ade_mean": ade_m.mean(),
        "ade_min": ade_m.min(-1).mean(),
        "ade_worst": ade_m.max(-1).mean(),
        "fde_mean": fde_m.mean(),
        "fde_min": fde_m.min(-1).mean(),
        "fde_worst": fde_m.max(-1).mean(),
        "ade_per_mode": ade_m,
        "fde_per_mode": fde_m,
    }


def des(pred, target):
    """Per-step displacement errors: (B,Fp,2)² → (Fp,)."""
    return jnp.linalg.norm(pred - target, axis=-1).mean(0)


def initial_yaw_error(pred, target):
    """Angle between first predicted displacement and ground truth's
    (reference utils/metrics.py:48-65)."""
    dp = pred[:, 0]
    dt_ = target[:, 0]
    num = jnp.sum(dp * dt_, -1)
    den = (jnp.linalg.norm(dp, axis=-1) * jnp.linalg.norm(dt_, axis=-1))
    cos = jnp.clip(num / jnp.maximum(den, 1e-8), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos)).mean()


def motion_primitives(traj, dt: float = 0.4):
    """Speed / acceleration / angular velocity / angular acceleration
    sequences at the prediction rate. traj (B,F,2).

    Exact reference semantics (utils/metrics.py:67-105, verified by
    tests/test_reference_parity.py): acceleration is |Δspeed|/dt, and
    angular velocity is |atan2(Δy,Δx)|/dt — the reference divides the
    *absolute displacement heading* by dt (not a heading difference)."""
    v = jnp.diff(traj, axis=1) / dt                     # (B,F-1,2)
    speed = jnp.linalg.norm(v, axis=-1)
    acc = jnp.abs(jnp.diff(speed, axis=1) / dt)
    heading = jnp.arctan2(v[..., 1], v[..., 0])
    ang_vel = jnp.abs(heading / dt)
    ang_acc = jnp.abs(jnp.diff(ang_vel, axis=1) / dt)
    return dict(speed=speed, acc=acc, ang_vel=ang_vel, ang_acc=ang_acc)


def chi2_histogram_distance(a, b, bins=20, rng=None):
    """χ² distance between empirical histograms of two primitive samples.

    Exact reference semantics (utils/metrics.py:107-137): 20 bins spanning
    the pooled min..max, histograms converted to per-bin probability *mass*
    (density × bin width), χ² = Σ (gᵢ−pᵢ)²/(gᵢ+pᵢ) over bins where either
    mass is nonzero (no ½ factor)."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    lo = min(a.min(), b.min())
    hi = max(a.max(), b.max())
    if hi <= lo:
        return 0.0
    edges = np.linspace(lo, hi, bins + 1)
    ha, _ = np.histogram(a, bins=edges, density=True)
    hb, _ = np.histogram(b, bins=edges, density=True)
    ha = ha * np.diff(edges)
    hb = hb * np.diff(edges)
    denom = ha + hb
    mask = denom > 0
    return float(np.sum((ha[mask] - hb[mask]) ** 2 / denom[mask]))


def locoval_filter(pred_modes, values, threshold: float = 0.7):
    """Keep modes with plausibility ≥ threshold; if none pass, keep the
    argmax-value mode (reference evaluate_jta.py:320-357).

    pred_modes (B,Fp,M,2), values (B,M) → (mask (B,M) bool)."""
    keep = values >= threshold
    none = ~keep.any(-1, keepdims=True)
    best = jnp.zeros_like(keep).at[
        jnp.arange(values.shape[0]), values.argmax(-1)].set(True)
    return jnp.where(none, best, keep)
