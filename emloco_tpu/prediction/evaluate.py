"""Prediction evaluation: ADE/FDE + the LocoVal plausibility filter.

Parity with /root/reference/social-transmotion/evaluate_jta.py:140-507:
  * ADE/FDE mean/min/worst over heads, DES per step, initial yaw error,
    χ² motion-primitive distances (:214-296, 391-430)
  * LocoVal filter: score every head with the frozen ValuePoseNet, keep heads
    with value ≥ 0.7, fall back to the argmax-value head; report filtered
    (value-sampled) and random-baseline ADE/FDE (:320-357)
  * GT trajectory value for reference (:298-318)
  * --all_frames style observation-length sweep via limit_obs
    (:617-621 / model masking)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import data as data_mod
from . import metrics as M
from ..learning.networks import ValuePoseNet

FILTER_THRESHOLD = 0.7  # evaluate_jta.py:526


def score_modes(vnet: ValuePoseNet, vnet_params, pred_modes, init_pose,
                init_vel):
    """Plausibility value per head: (B,Fp,M,2) → (B,M)."""
    B, Fp, Mm, _ = pred_modes.shape
    vals = []
    for m in range(Mm):
        traj = data_mod.prepend_origin(pred_modes[:, :, m])
        vals.append(vnet.apply(vnet_params, traj, init_pose, init_vel))
    return jnp.stack(vals, -1)


def evaluate_with_filter(trainer, params, dataset, batch_size, num_batches,
                         vnet: Optional[ValuePoseNet] = None,
                         vnet_params=None, threshold=FILTER_THRESHOLD,
                         rng=None):
    """Full evaluation pass. Returns aggregate metric dict."""
    rng = rng or np.random.RandomState(0)
    rows = []
    for obs, mask, gt, init_pose, init_vel in dataset.batches(batch_size,
                                                              num_batches):
        pred = trainer.predict(params, obs, mask)        # (B,Fp,M,2)
        r = M.ade_fde(pred, gt)
        row = {k: float(v) for k, v in r.items() if not k.endswith("per_mode")}
        row["des_final"] = float(M.des(pred[:, :, 0], gt)[-1])
        row["iye"] = float(M.initial_yaw_error(pred[:, :, 0], gt))

        # χ² motion-primitive distances vs ground truth
        mp_pred = M.motion_primitives(data_mod.prepend_origin(pred[:, :, 0]))
        mp_gt = M.motion_primitives(data_mod.prepend_origin(gt))
        for k in ("speed", "acc", "ang_vel", "ang_acc"):
            row[f"chi2_{k}"] = M.chi2_histogram_distance(mp_pred[k], mp_gt[k])

        if vnet is not None:
            # raw init pose from the SceneBatch, z-flipped at consumption
            # (reference train_jta.py:264-266 / evaluate_jta.py:298-318)
            pose = init_pose * jnp.array([1.0, 1.0, -1.0])
            vel = init_vel
            values = score_modes(vnet, vnet_params, pred, pose, vel)
            keep = M.locoval_filter(pred, values, threshold)   # (B,M)

            ade_m = np.asarray(r["ade_per_mode"])
            fde_m = np.asarray(r["fde_per_mode"])
            keep_np = np.asarray(keep)
            big = np.where(keep_np, ade_m, np.inf)
            row["ade_filtered_min"] = float(big.min(-1).mean())
            bigf = np.where(keep_np, fde_m, np.inf)
            row["fde_filtered_min"] = float(bigf.min(-1).mean())
            # value-sampled single head (argmax value) and random baseline
            amax = np.asarray(values.argmax(-1))
            bidx = np.arange(len(amax))
            row["ade_value_pick"] = float(ade_m[bidx, amax].mean())
            rnd = rng.randint(0, ade_m.shape[1], len(amax))
            row["ade_random_pick"] = float(ade_m[bidx, rnd].mean())
            # GT trajectory plausibility for reference
            gt_val = vnet.apply(vnet_params, data_mod.prepend_origin(gt),
                                pose, vel)
            row["gt_value_mean"] = float(gt_val.mean())
            row["pred_value_mean"] = float(values.mean())
        rows.append(row)
    return {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}


def observation_length_sweep(trainer, params, dataset, batch_size,
                             num_batches, lengths=range(1, 10)):
    """ADE vs number of observed frames (reference --all_frames,
    evaluate_jta.py:617-621)."""
    out = {}
    for L in lengths:
        rows = []
        for obs, mask, gt, *_ in dataset.batches(batch_size, num_batches):
            pred = trainer.predict(params, obs, mask, limit_obs=int(L))
            rows.append(float(M.ade_fde(pred, gt)["ade_min"]))
        out[int(L)] = float(np.mean(rows))
    return out
