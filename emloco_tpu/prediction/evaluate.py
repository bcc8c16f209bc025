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
    """Plausibility value per head: (B,Fp,M,2) → (B,M). Heads fold into the
    batch axis for one vnet apply (a per-head loop dispatches M eager MLP
    applies — one RPC per op on the remote-TPU backend)."""
    B, Fp, Mm, _ = pred_modes.shape
    flat = jnp.moveaxis(pred_modes, 2, 1).reshape(B * Mm, Fp, 2)
    traj = data_mod.prepend_origin(flat)
    pose = None if init_pose is None else jnp.repeat(init_pose, Mm, axis=0)
    vel = None if init_vel is None else jnp.repeat(init_vel, Mm, axis=0)
    v = vnet.apply(vnet_params, traj, pose, vel)
    return v.reshape(B, Mm)


def evaluate_with_filter(trainer, params, dataset, batch_size, num_batches,
                         vnet: Optional[ValuePoseNet] = None,
                         vnet_params=None, threshold=FILTER_THRESHOLD,
                         rng=None, pose_z_flip=True):
    """Full evaluation pass. Returns aggregate metric dict.

    One jitted dispatch + one device_get per batch: the metric/scoring math
    used to run eagerly between predict calls, which on the remote-TPU
    backend costs a round-trip per jnp op."""
    rng = rng or np.random.RandomState(0)

    @jax.jit
    def batch_eval(p, vp, obs, mask, gt, init_pose, init_vel):
        out = trainer.model.apply(p, obs, mask, train=False)
        pred = out[:, data_mod.OBS_FRAMES:]              # (B,Fp,M,2)
        af = M.ade_fde(pred, gt)                         # jit-safe jnp math
        res = dict(
            ade_m=af["ade_per_mode"], fde_m=af["fde_per_mode"],
            des_final=M.des(pred[:, :, 0], gt)[-1],
            iye=M.initial_yaw_error(pred[:, :, 0], gt),
            mp_pred=M.motion_primitives(
                data_mod.prepend_origin(pred[:, :, 0])),
            mp_gt=M.motion_primitives(data_mod.prepend_origin(gt)),
        )
        if vnet is not None:
            # raw init pose from the SceneBatch, z-flipped at consumption
            # for JTA (reference train_jta.py:264-266 / evaluate_jta.py:
            # 298-318); JRDB feeds poses as-is (train_jrdb.py:187)
            pose = init_pose * jnp.array(
                [1.0, 1.0, -1.0 if pose_z_flip else 1.0])
            values = score_modes(vnet, vp, pred, pose, init_vel)
            res["values"] = values
            res["keep"] = M.locoval_filter(pred, values, threshold)
            res["gt_value_mean"] = vnet.apply(
                vp, data_mod.prepend_origin(gt), pose, init_vel).mean()
        return res

    rows = []
    for obs, mask, gt, init_pose, init_vel in dataset.batches(batch_size,
                                                              num_batches):
        o = jax.device_get(batch_eval(params, vnet_params, obs, mask, gt,
                                      init_pose, init_vel))
        ade_m, fde_m = o["ade_m"], o["fde_m"]
        row = {
            "ade_mean": float(ade_m.mean()),
            "ade_min": float(ade_m.min(-1).mean()),
            "ade_worst": float(ade_m.max(-1).mean()),
            "fde_mean": float(fde_m.mean()),
            "fde_min": float(fde_m.min(-1).mean()),
            "fde_worst": float(fde_m.max(-1).mean()),
            "des_final": float(o["des_final"]),
            "iye": float(o["iye"]),
        }
        # χ² motion-primitive distances vs ground truth (host: histogram
        # range is data-dependent)
        for k in ("speed", "acc", "ang_vel", "ang_acc"):
            row[f"chi2_{k}"] = M.chi2_histogram_distance(
                o["mp_pred"][k], o["mp_gt"][k])

        if vnet is not None:
            values, keep = o["values"], o["keep"]
            # kept fraction disambiguates filtered-min comparisons: a laxer
            # filter trivially lowers the kept-set min
            row["kept_frac"] = float(np.asarray(keep).mean())
            big = np.where(keep, ade_m, np.inf)
            row["ade_filtered_min"] = float(big.min(-1).mean())
            bigf = np.where(keep, fde_m, np.inf)
            row["fde_filtered_min"] = float(bigf.min(-1).mean())
            # value-sampled single head (argmax value) and random baseline
            amax = values.argmax(-1)
            bidx = np.arange(len(amax))
            row["ade_value_pick"] = float(ade_m[bidx, amax].mean())
            rnd = rng.randint(0, ade_m.shape[1], len(amax))
            row["ade_random_pick"] = float(ade_m[bidx, rnd].mean())
            row["gt_value_mean"] = float(o["gt_value_mean"])
            row["pred_value_mean"] = float(values.mean())
        rows.append(row)
    return {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}


def filter_threshold_sweep(trainer, params, dataset, batch_size, num_batches,
                           vnet, vnet_params,
                           thresholds=(0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5,
                                       0.6, 0.7, 0.8, 0.9),
                           pose_z_flip=True):
    """Filter-threshold calibration: per-sample (ade, fde, value) collected in
    ONE forward pass, then the LocoVal keep-mask swept over thresholds on
    host (the model/vnet outputs don't depend on the threshold, so re-running
    evaluate_with_filter per candidate would redo the expensive part). The
    reference hardcodes 0.7 (evaluate_jta.py:526); calibrating on a held-out
    val split is how to pick it for a new valuenet.

    Returns {threshold: {"ade_filtered_min", "fde_filtered_min",
    "kept_frac"}}."""

    @jax.jit
    def batch_scores(p, vp, obs, mask, gt, init_pose, init_vel):
        out = trainer.model.apply(p, obs, mask, train=False)
        pred = out[:, data_mod.OBS_FRAMES:]
        af = M.ade_fde(pred, gt)
        pose = init_pose * jnp.array(
            [1.0, 1.0, -1.0 if pose_z_flip else 1.0])
        v = score_modes(vnet, vp, pred, pose, init_vel)
        return af["ade_per_mode"], af["fde_per_mode"], v

    ades, fdes, values = [], [], []
    for obs, mask, gt, init_pose, init_vel in dataset.batches(batch_size,
                                                              num_batches):
        ade_m, fde_m, v = batch_scores(params, vnet_params, obs, mask, gt,
                                       init_pose, init_vel)
        ades.append(np.asarray(ade_m))
        fdes.append(np.asarray(fde_m))
        values.append(np.asarray(v))
    ade_m = np.concatenate(ades)                          # (S, M)
    fde_m = np.concatenate(fdes)
    vals = np.concatenate(values)
    amax = vals.argmax(-1)
    bidx = np.arange(len(amax))
    out = {}
    for t in thresholds:
        keep = vals >= t
        none = ~keep.any(-1)
        keep[none, amax[none]] = True                     # argmax fallback
        big = np.where(keep, ade_m, np.inf)
        bigf = np.where(keep, fde_m, np.inf)
        out[float(t)] = {
            "ade_filtered_min": float(big.min(-1).mean()),
            "fde_filtered_min": float(bigf.min(-1).mean()),
            "kept_frac": float(keep.mean()),
        }
    return out


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
