"""Motion library: reference-motion storage, sampling and blended state query.

TPU-native counterpart of the reference's MotionLibSMPL
(/root/reference/pacer/pacer/utils/motion_lib_smpl.py:176-634): motions are
flattened into device arrays indexed by `length_starts` (reference :334-349),
queried by (motion_id, time) with frame blending/slerp (reference
get_motion_state_smpl, :485-563) — all pure gathers + lerp, jit/vmap-safe, no
host round-trips, usable inside a `lax.scan` rollout.

Two sources:
  * `load_reference_pkl` ingests the reference's AMASS-converted pickles
    (dict of {name: {pose_aa (F,72), root_trans_offset (F,3), beta, fps}},
    schema from uhc/data_process/convert_amass_isaac.py:310-321).
  * `synthetic_walk_motions` procedurally generates parameterized walking
    gaits (speed sweep), standing in for AMASS when motion files are absent
    so that AMP training and motion-reset paths stay exercised end-to-end.
"""
from __future__ import annotations

import pickle
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import quat
from . import body_model as bm
from .skeleton import forward_kinematics

B = bm.NUM_BODIES


class MotionLib(struct.PyTreeNode):
    """Flattened motion frames on device. F = total frames over all motions."""

    local_rot: jnp.ndarray      # (F, 24, 4) local joint rotations (root at 0)
    root_pos: jnp.ndarray       # (F, 3) pelvis pivot position
    root_vel: jnp.ndarray       # (F, 3)
    root_ang_vel: jnp.ndarray   # (F, 3)
    dof_vel: jnp.ndarray        # (F, 23, 3) joint ang vel (parent frame)
    key_pos: jnp.ndarray        # (F, K, 3) key body world positions
    betas: jnp.ndarray          # (M, 16)
    fps: jnp.ndarray            # (M,)
    length_starts: jnp.ndarray  # (M,) start frame of each motion
    num_frames: jnp.ndarray     # (M,)
    durations: jnp.ndarray      # (M,) seconds
    weights: jnp.ndarray        # (M,) sampling weights (normalized)

    @property
    def num_motions(self):
        return self.length_starts.shape[0]


def _finite_diff_velocities(local_rot, root_pos, fps):
    """Per-frame root/dof velocities by finite difference (reference
    motion_lib_smpl.py:44-67)."""
    dt = 1.0 / fps
    root_vel = jnp.gradient(root_pos, axis=0) / dt
    # root angular velocity from consecutive root quats
    q = local_rot[:, 0]
    q0 = jnp.concatenate([q[:1], q[:-1]], axis=0)
    root_ang_vel = quat.angular_velocity(q0, q, dt)
    # dof vel: relative rotation per frame per joint, in parent frame — local
    # rotations ARE parent-frame, so finite-difference the exp map directly
    lr = local_rot[:, 1:]
    lr0 = jnp.concatenate([lr[:1], lr[:-1]], axis=0)
    dq = quat.mul(lr, quat.conjugate(lr0))
    dof_vel = quat.to_exp_map(dq) / dt
    return root_vel, root_ang_vel, dof_vel


def _build(tree, motions, betas_list, fps_list, weights=None):
    """motions: list of (local_rot (F,24,4) np, root_pos (F,3) np)."""
    key_ids = np.array([tree.index(n) for n in bm.KEY_BODIES])
    all_lr, all_rp, all_rv, all_rav, all_dv, all_kp = [], [], [], [], [], []
    starts, nframes, durs = [], [], []
    off = 0
    for (lr, rp), fps in zip(motions, fps_list):
        lr = jnp.asarray(lr, jnp.float32)
        rp = jnp.asarray(rp, jnp.float32)
        rv, rav, dv = _finite_diff_velocities(lr, rp, fps)
        grot, gpos = forward_kinematics(tree, lr, rp)
        all_lr.append(lr)
        all_rp.append(rp)
        all_rv.append(rv)
        all_rav.append(rav)
        all_dv.append(dv)
        all_kp.append(gpos[:, key_ids])
        starts.append(off)
        F = lr.shape[0]
        nframes.append(F)
        durs.append((F - 1) / fps)
        off += F
    M = len(motions)
    w = np.ones(M) if weights is None else np.asarray(weights, np.float64)
    w = w / w.sum()
    return MotionLib(
        local_rot=jnp.concatenate(all_lr),
        root_pos=jnp.concatenate(all_rp),
        root_vel=jnp.concatenate(all_rv),
        root_ang_vel=jnp.concatenate(all_rav),
        dof_vel=jnp.concatenate(all_dv),
        key_pos=jnp.concatenate(all_kp),
        betas=jnp.asarray(np.stack(betas_list), jnp.float32),
        fps=jnp.asarray(fps_list, jnp.float32),
        length_starts=jnp.asarray(starts, jnp.int32),
        num_frames=jnp.asarray(nframes, jnp.int32),
        durations=jnp.asarray(durs, jnp.float32),
        weights=jnp.asarray(w, jnp.float32),
    )


# ---------------------------------------------------------------------------
# Synthetic gait generator
# ---------------------------------------------------------------------------

def synthetic_walk_motions(
    tree=None,
    speeds: Sequence[float] = (0.8, 1.0, 1.25, 1.5, 2.0, 2.5),
    fps: float = 30.0,
    duration: float = 4.0,
    betas: np.ndarray | None = None,
    height: float = 0.92,
) -> MotionLib:
    """Procedural human-like walking gaits (sagittal sinusoid gait model):
    hip/knee/ankle swing with double support timing, counter-rotating arm
    swing, pelvis bob and pitch. Cadence follows speed (step length ≈ 0.5·v)."""
    if tree is None:
        tree = bm.canonical_skeleton()
    F = int(duration * fps) + 1
    t = np.arange(F) / fps
    motions, betas_list, fps_list = [], [], []
    for v in speeds:
        step_len = np.clip(0.35 + 0.25 * v, 0.4, 1.0)
        cadence = v / step_len * np.pi * 2 / 2  # rad/s of gait cycle (2 steps)
        phase = cadence * t
        lr = np.zeros((F, B, 4), np.float32)
        lr[..., 3] = 1.0

        def setj(name, axis, angle):
            j = tree.index(name)
            em = np.zeros((F, 3), np.float32)
            em[:, axis] = angle
            lr[:, j] = np.asarray(quat.exp_map_to_quat(jnp.asarray(em)))

        hip_amp = 0.35 + 0.1 * v / 2
        setj("L_Hip", 1, hip_amp * np.sin(phase))
        setj("R_Hip", 1, hip_amp * np.sin(phase + np.pi))
        # knee flexes most during swing (positive y in upright limits)
        knee = lambda ph: 0.25 + 0.45 * np.maximum(0, np.sin(ph - 0.6))
        setj("L_Knee", 1, knee(phase))
        setj("R_Knee", 1, knee(phase + np.pi))
        setj("L_Ankle", 1, -0.15 * np.sin(phase) - 0.05)
        setj("R_Ankle", 1, -0.15 * np.sin(phase + np.pi) - 0.05)
        setj("L_Shoulder", 0, 0.25 * np.sin(phase + np.pi))
        setj("R_Shoulder", 0, -0.25 * np.sin(phase))
        setj("L_Elbow", 1, 0.3)
        setj("R_Elbow", 1, 0.3)
        setj("Torso", 2, 0.06 * np.sin(phase))

        rp = np.zeros((F, 3), np.float32)
        rp[:, 0] = v * t
        rp[:, 2] = height + 0.02 * np.cos(2 * phase)
        motions.append((lr, rp))
        betas_list.append(np.zeros(16, np.float32) if betas is None else betas)
        fps_list.append(fps)
    return _build(tree, motions, betas_list, fps_list)


# ---------------------------------------------------------------------------
# Reference pkl ingestion
# ---------------------------------------------------------------------------

def load_reference_pkl(path: str, tree=None, max_motions=None) -> MotionLib:
    """Load the reference's AMASS-converted motion pickle (schema from
    uhc/data_process/convert_amass_isaac.py:310-321: per-motion dict with
    pose_aa (F,72) axis-angle, root_trans_offset (F,3), beta (16,), fps)."""
    if tree is None:
        tree = bm.canonical_skeleton()
    with open(path, "rb") as f:
        data = pickle.load(f)
    motions, betas_list, fps_list = [], [], []
    for i, (name, m) in enumerate(data.items()):
        if max_motions is not None and i >= max_motions:
            break
        pose_aa = np.asarray(m["pose_aa"], np.float32).reshape(-1, 24, 3)
        local_rot = np.asarray(quat.exp_map_to_quat(jnp.asarray(pose_aa)))
        root_pos = np.asarray(m["root_trans_offset"], np.float32)
        motions.append((local_rot, root_pos))
        beta = np.asarray(m.get("beta", np.zeros(16)), np.float32)[:16]
        beta = np.pad(beta, (0, 16 - len(beta)))
        betas_list.append(beta)
        fps_list.append(float(m.get("fps", 30.0)))
    return _build(tree, motions, betas_list, fps_list)


# ---------------------------------------------------------------------------
# Sampling and state query (pure, jit-safe)
# ---------------------------------------------------------------------------

def sample_motions(lib: MotionLib, key, n: int, weights=None) -> jnp.ndarray:
    """Weighted motion sampling (reference sample_motions,
    motion_lib_smpl.py:390-395). `weights` overrides the library's static
    prior — the hard-negative path threads the live per-motion sampling
    probabilities through EnvState so updating them never retraces the
    compiled step (the lib itself is a jit closure constant)."""
    p = lib.weights if weights is None else weights
    return jax.random.choice(key, lib.num_motions, (n,), p=p)


def hard_negative_update(succ_rate, sampled, terminated, temp: float = 0.2):
    """Hard-negative sampling refresh (reference update_sampling_weight,
    motion_lib_smpl.py:366-377): for every motion sampled since the last
    refresh, success rate = 1 − terminations/samples; the new sampling
    probability is exp(−succ_rate/temp) normalized (temp 0.2), so motions
    the policy fails on are drawn more often. Histories reset to zero, the
    success-rate estimate persists for motions not seen this round.

    Returns (weights (M,), succ_rate (M,), zeroed sampled, zeroed term)."""
    seen = sampled > 0
    new_rate = jnp.where(
        seen, 1.0 - terminated / jnp.maximum(sampled, 1.0), succ_rate)
    w = jnp.exp(-new_rate / temp)
    return (w / w.sum(), new_rate,
            jnp.zeros_like(sampled), jnp.zeros_like(terminated))


def sample_time(lib: MotionLib, key, motion_ids, truncate_time=0.0):
    """Uniform phase sampling (reference sample_time, :429-443)."""
    dur = lib.durations[motion_ids] - truncate_time
    return jax.random.uniform(key, motion_ids.shape) * jnp.maximum(dur, 0.0)


def get_motion_state(lib: MotionLib, motion_ids, times):
    """Blended motion state at (motion, time) — reference
    get_motion_state_smpl (:485-563): frame pair + lerp/slerp.

    Returns dict with root_pos, root_rot, local_rot (incl. root), dof_pos,
    root_vel, root_ang_vel, dof_vel, key_pos, betas.
    """
    fps = lib.fps[motion_ids]
    nf = lib.num_frames[motion_ids]
    phase = times * fps
    f0 = jnp.clip(jnp.floor(phase).astype(jnp.int32), 0, nf - 2)
    f1 = f0 + 1
    blend = jnp.clip(phase - f0, 0.0, 1.0)[..., None]

    i0 = lib.length_starts[motion_ids] + f0
    i1 = lib.length_starts[motion_ids] + f1

    lr = quat.slerp(lib.local_rot[i0], lib.local_rot[i1], blend)
    root_pos = (1 - blend) * lib.root_pos[i0] + blend * lib.root_pos[i1]
    root_vel = (1 - blend) * lib.root_vel[i0] + blend * lib.root_vel[i1]
    root_ang_vel = ((1 - blend) * lib.root_ang_vel[i0]
                    + blend * lib.root_ang_vel[i1])
    dof_vel = (1 - blend[..., None]) * lib.dof_vel[i0] \
        + blend[..., None] * lib.dof_vel[i1]
    key_pos = (1 - blend[..., None]) * lib.key_pos[i0] \
        + blend[..., None] * lib.key_pos[i1]
    return {
        "root_pos": root_pos,
        "root_rot": lr[:, 0],
        "local_rot": lr,
        "dof_pos": quat.to_exp_map(lr[:, 1:]),
        "root_vel": root_vel,
        "root_ang_vel": root_ang_vel,
        "dof_vel": dof_vel,
        "key_pos": key_pos,
        "betas": lib.betas[motion_ids],
    }
