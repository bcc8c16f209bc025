"""Prediction datasets: token building, normalization, synthetic JTA-like
scenes, and trajnet++-style ndjson ingestion.

Parity targets:
  * batch_process_coords (reference social-transmotion/dataset_jta.py:27-84):
    translate every trajectory/pose so the PRIMARY agent's last observed
    position is the origin; build the (B, in_F, N, J, 4) token tensor with
    layout [traj, 3dbb, 2dbb, 3dpose·24, 2dpose·22].
  * ndjson scene readers (utils/trajnetplusplustools/reader.py:10-143) for
    real JTA/JRDB exports when files are present.
  * the synthetic generator stands in for JTA: scenes of walking pedestrians
    whose 3D poses come from the SAME gait model + FK used by the simulator,
    so sim and prediction stay mutually consistent end-to-end.
Constants that silently break parity are preserved: 2.5 Hz frame rate,
9 obs + 12 pred frames, init pose = 3d joints at the last obs frame, init
velocity = (x₈ − x₇)·2.5 (reference train_jta.py:264-273).
"""
from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics import body_model as bm
from ..kinematics import motion_lib as ml
from ..kinematics.skeleton import forward_kinematics

FPS = 2.5
OBS_FRAMES = 9
PRED_FRAMES = 12
TOTAL = OBS_FRAMES + PRED_FRAMES


def build_tokens(traj, pose3d=None, box3d=None, box2d=None, pose2d=None,
                 num_3dpose=24, num_2dpose=22):
    """Assemble the (B, F, N, J, 4) token tensor from modality arrays.

    traj (B,F,N,2) is required; missing cues are zeros (the model's masking
    treats zeros as absent, mirroring the reference's visual-cue dropout).
    """
    B, F, N, _ = traj.shape
    J = 3 + num_3dpose + num_2dpose
    tok = np.zeros((B, F, N, J, 4), np.float32)
    tok[..., 0, :2] = traj
    if box3d is not None:
        tok[..., 1, :4] = box3d
    if box2d is not None:
        tok[..., 2, :4] = box2d
    if pose3d is not None:
        tok[..., 3:3 + num_3dpose, :3] = pose3d
    if pose2d is not None:
        tok[..., 3 + num_3dpose:, :2] = pose2d
    return tok


def normalize_scene(tokens, obs_frames=OBS_FRAMES):
    """Translate so the primary agent's last observed position is the origin
    (reference batch_process_coords, dataset_jta.py:38-45). Poses are
    root-relative already; only trajectories/boxes shift."""
    origin = tokens[:, obs_frames - 1:obs_frames, 0:1, 0:1, :2].copy()
    out = tokens.copy()
    out[..., 0, :2] -= origin[..., 0, :2]
    out[..., 1, :2] -= origin[..., 0, :2]  # 3d box center xy
    return out, origin[:, 0, 0, 0]


def extract_locoval_inputs(tokens, gt_future):
    """Inputs for the EmLoco loss (reference train_jta.py:264-308):
    init pose = 3d pose joints at the last obs frame with z-flip; init vel =
    (x₈ − x₇)·2.5; pred traj gets the origin prepended.

    tokens (B,F,N,J,4) normalized; returns (init_pose (B,24,3),
    init_vel (B,2))."""
    pose = tokens[:, OBS_FRAMES - 1, 0, 3:3 + 24, :3]
    # z-flip (reference flips the z axis of exported poses, train_jta.py:266)
    pose = pose * np.array([1.0, 1.0, -1.0], np.float32)
    x8 = tokens[:, OBS_FRAMES - 1, 0, 0, :2]
    x7 = tokens[:, OBS_FRAMES - 2, 0, 0, :2]
    init_vel = (x8 - x7) * FPS
    return pose, init_vel


def prepend_origin(pred_traj):
    """(B,Fp,2) → (B,Fp+1,2) with the origin first (train_jta.py:291,301)."""
    z = jnp.zeros_like(pred_traj[:, :1])
    return jnp.concatenate([z, pred_traj], axis=1)


# ---------------------------------------------------------------------------
# Synthetic JTA-like scene generator
# ---------------------------------------------------------------------------

class SyntheticScenes:
    """Procedural multi-pedestrian scenes with kinematically consistent 3D
    poses (gait model + FK). Yields batches shaped like the JTA pipeline."""

    def __init__(self, num_people=4, seed=0, num_3dpose=24, num_2dpose=22):
        self.num_people = num_people
        self.rng = np.random.RandomState(seed)
        self.tree = bm.canonical_skeleton()
        self.lib = ml.synthetic_walk_motions(
            tree=self.tree, speeds=(0.8, 1.2, 1.6, 2.0), fps=30.0,
            duration=10.0)
        self.num_3dpose = num_3dpose
        self.num_2dpose = num_2dpose

    def _person(self, T):
        """One pedestrian: smooth random-walk traj + gait-phase 3d pose."""
        rng = self.rng
        speed = rng.uniform(0.5, 2.0)
        heading0 = rng.uniform(-np.pi, np.pi)
        curv = rng.normal(0, 0.2)
        t = np.arange(T) / FPS
        heading = heading0 + curv * t
        vx = speed * np.cos(heading)
        vy = speed * np.sin(heading)
        xy = np.cumsum(np.stack([vx, vy], -1), 0) / FPS
        xy += rng.uniform(-5, 5, 2)

        # pose from the gait motion library at matching speed/phase
        mid = int(np.argmin(np.abs(np.array([0.8, 1.2, 1.6, 2.0]) - speed)))
        t0 = rng.uniform(0, 2.0)
        ms = ml.get_motion_state(
            self.lib, jnp.full((T,), mid, jnp.int32),
            jnp.asarray(t0 + t, jnp.float32))
        grot, gpos = forward_kinematics(self.tree, ms["local_rot"],
                                        ms["root_pos"])
        pose = np.asarray(gpos) - np.asarray(gpos[:, 0:1])  # root-relative
        # rotate pose to the walking heading
        c, s = np.cos(heading), np.sin(heading)
        R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
        pose_xy = np.einsum("tij,tkj->tki", R, pose[..., :2])
        pose = np.concatenate([pose_xy, pose[..., 2:]], -1)
        return xy.astype(np.float32), pose.astype(np.float32)

    def batch(self, batch_size):
        B, N, T = batch_size, self.num_people, TOTAL
        traj = np.zeros((B, T, N, 2), np.float32)
        pose3 = np.zeros((B, T, N, self.num_3dpose, 3), np.float32)
        box3 = np.zeros((B, T, N, 4), np.float32)
        pose2 = np.zeros((B, T, N, self.num_2dpose, 2), np.float32)
        for b in range(B):
            for n in range(N):
                xy, pose = self._person(T)
                traj[b, :, n] = xy
                pose3[b, :, n] = pose[:, :self.num_3dpose]
                box3[b, :, n, :2] = xy
                box3[b, :, n, 2] = 0.6
                box3[b, :, n, 3] = 1.8
                pose2[b, :, n] = pose[:, :self.num_2dpose, :2] * 50 + 500
        tokens = build_tokens(traj, pose3d=pose3, box3d=box3, pose2d=pose2,
                              num_3dpose=self.num_3dpose,
                              num_2dpose=self.num_2dpose)
        tokens, origin = normalize_scene(tokens)
        padding_mask = np.ones((B, N), bool)
        obs = tokens[:, :OBS_FRAMES]
        gt_future = tokens[:, OBS_FRAMES:, 0, 0, :2]
        return (jnp.asarray(obs), jnp.asarray(padding_mask),
                jnp.asarray(gt_future))

    def batches(self, batch_size, num_batches) -> Iterator:
        for _ in range(num_batches):
            yield self.batch(batch_size)


# ---------------------------------------------------------------------------
# trajnet++-style ndjson ingestion (real JTA/JRDB exports)
# ---------------------------------------------------------------------------

def read_ndjson_scenes(path: str, max_scenes: Optional[int] = None):
    """Minimal trajnet++ reader (reference
    utils/trajnetplusplustools/reader.py:10-143): 'scene' rows give
    (id, start, end, primary pedestrian); 'track' rows give
    (frame, pedestrian, x, y). Returns a list of (T, N, 2) arrays with the
    primary agent first."""
    scenes = []
    tracks = {}
    scene_rows = []
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if "track" in row:
                t = row["track"]
                tracks.setdefault(t["p"], {})[t["f"]] = (t["x"], t["y"])
            elif "scene" in row:
                scene_rows.append(row["scene"])
    for s in scene_rows:
        if max_scenes is not None and len(scenes) >= max_scenes:
            break
        frames = list(range(s["s"], s["e"] + 1))
        primary = s["p"]
        peds = [primary] + [p for p in tracks
                            if p != primary and all(
                                f in tracks[p] for f in frames)]
        arr = np.full((len(frames), len(peds), 2), np.nan, np.float32)
        ok = True
        for j, p in enumerate(peds):
            for i, f in enumerate(frames):
                if f in tracks.get(p, {}):
                    arr[i, j] = tracks[p][f]
                elif j == 0:
                    ok = False
        if ok:
            scenes.append(arr)
    return scenes


class NdjsonScenes:
    """Real-data dataset over trajnet++-style ndjson exports (JTA/JRDB).

    Mirrors the reference pipeline (dataset_jta.py:86-152 preprocessing +
    collate_batch :11-25 pad-to-max-people + drop_ped_with_missing_frame /
    drop_distant_far, utils/data.py:34-100): scenes are windowed to
    OBS+PRED frames, neighbours beyond `max_radius` of the primary agent are
    dropped, people are padded to a fixed count with a padding mask. 2-D-only
    exports have no pose/box cues — those token slots stay zero (the model's
    modality masking treats zeros as absent, like the trajectory-only
    reference configs)."""

    def __init__(self, path: str, max_people: int = 8, max_radius: float = 6.0,
                 seed: int = 0, max_scenes: Optional[int] = None):
        raw = read_ndjson_scenes(path, max_scenes=max_scenes)
        self.windows = []
        for arr in raw:                                   # (T, N, 2)
            for s in range(0, len(arr) - TOTAL + 1, TOTAL):
                w = arr[s:s + TOTAL]
                # drop neighbours that are far from the primary at the last
                # obs frame or have missing frames (NaN)
                ref = w[OBS_FRAMES - 1, 0]
                keep = [0]
                for j in range(1, w.shape[1]):
                    if np.isnan(w[:, j]).any():
                        continue
                    if np.linalg.norm(w[OBS_FRAMES - 1, j] - ref) \
                            <= max_radius:
                        keep.append(j)
                if np.isnan(w[:, 0]).any():
                    continue
                self.windows.append(
                    np.nan_to_num(w[:, keep[:max_people]], nan=0.0))
        if not self.windows:
            raise ValueError(f"no usable scenes in {path}")
        self.max_people = max_people
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.windows)

    def batch(self, batch_size):
        B, N, T = batch_size, self.max_people, TOTAL
        traj = np.zeros((B, T, N, 2), np.float32)
        mask = np.zeros((B, N), bool)
        idx = self.rng.randint(0, len(self.windows), B)
        for b, i in enumerate(idx):
            w = self.windows[i]                           # (T, n, 2)
            n = w.shape[1]
            traj[b, :, :n] = w
            mask[b, :n] = True
        tokens = build_tokens(traj)
        tokens, _ = normalize_scene(tokens)
        obs = tokens[:, :OBS_FRAMES]
        gt_future = tokens[:, OBS_FRAMES:, 0, 0, :2]
        return (jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(gt_future))

    def batches(self, batch_size, num_batches) -> Iterator:
        for _ in range(num_batches):
            yield self.batch(batch_size)
