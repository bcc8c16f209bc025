"""Motion dataset curation — filter/merge/split/augment motion dicts.

Counterpart of the reference's offline data tooling:
  * data_tree.py (motion dataset curation, pacer/pacer/utils/data_tree.py)
  * convert_amass_isaac.py (upright correction + left-right flip
    augmentation, uhc/data_process/convert_amass_isaac.py:292-321)

Operates on the reference pkl schema ({name: {pose_aa, root_trans_offset,
beta, fps}}) so curated sets flow straight into motion_lib.load_reference_pkl.
"""
from __future__ import annotations

import pickle
from typing import Callable, Dict, Optional, Sequence

import numpy as np

# SMPL left/right joint swap (pose_aa layout)
from .body_model import BODY_NAMES


def load_motion_dict(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_motion_dict(d: Dict, path: str):
    with open(path, "wb") as f:
        pickle.dump(d, f)


def filter_motions(d: Dict, min_seconds: float = 1.0,
                   max_seconds: Optional[float] = None,
                   name_allowlist: Optional[Sequence[str]] = None,
                   predicate: Optional[Callable] = None) -> Dict:
    """Duration/name/predicate filtering (curated-list semantics of
    convert_amass_isaac.py:27-200)."""
    out = {}
    for name, m in d.items():
        fps = float(m.get("fps", 30.0))
        dur = len(np.asarray(m["pose_aa"])) / fps
        if dur < min_seconds:
            continue
        if max_seconds is not None and dur > max_seconds:
            continue
        if name_allowlist is not None and not any(
                a in name for a in name_allowlist):
            continue
        if predicate is not None and not predicate(name, m):
            continue
        out[name] = m
    return out


def merge_motion_dicts(*dicts: Dict) -> Dict:
    out = {}
    for i, d in enumerate(dicts):
        for k, v in d.items():
            out[f"{k}" if k not in out else f"{k}__{i}"] = v
    return out


def train_test_split(d: Dict, test_frac: float = 0.1, seed: int = 0):
    rng = np.random.RandomState(seed)
    names = sorted(d)
    rng.shuffle(names)
    n_test = max(1, int(len(names) * test_frac))
    test = {n: d[n] for n in names[:n_test]}
    train = {n: d[n] for n in names[n_test:]}
    return train, test


_MIRROR_JOINT = None


def _mirror_joint_index():
    global _MIRROR_JOINT
    if _MIRROR_JOINT is None:
        out = []
        for n in BODY_NAMES:
            if n.startswith("L_"):
                out.append(BODY_NAMES.index("R_" + n[2:]))
            elif n.startswith("R_"):
                out.append(BODY_NAMES.index("L_" + n[2:]))
            else:
                out.append(BODY_NAMES.index(n))
        _MIRROR_JOINT = np.array(out)
    return _MIRROR_JOINT


def flip_motion_lr(m: Dict) -> Dict:
    """Left-right mirror a motion (the reference's flip augmentation,
    convert_amass_isaac.py:302-304, re-derived for our z-up frame): swap L/R
    joints and mirror every rotation across the y=0 (xz) plane. For a
    reflection M=diag(1,-1,1), M·R(a,θ)·M = R(Ma,−θ), so the axis-angle
    vector transforms (x,y,z) → (−x, y, −z); root translation flips y."""
    pose = np.asarray(m["pose_aa"], np.float32).reshape(-1, 24, 3).copy()
    pose = pose[:, _mirror_joint_index()]
    pose[..., 0] *= -1.0
    pose[..., 2] *= -1.0
    trans = np.asarray(m["root_trans_offset"], np.float32).copy()
    trans[:, 1] *= -1.0
    out = dict(m)
    out["pose_aa"] = pose.reshape(-1, 72)
    out["root_trans_offset"] = trans
    return out


def augment_with_flips(d: Dict) -> Dict:
    out = dict(d)
    for name, m in d.items():
        out[name + "_flip"] = flip_motion_lr(m)
    return out
