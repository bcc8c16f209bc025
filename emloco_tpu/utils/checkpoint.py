"""Checkpoint save/load for pytrees.

Replaces the reference's rl_games .pth checkpointing (common_agent.py:248-265
incl. periodic/intermediate saves and the valuenet-only export that feeds the
prediction side, train_jta.py:198-204). Trees are materialized to host numpy
and pickled — dependency-light, layout-free, and loadable from any process
(the same role .pth plays for the reference).
"""
from __future__ import annotations

import os
import pickle
import re
from typing import Any, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any, metadata: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        pickle.dump({"tree": host, "metadata": metadata or {}}, f)


def load_pytree(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return blob["tree"], blob.get("metadata", {})


def save_valuenet(path: str, vnet_params, config: Optional[dict] = None):
    """Valuenet-only export — the artifact consumed by the prediction stack
    (reference *_valuenet_*.pth, common_agent.py:252,264)."""
    save_pytree(path, vnet_params, {"kind": "valuenet", "config": config})


def latest_checkpoint(directory: str, pattern: str = r".*_(\d+)\.ckpt"):
    """Resolve the newest checkpoint by epoch number (reference --epoch -1
    resolution, utils/config.py:109-116)."""
    if not os.path.isdir(directory):
        return None
    best, best_ep = None, -1
    for f in os.listdir(directory):
        m = re.match(pattern, f)
        if m and int(m.group(1)) > best_ep:
            best_ep = int(m.group(1))
            best = os.path.join(directory, f)
    return best
