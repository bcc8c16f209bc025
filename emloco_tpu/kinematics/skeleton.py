"""Skeleton tree + forward kinematics.

TPU-native counterpart of the reference's poselib
(/root/reference/pacer/poselib/poselib/skeleton/skeleton3d.py:21-508):
`SkeletonTree` holds static topology (host-side numpy); FK is a pure jnp
function that processes joints in topological order. Because parent indices in
our canonical humanoid are strictly increasing, a statically unrolled loop over
the (small, fixed) joint count is trace-time constant and fuses into one XLA
computation — no dynamic control flow.

Quaternions are [x, y, z, w]; see emloco_tpu.ops.quat.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import quat


@dataclasses.dataclass(frozen=True, eq=False)
class SkeletonTree:
    """Static skeleton topology. Immutable, hashable by identity (eq=False so
    it can be a static jit argument), host-side."""

    names: Tuple[str, ...]
    parents: np.ndarray          # (J,) int, -1 for root; parents[j] < j
    local_translation: np.ndarray  # (J, 3) float, rest offset in parent frame

    def __post_init__(self):
        p = np.asarray(self.parents)
        assert p[0] == -1 and np.all(p[1:] < np.arange(1, len(p))), (
            "joints must be topologically sorted (parent index < child index)"
        )

    @property
    def num_joints(self) -> int:
        return len(self.names)

    def index(self, name: str) -> int:
        return self.names.index(name)

    @property
    def levels(self) -> Sequence[np.ndarray]:
        """Joints grouped by tree depth (root first). FK dependency chain =
        depth of tree (~8 for the humanoid), not joint count."""
        depth = np.zeros(self.num_joints, dtype=np.int64)
        for j in range(1, self.num_joints):
            depth[j] = depth[self.parents[j]] + 1
        return [np.where(depth == d)[0] for d in range(int(depth.max()) + 1)]


def forward_kinematics(
    tree: SkeletonTree,
    local_rot: jnp.ndarray,       # (..., J, 4) local joint rotations
    root_pos: jnp.ndarray,        # (..., 3) world root translation
    local_translation: jnp.ndarray | None = None,  # (..., J, 3) override (per-env shapes)
):
    """Compute world-frame joint rotations and positions.

    Matches the semantics of poselib SkeletonState.global_transformation
    (reference skeleton3d.py:420-450): child world rot = parent world rot *
    local rot; child world pos = parent pos + parent world rot @ local offset.

    Returns (global_rot (..., J, 4), global_pos (..., J, 3)).
    """
    J = tree.num_joints
    if local_translation is None:
        local_translation = jnp.asarray(tree.local_translation, dtype=local_rot.dtype)
        local_translation = jnp.broadcast_to(
            local_translation, local_rot.shape[:-2] + (J, 3)
        )

    parents = tree.parents
    # Level-parallel rotations: the dependency chain is the tree DEPTH (~9 for
    # the humanoid), not the joint count (24) — each level is ONE batched quat
    # mul + gather instead of 23 tiny sequential kernels (TPU latency).
    global_rot = jnp.zeros(local_rot.shape, local_rot.dtype)
    global_rot = global_rot.at[..., 0, :].set(local_rot[..., 0, :])
    for idx in tree.levels[1:]:
        p = parents[idx]
        gr = quat.mul(global_rot[..., p, :], local_rot[..., idx, :])
        global_rot = global_rot.at[..., idx, :].set(gr)

    # Positions close-form once rotations are known:
    #   pos[j] = root + Σ_{a on root→j path, a≠root} R_global[parent(a)]·t_a
    # — a single (J,J) ancestor-mask contraction, fully parallel.
    pa = np.maximum(parents, 0)
    contrib = quat.rotate(global_rot[..., pa, :], local_translation)
    anc = np.zeros((J, J), local_rot.dtype)          # anc[a,j]: a on path to j
    for j in range(1, J):
        anc[j, j] = 1.0
        anc[:, j] += anc[:, parents[j]]
    anc[0, :] = 0.0
    global_pos = (root_pos[..., None, :]
                  + jnp.einsum("...ad,aj->...jd", contrib, jnp.asarray(anc)))
    return global_rot, global_pos


def local_from_global(tree: SkeletonTree, global_rot: jnp.ndarray) -> jnp.ndarray:
    """Invert FK rotations: local[j] = conj(global[parent]) * global[j].

    Reference: skeleton3d.py:487-508 (local_rotation from global).
    """
    parents = jnp.asarray(np.maximum(tree.parents, 0))
    parent_rot = jnp.take(global_rot, parents, axis=-2)
    local = quat.mul(quat.conjugate(parent_rot), global_rot)
    return local.at[..., 0, :].set(global_rot[..., 0, :])
