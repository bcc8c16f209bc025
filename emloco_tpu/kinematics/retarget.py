"""Motion retargeting between skeletons.

Counterpart of poselib's SkeletonState.retarget_to / retarget_to_by_tpose
(/root/reference/pacer/poselib/poselib/skeleton/skeleton3d.py:813-1025):
map a motion from a source skeleton to a target skeleton through T-pose
calibration. The recipe, step-for-step with the reference:

  1. align the source with the target frame (`rotation_to_target`, t_R_s —
     pre-multiplies every global rotation and rotates the root path);
  2. root translation = target-tpose root + (source root − source-tpose
     root, in the target frame) × `scale` (skeleton3d.py:936-941, 973-975);
  3. per mapped joint, the global delta from the source T-pose is
     transplanted onto the target T-pose orientation
     (delta = g_src · g_src_tposeᵀ; g_tgt = delta · g_tgt_tpose,
     skeleton3d.py:944-960);
  4. unmapped TARGET joints rigidly follow their nearest MAPPED ancestor's
     retargeted global rotation (the reference's step-5 parent walk,
     skeleton3d.py:962-975) — not their own T-pose;
  5. convert back to local rotations on the target tree.

Measured against the reference implementation on CPU torch in
tests/test_reference_parity.py::test_retarget_by_tpose_parity.

Pure jnp; batched over frames.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops import quat
from .skeleton import SkeletonTree, forward_kinematics, local_from_global


def _auto_leg_scale(source_tree: SkeletonTree,
                    target_tree: SkeletonTree) -> float:
    """Leg-length ratio (hip-chain drop at T-pose) — the scale heuristic for
    callers without a calibrated unit factor."""
    def leg(tree):
        lt = tree.local_translation
        drop = 0.0
        j = None
        for cand in ("L_Ankle", "l_ankle", "LeftFoot"):
            if cand in tree.names:
                j = tree.index(cand)
                break
        if j is None:
            return 1.0
        while tree.parents[j] >= 0:
            drop += abs(float(lt[j][2]))
            j = int(tree.parents[j])
        return max(drop, 1e-3)

    return leg(target_tree) / leg(source_tree)


def retarget_motion(
    source_tree: SkeletonTree,
    target_tree: SkeletonTree,
    joint_map: Dict[str, str],          # target joint name → source joint name
    source_local_rot: jnp.ndarray,      # (F, Js, 4)
    source_root_pos: jnp.ndarray,       # (F, 3)
    source_tpose_rot: jnp.ndarray = None,   # (Js, 4) source T-pose local rots
    target_tpose_rot: jnp.ndarray = None,   # (Jt, 4)
    source_tpose_root: jnp.ndarray = None,  # (3,) source T-pose root position
    target_tpose_root: jnp.ndarray = None,  # (3,)
    rotation_to_target: jnp.ndarray = None,  # (4,) t_R_s frame alignment
    scale: float = None,
):
    """Returns (target_local_rot (F, Jt, 4), target_root_pos (F, 3)).

    The target skeleton's ROOT must be a mapped joint (as in every reference
    use — the parent walk for unmapped joints terminates at a mapped
    ancestor)."""
    F = source_local_rot.shape[0]
    Js = source_tree.num_joints
    Jt = target_tree.num_joints
    if source_tpose_rot is None:
        source_tpose_rot = quat.identity_like((Js,))
    if target_tpose_rot is None:
        target_tpose_rot = quat.identity_like((Jt,))
    if source_tpose_root is None:
        source_tpose_root = jnp.zeros((3,))
    if target_tpose_root is None:
        target_tpose_root = jnp.zeros((3,))
    if scale is None:
        scale = _auto_leg_scale(source_tree, target_tree)

    # global T-pose rotations for both skeletons
    src_tpose_g, _ = forward_kinematics(
        source_tree, source_tpose_rot[None], source_tpose_root[None])
    tgt_tpose_g, _ = forward_kinematics(
        target_tree, target_tpose_rot[None], target_tpose_root[None])
    src_tpose_g = src_tpose_g[0]
    tgt_tpose_g = tgt_tpose_g[0]

    # motion global rotations on the source
    src_g, _ = forward_kinematics(source_tree, source_local_rot,
                                  source_root_pos)
    src_root = source_root_pos
    src_tpose_root = source_tpose_root

    # frame alignment: pre-multiply all globals, rotate root paths
    # (skeleton3d.py:913-932 rotates the root local rotation and the root
    # translation of both the state and the source tpose)
    if rotation_to_target is not None:
        R = rotation_to_target
        src_g = quat.mul(R[None, None], src_g)
        src_tpose_g = quat.mul(R[None], src_tpose_g)
        src_root = quat.rotate(R[None], src_root)
        src_tpose_root = quat.rotate(R, src_tpose_root)

    # mapped joints: transplant the source delta onto the target T-pose
    tgt_g = jnp.tile(tgt_tpose_g[None], (F, 1, 1))
    mapped = set()
    for t_name, s_name in joint_map.items():
        ti = target_tree.index(t_name)
        si = source_tree.index(s_name)
        mapped.add(ti)
        delta = quat.mul(src_g[:, si], quat.conjugate(src_tpose_g[si][None]))
        tgt_g = tgt_g.at[:, ti].set(quat.mul(delta, tgt_tpose_g[ti][None]))

    # unmapped target joints follow the nearest mapped ancestor (reference
    # step 5, skeleton3d.py:962-975)
    for ti in range(Jt):
        if ti in mapped:
            continue
        a = ti
        while a not in mapped:
            a = int(target_tree.parents[a])
            assert a >= 0, "target root must be a mapped joint"
        tgt_g = tgt_g.at[:, ti].set(tgt_g[:, a])

    target_local = local_from_global(target_tree, tgt_g)
    target_root_pos = target_tpose_root[None] \
        + (src_root - src_tpose_root[None]) * scale
    return target_local, target_root_pos
