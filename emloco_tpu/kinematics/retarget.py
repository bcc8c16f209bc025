"""Motion retargeting between skeletons.

Counterpart of poselib's SkeletonState.retarget_to / retarget_to_by_tpose
(/root/reference/pacer/poselib/poselib/skeleton/skeleton3d.py:813-1025):
map a motion from a source skeleton to a target skeleton through T-pose
calibration — per-joint rotation deltas measured against each skeleton's
T-pose, root translation rescaled by leg length.

Pure jnp; batched over frames.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import quat
from .skeleton import SkeletonTree, forward_kinematics, local_from_global


def retarget_motion(
    source_tree: SkeletonTree,
    target_tree: SkeletonTree,
    joint_map: Dict[str, str],          # target joint name → source joint name
    source_local_rot: jnp.ndarray,      # (F, Js, 4)
    source_root_pos: jnp.ndarray,       # (F, 3)
    source_tpose_rot: jnp.ndarray = None,   # (Js, 4) source T-pose local rots
    target_tpose_rot: jnp.ndarray = None,   # (Jt, 4)
    scale: float = None,
):
    """Returns (target_local_rot (F, Jt, 4), target_root_pos (F, 3)).

    Per mapped joint: global delta from the source T-pose is transplanted to
    the target T-pose orientation (the by-tpose recipe, skeleton3d.py:875-988).
    Unmapped target joints hold their T-pose rotation.
    """
    F = source_local_rot.shape[0]
    Js = source_tree.num_joints
    Jt = target_tree.num_joints
    if source_tpose_rot is None:
        source_tpose_rot = quat.identity_like((Js,))
    if target_tpose_rot is None:
        target_tpose_rot = quat.identity_like((Jt,))

    # global T-pose rotations for both skeletons
    src_tpose_g, _ = forward_kinematics(
        source_tree, source_tpose_rot[None], jnp.zeros((1, 3)))
    tgt_tpose_g, tgt_tpose_pos = forward_kinematics(
        target_tree, target_tpose_rot[None], jnp.zeros((1, 3)))
    src_tpose_g = src_tpose_g[0]
    tgt_tpose_g = tgt_tpose_g[0]

    # motion global rotations on the source
    src_g, src_pos = forward_kinematics(source_tree, source_local_rot,
                                        source_root_pos)

    # target global rotations: delta(source) applied on target T-pose
    tgt_g = jnp.tile(tgt_tpose_g[None], (F, 1, 1))
    for t_name, s_name in joint_map.items():
        ti = target_tree.index(t_name)
        si = source_tree.index(s_name)
        delta = quat.mul(src_g[:, si], quat.conjugate(src_tpose_g[si][None]))
        tgt_g = tgt_g.at[:, ti].set(quat.mul(delta, tgt_tpose_g[ti][None]))

    target_local = local_from_global(target_tree, tgt_g)

    if scale is None:
        # leg-length ratio (hip chain drop at T-pose)
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

        scale = leg(target_tree) / leg(source_tree)
    target_root_pos = source_root_pos * scale
    return target_local, target_root_pos
