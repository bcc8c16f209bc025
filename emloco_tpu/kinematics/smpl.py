"""SMPL body model forward (LBS) in jax.

Counterpart of the reference's SMPL_Parser (uhc/smpllib/smpl_parser.py:258-495
wrapping the `smplx` package): given shape betas and a 72-d axis-angle pose,
produce the 24 joints and the skinned vertex mesh via linear blend skinning.

Model files (SMPL npz with v_template/shapedirs/posedirs/J_regressor/
lbs_weights/kintree) plug in when present; without them `capsule_surface`
provides geometry-consistent pseudo-vertices from the capsule body so every
downstream consumer (mesh ground-height fix, pose visualization, robot
construction) stays runnable.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import quat
from . import body_model as bm
from .skeleton import forward_kinematics


@dataclasses.dataclass(frozen=True, eq=False)
class SMPLModel:
    v_template: np.ndarray     # (V, 3)
    shapedirs: np.ndarray      # (V, 3, K)
    posedirs: Optional[np.ndarray]   # (V, 3, 207) or None
    j_regressor: np.ndarray    # (24, V)
    lbs_weights: np.ndarray    # (V, 24)
    parents: np.ndarray        # (24,)

    @classmethod
    def load_npz(cls, path: str) -> "SMPLModel":
        d = np.load(path, allow_pickle=True)
        get = lambda k: np.asarray(d[k], np.float32) if k in d else None
        sd = get("shapedirs")
        pd = get("posedirs")
        if pd is not None and pd.ndim == 2:   # (V*3, 207) layout
            pd = pd.reshape(-1, 3, pd.shape[-1])
        return cls(
            v_template=get("v_template"),
            shapedirs=sd,
            posedirs=pd,
            j_regressor=get("J_regressor"),
            lbs_weights=get("weights"),
            parents=np.asarray(d["kintree_table"])[0][:24].astype(np.int64)
            if "kintree_table" in d else bm.PARENTS,
        )


def get_joints_verts(model: SMPLModel, pose_aa: jnp.ndarray,
                     betas: jnp.ndarray, trans: jnp.ndarray = None):
    """LBS forward (reference smpl_parser.py:343-368 semantics).

    pose_aa (B, 72) axis-angle, betas (B, K), trans (B, 3) →
    (verts (B, V, 3), joints (B, 24, 3)).
    """
    B = pose_aa.shape[0]
    K = min(model.shapedirs.shape[-1], betas.shape[-1])
    v_shaped = jnp.asarray(model.v_template)[None] + jnp.einsum(
        "vdk,bk->bvd", jnp.asarray(model.shapedirs[..., :K]), betas[:, :K])
    j_rest = jnp.einsum("jv,bvd->bjd", jnp.asarray(model.j_regressor),
                        v_shaped)                           # (B,24,3)

    pose = pose_aa.reshape(B, 24, 3)
    rots = quat.exp_map_to_quat(pose)                       # (B,24,4)

    # pose blendshapes (rotation-matrix deviation from identity)
    if model.posedirs is not None:
        R = quat.to_matrix(rots[:, 1:])                     # (B,23,3,3)
        feat = (R - jnp.eye(3)).reshape(B, -1)              # (B,207)
        v_shaped = v_shaped + jnp.einsum(
            "vdp,bp->bvd", jnp.asarray(model.posedirs), feat)

    # rest-pose offsets in parent frame → FK
    parents = np.maximum(model.parents, 0)
    offsets = j_rest - j_rest[:, parents]
    offsets = offsets.at[:, 0].set(0.0)

    # forward kinematics with per-sample offsets via the canonical tree shape
    tree = bm.canonical_skeleton()
    grot, gpos = forward_kinematics(tree, rots, j_rest[:, 0],
                                    local_translation=offsets)

    # skinning: v' = Σ_j w_j (R_j (v − j_rest_j) + g_j)
    rel = v_shaped[:, None] - j_rest[:, :, None]            # (B,24,V,3)
    posed = quat.rotate(grot[:, :, None], rel) + gpos[:, :, None]
    verts = jnp.einsum("vj,bjvd->bvd", jnp.asarray(model.lbs_weights), posed)
    if trans is not None:
        verts = verts + trans[:, None]
        gpos = gpos + trans[:, None]
    return verts, gpos


def capsule_surface(params: bm.BodyParams, body_pos, body_rot,
                    points_per_body: int = 8):
    """Pseudo-vertices: points on each capsule surface in world frame —
    the model-file-free stand-in for the SMPL mesh (used e.g. for the mesh
    ground-height fix, reference motion_lib_smpl.py:70-80).

    body_pos/body_rot: COM frames (N, 24, ·) → (N, 24·P, 3)."""
    P = points_per_body
    t = np.linspace(-1.0, 1.0, P).astype(np.float32)        # along the axis
    ax = params.capsule_axis[:, :, None] * \
        (params.capsule_half[:, :, None, None] * t[None, None, :, None])
    # alternate radial offsets in the body frame
    radial = np.stack([np.cos(np.arange(P) * 2.4),
                       np.sin(np.arange(P) * 2.4)], -1).astype(np.float32)
    rad = jnp.concatenate(
        [jnp.asarray(radial), jnp.zeros((P, 1))], -1)       # (P,3)
    offs = ax + params.capsule_radius[:, :, None, None] * rad[None, None]
    pts = body_pos[:, :, None] + quat.rotate(body_rot[:, :, None], offs)
    return pts.reshape(body_pos.shape[0], -1, 3)
