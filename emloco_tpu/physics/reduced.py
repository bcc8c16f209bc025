"""Reduced-coordinate articulated dynamics — the engine core.

TPU-native replacement for PhysX articulations (the closed-source core behind
isaacgym's humanoid sim; solver config pacer/pacer/data/cfg/pacer.yaml:93-104).
PhysX solves articulations in reduced coordinates (Featherstone + TGS); a
maximal-coordinate positional solver cannot deliver the reference's stiff PD
gains (kp up to 1000, GAINS table uhc/khrylib/mocap/skeleton_mesh_local.py:14-38)
through light limbs. This module instead builds the full generalized-coordinate
equations of motion and solves ONE symmetric-positive-definite 75×75 linear
system per substep with everything implicit:

    A u⁺ = M u + dt·(Q_gravity + Q_bias + Q_spring + Q_contact_explicit)
    A    = M + dt·D + dt²·K + dt·Jcᵀ(dt·k_n + d_n)·n nᵀ·Jc + dt·d_t·JcᵀT Jc

  * Joints are EXACT by construction (they are the coordinates).
  * PD drives use Stable PD (Tan et al. 2011): spring+damper folded into the
    LHS → unconditionally stable for any kp/kd, effective stiffness exactly kp
    (matches PhysX DOF_MODE_POS drives, reference humanoid.py:906).
  * Contacts are implicit spring-dampers (normal) + implicit viscous friction
    with a Coulomb-limited coefficient — smooth, differentiable, stable.

Why this is the TPU-native shape: per control step the whole sim reduces to
batched dense linear algebra over (N_env, 75, 75) — mass-matrix assembly from
per-subtree moment aggregates (einsums), one batched Cholesky, two triangular
solves. MXU work, static shapes, no branching; the rollout lives in one
`lax.scan`.

Generalized coordinates (75 DOF):
  u = [v_root(3, world), ω_root(3, world), qd_1..23 (world-frame relative
       angular velocity of each spherical joint, 3 each)]
Positions: root_pos, root_rot, and 23 relative joint quaternions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..kinematics import body_model as bm
from ..kinematics.skeleton import forward_kinematics
from ..ops import quat
from .terrain import (Heightfield, corner_patch, height_and_normal_at,
                      height_and_normal_at_patch)
from .types import EngineConfig

B = bm.NUM_BODIES            # 24
NJ = B - 1                   # 23 spherical joints
NU = 6 + 3 * NJ              # 75
PARENTS = bm.PARENTS


def _subtree_masks(parents: np.ndarray) -> np.ndarray:
    sub = np.zeros((len(parents) - 1, len(parents)), np.float32)
    for j in range(1, len(parents)):
        stack = [j]
        while stack:
            b = stack.pop()
            sub[j - 1, b] = 1.0
            stack.extend([k for k in range(len(parents)) if parents[k] == b])
    return sub


_SUB = _subtree_masks(PARENTS)                    # (23, 24)


def _arrow_blocks(parents: np.ndarray = PARENTS):
    """Block-arrow structure of the reduced-coordinate system matrix.

    M[i,j] ≠ 0 only for DoFs on a common root-to-leaf path, so with DoFs
    ordered [limb chains | shared trunk + root] the matrix is block-arrow
    and a Cholesky in that order has zero fill-in (Featherstone's
    branch-induced sparsity). Returns (chunks, limbs, s_lo) for
    pallas_linalg.cholesky_solve_blocked_t: `chunks` lists OLD dof ranges in
    NEW order (the permutation as contiguous moves), `limbs` the dense
    diagonal blocks in NEW coordinates, `s_lo` the start of the shared
    block. Derived from the tree, not hard-coded — any parents array works.
    """
    n = len(parents)
    kids = {i: [] for i in range(n)}
    for i in range(1, n):
        kids[int(parents[i])].append(i)
    # shared set: every body with ≥2 children, and all its ancestors
    shared = set()
    for b in range(n):
        if len(kids[b]) >= 2:
            a = b
            while a != -1:
                shared.add(a)
                a = int(parents[a])
    # limb components: connected non-shared bodies (parents precede children
    # in body order, so one forward pass suffices)
    comp_id, comps = {}, []
    for b in range(1, n):
        if b in shared:
            continue
        p = int(parents[b])
        if p in comp_id:
            cid = comp_id[p]
        else:
            cid = len(comps)
            comps.append([])
        comp_id[b] = cid
        comps[cid].append(b)

    def dof_ranges(bodies):
        """Merge consecutive bodies into contiguous old-dof ranges."""
        out = []
        for b in sorted(bodies):
            lo, hi = 6 + 3 * (b - 1), 6 + 3 * b
            if out and out[-1][1] == lo:
                out[-1] = (out[-1][0], hi)
            else:
                out.append((lo, hi))
        return out

    chunks, limbs, off = [], [], 0
    for comp in comps:
        chunks += dof_ranges(comp)
        limbs.append((off, off + 3 * len(comp)))
        off += 3 * len(comp)
    s_lo = off
    chunks += dof_ranges([b for b in sorted(shared) if b != parents[0] + 1
                          and b != 0])
    chunks.append((0, 6))                       # root last
    return tuple(chunks), tuple(limbs), s_lo


_ARROW_CHUNKS, _ARROW_LIMBS, _ARROW_S = _arrow_blocks()

# extended "joint" list: index 0 = root angular DOF (pivot = root COM, mask =
# all bodies); 1..23 = real joints. Used for uniform mass-matrix assembly.
_SUBX = np.concatenate([np.ones((1, B), np.float32), _SUB], 0)   # (24, 24)

# Static Jacobian scaffolding (TPU layout note: all hot tensors fold the
# (body, 3) axes into rows of 72 and keep NU=75 as the trailing dim — small
# trailing dims of 3 pad to 128 lanes on TPU and cost ~40-100× memory traffic).
#
# JW_EXT[k, j, c] = 1 where generalized velocity column c (among the 72
# angular columns: root-ang at a=0, joints a=1..23) contributes ω_j to body k:
# c = 3·a + j for every extended joint a that is an ancestor of k.
_JW_EXT = np.zeros((B, 3, 3 * (NJ + 1)), np.float32)
for k in range(B):
    for a in range(NJ + 1):
        if _SUBX[a, k] > 0:
            for j in range(3):
                _JW_EXT[k, j, 3 * a + j] = 1.0
# COL_EXT[a, j, c] = 1 at c = 3·a + j (per-extended-joint column selector)
_COL_EXT = np.zeros((NJ + 1, 3, 3 * (NJ + 1)), np.float32)
for a in range(NJ + 1):
    for j in range(3):
        _COL_EXT[a, j, 3 * a + j] = 1.0

# ε-contracted static tensors: fold the cross-product (skew) structure into
# the column selectors so Jacobian assembly is a single batched matmul per
# term and NO (N, ·, 3, 3) skew tensor is materialized (TPU: a (3,3) trailing
# tile pads to (8,128) ≈ 113× memory traffic).
#   skew(r)[i,l] = Σ_j ε_ijl·... concretely: (−[r]× @ S)[i,c] = Σ_j r_j·E[j,i,c]
#   with E[j,i,c] = −Σ_l eps[i,j→]  — we build E by direct construction.
def _eps_fold(sel):
    """sel (K, 3, C) one-hot column selector → E (K, 3, 3, C) such that
    Σ_j r_j·E[k, j, i, c] == (−[r]× @ sel[k])[i, c]."""
    K, _, C = sel.shape
    out = np.zeros((K, 3, 3, C), np.float32)
    # −[r]×[i, l]: [[0, r2, −r1], [−r2, 0, r0], [r1, −r0, 0]]
    terms = {(0, 1): (2, 1.0), (0, 2): (1, -1.0),
             (1, 0): (2, -1.0), (1, 2): (0, 1.0),
             (2, 0): (1, 1.0), (2, 1): (0, -1.0)}
    for (i, l), (j, sgn) in terms.items():
        out[:, j, i, :] += sgn * sel[:, l, :]
    return out


_EPS_JW = _eps_fold(_JW_EXT)                      # (B,3,3,72): Σ_j x_j·E → −[x]×·JW
_EPS_COL = _eps_fold(_COL_EXT)                    # (24ext,3,3,72) for +[p]× use −E

# ---------------------------------------------------------------------------
# Row-merged static scaffolding (the PRODUCTION substep layout).
#
# The hot per-substep tensors are emitted ROW-MERGED: body rows (k, i) fold
# to m = 3k+i, giving (N, 72, 72) Jacobian blocks whose (72, 72) minor dims
# tile-pad only 1.78× — vs ~4.5× for the (·, 3, 75) 4-D layout. Measured
# 1.67× on the Jacobian-build + LHS/RHS assembly chain at 4,096 envs on chip
# (scripts/layout_bench.py, faithful feedback harness). No reshapes anywhere:
# the dots against these e-folded static tensors EMIT the merged layout.
#
# The linear (root-translation) columns are not stored: Jv's linear block is
# identity per body and W's is zero, so the 75×75 LHS is composed from
# 72×72 (ang-ang) / 3×72 (lin-ang) / 3×3 (lin-lin) blocks analytically.
# The 4-D builders below (_build_jacobians & co.) remain as the oracle the
# equivalence tests check the merged path against.
# ---------------------------------------------------------------------------
NA = 3 * (NJ + 1)            # 72 angular generalized-velocity columns
MROWS = 3 * B                # 72 merged body rows (m = 3k + i)

# term1: E1M[k, j, 3k+i, c] = _EPS_JW[k, j, i, c]  (−[x_k]×·JW, merged rows)
_E1_M = np.zeros((B, 3, MROWS, NA), np.float32)
for _k in range(B):
    _E1_M[_k, :, 3 * _k:3 * _k + 3, :] = _EPS_JW[_k]
# term2: FM[a, j, 3k+i, c] = SUBX[a, k]·(−EPS_COL[a, j, i, c])  (+[p_a]×,
# ancestry-masked, merged rows) — reshape of a NUMPY constant, not a trace op
_F_M = np.ascontiguousarray(
    np.einsum("ak,ajic->ajkic", _SUBX, -_EPS_COL)
    .reshape(NJ + 1, 3, MROWS, NA).astype(np.float32))
# W: TWM[k, j, i, 3k+i, c] = _JW_EXT[k, j, c] → Σ_{kji} R[n,k,j,i]·TWM = RᵀJw
_TW_M = np.zeros((B, 3, 3, MROWS, NA), np.float32)
for _k in range(B):
    for _i in range(3):
        _TW_M[_k, :, _i, 3 * _k + _i, :] = _JW_EXT[_k]
# stacked [term1 | term2] static: G = einsum("nkj,kjmc", [x | pivots], _G_M)
# emits the merged body rows in ONE dot (no separate t1m f32 intermediate)
_G_M = np.concatenate([_E1_M, _F_M], axis=0)             # (48, 3, 72, 72)
# (N,B,3) → (N,72) merger (one-hot contraction, not a tiled-minor reshape)
_FL_M = np.zeros((B, 3, MROWS), np.float32)
for _k in range(B):
    for _i in range(3):
        _FL_M[_k, _i, 3 * _k + _i] = 1.0
# merged row m → xyz component selector (i = m % 3)
_ISEL_M = np.tile(np.eye(3, dtype=np.float32), (B, 1))   # (72, 3)


@functools.lru_cache(maxsize=None)
def _merged_point_statics(bodies_key: str):
    """Static tensors for merged point-Jacobian rows of a contact table.

    Returns (E1C, OH, P, FLC, ISELC) as numpy:
      E1C (C,3,RC,72)  — −[pt]×·JW folded per row block (RC = 3C)
      OH  (RC,72)      — row r → merged body row 3·body(r//3) + r%3
                         (signed for the self-pair table: +A, −B)
      P   (C,RC)       — per-contact sum over its 3 rows
      FLC (C,3,RC)     — (N,C,3) → (N,RC) one-hot merger
      ISELC (RC,3)     — row → xyz selector
    """
    C_TABLES = {"capsule": _CONTACT_BODY, "mesh": _MESH_BODY}
    RCn = None
    if bodies_key == "self":
        C = NSELF
        RCn = 3 * C
        E1C = np.zeros((C, 2, 3, RCn, NA), np.float32)
        OH = np.zeros((RCn, MROWS), np.float32)
        for ci in range(C):
            E1C[ci, 0, :, 3 * ci:3 * ci + 3, :] = _EPS_JW[_SELF_A[ci]]
            E1C[ci, 1, :, 3 * ci:3 * ci + 3, :] = -_EPS_JW[_SELF_B[ci]]
        for r in range(RCn):
            OH[r, 3 * _SELF_A[r // 3] + r % 3] += 1.0
            OH[r, 3 * _SELF_B[r // 3] + r % 3] -= 1.0
    else:
        bodies = C_TABLES[bodies_key]
        C = len(bodies)
        RCn = 3 * C
        E1C = np.zeros((C, 3, RCn, NA), np.float32)
        OH = np.zeros((RCn, MROWS), np.float32)
        for ci in range(C):
            E1C[ci, :, 3 * ci:3 * ci + 3, :] = _EPS_JW[bodies[ci]]
        for r in range(RCn):
            OH[r, 3 * bodies[r // 3] + r % 3] = 1.0
    P = np.zeros((C, RCn), np.float32)
    FLC = np.zeros((C, 3, RCn), np.float32)
    for ci in range(C):
        P[ci, 3 * ci:3 * ci + 3] = 1.0
        for i in range(3):
            FLC[ci, i, 3 * ci + i] = 1.0
    ISELC = np.tile(np.eye(3, dtype=np.float32), (C, 1))
    return E1C, OH, P, FLC, ISELC


class PhysicsState(struct.PyTreeNode):
    """Reduced-coordinate state + maximal-coordinate body cache.

    The cache (body_*) is the frame the reference exposes as its rigid-body
    state tensors (isaacgym tensors.rst:52-230) and what obs kernels consume.
    body_x/body_q are COM frames; use engine.body_frame_state for joint-pivot
    frames.
    """

    root_pos: jnp.ndarray      # (N, 3) root COM position
    root_rot: jnp.ndarray      # (N, 4)
    joint_rot: jnp.ndarray     # (N, 23, 4) relative quats (child in parent)
    u: jnp.ndarray             # (N, 75) generalized velocity
    body_x: jnp.ndarray        # (N, 24, 3) COM positions
    body_q: jnp.ndarray        # (N, 24, 4)
    body_v: jnp.ndarray        # (N, 24, 3) COM velocities
    body_w: jnp.ndarray        # (N, 24, 3) angular velocities
    contact_force: jnp.ndarray  # (N, 24, 3)

    @property
    def num_envs(self):
        return self.root_pos.shape[0]


class Model(struct.PyTreeNode):
    """Engine-ready batched body data derived from BodyParams."""

    params: bm.BodyParams
    com_off: jnp.ndarray       # (N,B,3) capsule center in joint (pivot) frame
    anchor_c: jnp.ndarray      # (N,B,3) own pivot in COM frame (= -com_off)

    @property
    def num_envs(self):
        return self.com_off.shape[0]


def build_model(params: bm.BodyParams) -> Model:
    com_off = (params.capsule_start
               + params.capsule_axis * params.capsule_half[..., None])
    return Model(params=params, com_off=com_off, anchor_c=-com_off)


# ---------------------------------------------------------------------------
# Kinematics: reduced state → body frames
# ---------------------------------------------------------------------------

def _fk(model: Model, root_pos, root_rot, joint_rot, tree):
    local_rot = jnp.concatenate([root_rot[:, None], joint_rot], axis=1)
    grot, gpos_pivot = forward_kinematics(
        tree, local_rot, root_pos_pivot_from_com(model, root_pos, root_rot),
        local_translation=model.params.local_offsets)
    x = gpos_pivot + quat.rotate(grot, model.com_off)
    return x, grot, gpos_pivot


def root_pos_pivot_from_com(model: Model, root_com, root_rot):
    """Root state is stored as COM; FK wants the pelvis pivot."""
    return root_com - quat.rotate(root_rot, model.com_off[:, 0])


def _body_velocities(model: Model, x, grot, gpos_pivot, u):
    """u → per-body COM velocity and angular velocity.

    The cross products are distributed — Σ_j S qd_j×(x_b − piv_j) =
    (Σ_j S qd_j)×x_b − Σ_j S (qd_j×piv_j) — so no (N, J, B, 3) intermediate
    is ever materialized (TPU layout, see module scaffolding note)."""
    v_root = u[:, 0:3]
    w_root = u[:, 3:6]
    qd = u[:, 6:].reshape(-1, NJ, 3)
    sub = jnp.asarray(_SUB)
    # ω_b = ω_root + Σ_j SUB[j,b]·qd_j
    w_sum = jnp.einsum("jb,nji->nbi", sub, qd)
    w_b = w_root[:, None] + w_sum
    x0 = x[:, 0:1]
    piv = gpos_pivot[:, 1:]                               # (N,23,3)
    v_b = v_root[:, None] + jnp.cross(w_root[:, None], x - x0)
    qdxp = jnp.cross(qd, piv)                             # (N,23,3)
    v_b = v_b + jnp.cross(w_sum, x) - jnp.einsum("jb,nji->nbi", sub, qdxp)
    return v_b, w_b


def refresh_cache(model: Model, state: PhysicsState, tree) -> PhysicsState:
    x, grot, gpos_pivot = _fk(model, state.root_pos, state.root_rot,
                              state.joint_rot, tree)
    v_b, w_b = _body_velocities(model, x, grot, gpos_pivot, state.u)
    return state.replace(body_x=x, body_q=grot, body_v=v_b, body_w=w_b)


def kinematic_state(
    model: Model,
    tree,
    root_pos: jnp.ndarray,          # (N,3) pelvis PIVOT position (ref frame)
    root_rot: jnp.ndarray,          # (N,4)
    local_rot: jnp.ndarray,         # (N,24,4) incl. root at index 0
    root_vel: jnp.ndarray = None,
    root_ang_vel: jnp.ndarray = None,
    dof_vel: jnp.ndarray = None,    # (N,23,3) joint ang vel in parent frame
) -> PhysicsState:
    """Pose the articulation kinematically (TPU-native equivalent of
    set_actor_root_state + set_dof_state, reference humanoid.py:467-481)."""
    N = root_pos.shape[0]
    root_rot = quat.normalize(root_rot)
    joint_rot = quat.normalize(local_rot[:, 1:])
    root_com = root_pos + quat.rotate(root_rot, model.com_off[:, 0])
    if root_vel is None:
        root_vel = jnp.zeros((N, 3))
    if root_ang_vel is None:
        root_ang_vel = jnp.zeros((N, 3))
    if dof_vel is None:
        dof_vel = jnp.zeros((N, NJ, 3))

    # one FK; poses don't change when u is filled in below
    x, grot, gpos_pivot = _fk(model, root_com, root_rot, joint_rot, tree)
    # world-frame joint velocities: qd_j = R_parent · dof_vel_j
    parent = np.maximum(PARENTS, 0)
    qd = quat.rotate(grot[:, parent][:, 1:], dof_vel)
    # root velocity given at the pivot; convert to COM
    r = quat.rotate(root_rot, model.com_off[:, 0])
    v_com = root_vel + jnp.cross(root_ang_vel, r)
    u = jnp.concatenate([v_com, root_ang_vel, qd.reshape(N, -1)], axis=-1)
    v_b, w_b = _body_velocities(model, x, grot, gpos_pivot, u)
    return PhysicsState(
        root_pos=root_com,
        root_rot=root_rot,
        joint_rot=joint_rot,
        u=u,
        body_x=x,
        body_q=grot,
        body_v=v_b,
        body_w=w_b,
        contact_force=jnp.zeros((N, B, 3)),
    )


def body_frame_state(model: Model, state: PhysicsState):
    """COM cache → joint-pivot (rigid-body) states: (pos, rot, vel, ang)."""
    r = quat.rotate(state.body_q, model.com_off)
    pos = state.body_x - r
    vel = state.body_v + jnp.cross(state.body_w, -r)
    return pos, state.body_q, vel, state.body_w


def joint_state(model: Model, state: PhysicsState):
    """dof_pos: exp-map of relative joint rotation (N,23,3);
    dof_vel: relative angular velocity in the parent frame (N,23,3)."""
    dof_pos = quat.to_exp_map(state.joint_rot)
    parent = np.maximum(PARENTS, 0)
    qp = state.body_q[:, parent][:, 1:]
    qd = state.u[:, 6:].reshape(-1, NJ, 3)
    dof_vel = quat.rotate_inv(qp, qd)
    return dof_pos, dof_vel


# ---------------------------------------------------------------------------
# Mass matrix from subtree moment aggregates
# ---------------------------------------------------------------------------

def _build_jacobians(model: Model, x, q, pivots_x):
    """Body Jacobians + symmetric inertia rows, kept 4-D for TPU layout.

    Returns Jv4 (N, B, 3, 75) and W4 (N, B, 3, 75) with W = √D·RᵀJw (zero
    linear columns), so the angular mass block is exactly W4ᵀW4 and the
    per-body world inertia I = R D Rᵀ is never materialized. Downstream
    contractions run over the (B, 3) axis pair directly — a (N, B·3, ·)
    reshape would cost a tiled-layout copy on TPU.

    Column layout: [root-lin (3) | 72 angular columns (root-ang a=0, joints
    a=1..23)]. For body k and extended joint a (ancestor):
        Jv[k, :, ang-col a] = −[x_k − p_a]× = −[x_k]× + [p_a]×
    distributed into two contractions against ε-folded static tensors so no
    (N, A, B, 3, 3) block tensor is materialized.
    """
    p = model.params
    N = x.shape[0]
    subx = jnp.asarray(_SUBX)                            # (24ext,B)
    eps_jw = jnp.asarray(_EPS_JW)                        # (B,3,3,72)
    eps_col = jnp.asarray(_EPS_COL)                      # (24ext,3,3,72)

    # term1 = −[x_k]×·JW, term2 = +[p_a]×·COL masked by ancestry — both as
    # single contractions against ε-folded static tensors (no skew tensors)
    term1 = jnp.einsum("nkj,kjic->nkic", x, eps_jw)      # (N,B,3,72)
    t2 = jnp.einsum("naj,ajic->naic", pivots_x, -eps_col)
    term2 = jnp.einsum("naic,ak->nkic", t2, subx)        # (N,B,3,72)
    eye = jnp.broadcast_to(jnp.eye(3), (N, B, 3, 3))
    Jv4 = jnp.concatenate([eye, term1 + term2], axis=-1)  # (N,B,3,75)

    R = quat.to_matrix(q)                                # (N,B,3,3)
    jw = jnp.asarray(_JW_EXT)                            # (B,3,72)
    RtJw = jnp.einsum("nkji,kjc->nkic", R, jw)           # Rᵀ·Jw
    W = jnp.sqrt(p.inertia)[..., None] * RtJw            # (N,B,3,72)
    W4 = jnp.concatenate([jnp.zeros((N, B, 3, 3), W.dtype), W], axis=-1)
    return Jv4, W4, term2


def _mass_matrix_from_jac(model: Model, Jv4, W4):
    """M = Jv4ᵀ diag(m) Jv4 + W4ᵀW4 (diagnostics/tests path; the hot substep
    assembles M fused into the full LHS via _assemble_lhs_rhs)."""
    p = model.params
    Mv = jnp.einsum("nkic,nkid->ncd", p.mass[..., None, None] * Jv4, Jv4)
    return Mv + jnp.einsum("nkic,nkid->ncd", W4, W4)


# ---------------------------------------------------------------------------
# Row-merged production path (see the scaffolding note above _E1_M)
# ---------------------------------------------------------------------------

def _build_rows_merged(model: Model, x, q, pivots_x, out_dtype=jnp.float32):
    """Merged body-Jacobian rows: G (N,72,72) angular Jv rows, W (N,72,72)
    inertia rows √D·RᵀJw, t2m (N,72,72) the shared pivot contraction (reused
    by every contact/self row build). Row m = 3k+i is body k, component i;
    the identity linear block is implicit (handled in assembly).

    G is emitted by ONE dot against the stacked [x | pivots] static (no f32
    t1m intermediate), and all three outputs are cast to `out_dtype` in the
    dot epilogues — with cfg.rows_bf16 that halves the chain's dominant HBM
    writes (the accumulation stays f32)."""
    p = model.params
    xp = jnp.concatenate([x, pivots_x], axis=1)          # (N, 48, 3)
    G = jnp.einsum("nkj,kjmc->nmc", xp, jnp.asarray(_G_M),
                   preferred_element_type=jnp.float32).astype(out_dtype)
    t2m = jnp.einsum("naj,ajmc->nmc", pivots_x, jnp.asarray(_F_M),
                     preferred_element_type=jnp.float32).astype(out_dtype)
    R = quat.to_matrix(q)
    sD = jnp.einsum("nki,kim->nm", jnp.sqrt(p.inertia), jnp.asarray(_FL_M))
    W = (sD[..., None]
         * jnp.einsum("nkji,kjimc->nmc", R, jnp.asarray(_TW_M),
                      preferred_element_type=jnp.float32)).astype(out_dtype)
    return G, W, t2m


def _point_rows_merged(points, table: str, t2m):
    """Merged angular point-Jacobian rows Gc (N,3C,72) of world points on
    the `table` contact bodies (linear block: identity per row triple,
    implicit). For table="self", `points` is (N,K,2,3) [cA, cB] stacked and
    the rows are the RELATIVE pair Jacobian (linear block exactly zero)."""
    E1C, OH, _, _, _ = _merged_point_statics(table)
    rdt = t2m.dtype
    if table == "self":
        t1 = jnp.einsum("ncsj,csjrd->nrd", points, jnp.asarray(E1C))
    else:
        t1 = jnp.einsum("ncj,cjrd->nrd", points, jnp.asarray(E1C))
    # OH is a (signed) one-hot row selector — the t2m "contraction" is exact
    # in any dtype; accumulate f32 and cast so bf16 rows stay bf16-sized
    return (t1.astype(rdt)
            + jnp.einsum("nmd,rm->nrd", t2m, jnp.asarray(OH, rdt),
                         preferred_element_type=jnp.float32).astype(rdt))


def _normal_rows_merged(nrm, Gc, table: str):
    """Jn_ang (N,C,72): per-contact normal-projected angular rows,
    Σ_i n_i·Gc[3c+i] (the merged analog of nᵀ·Jc's angular part)."""
    _, _, P, FLC, _ = _merged_point_statics(table)
    rdt = Gc.dtype
    nrm_m = jnp.einsum("nci,cir->nr", nrm, jnp.asarray(FLC)).astype(rdt)
    return jnp.einsum("cr,nrd->ncd", jnp.asarray(P, rdt),
                      nrm_m[..., None] * Gc,
                      preferred_element_type=jnp.float32).astype(rdt)


def _q_contact_merged(kpen_g, nrm_g, kpen_all, Jn_a_all):
    """Generalized contact-spring force (N,75) from split normal rows: the
    linear block is Σ_c f_c·n_c over GROUND rows only (self-pair rows have
    zero linear columns); the angular block contracts every row."""
    return jnp.concatenate(
        [jnp.einsum("nc,nci->ni", kpen_g, nrm_g),
         jnp.einsum("nc,ncd->nd", kpen_all, Jn_a_all)], axis=-1)


def _assemble_lhs_rhs(model: Model, G, W, q, v_b, w_b, f_lin, dt, Q_rest,
                      diag, ground, selfrows, table: str,
                      batch_major: bool = False, gram: bool = False,
                      sqrt_gram: bool = False):
    """Fused LHS/RHS assembly in the row-merged layout (PRODUCTION path).

    A = Jvᵀm Jv + WᵀW + wt·JcᵀJc + (wn−wt)·JnᵀJn + diag, composed from
    72×72 / 3×72 / 3×3 blocks — the merged (·,72) operands tile-pad 1.78×
    vs ~4.5× for 4-D, measured 1.67× on this chain (layout_bench.py).
    rhs = M·u + dt·Q without materializing M. Emitted ENV-LAST (c,d,n):
    the Pallas solver wants envs on lanes, and producing that layout here
    avoids a pathological (N,75,75)↔(75,75,N) relayout (~1.6 ms/substep at
    4096). Replaces the reference's PhysX-side TGS assembly (closed .so).

    ground   = (Gc (N,3C,72), Jn_a (N,C,72), nrm (N,C,3), wn, wt (N,C))
    selfrows = None | (Gcs (N,3K,72), Jn_sa (N,K,72), wn_s, wt_s (N,K))
               — angular blocks only (pair rows' linear columns are zero).
    """
    return (_assemble_lhs_merged(model, G, W, diag, ground, selfrows, table,
                                 batch_major=batch_major, gram=gram,
                                 sqrt_gram=sqrt_gram),
            _assemble_rhs_merged(model, G, W, q, v_b, w_b, f_lin, dt,
                                 Q_rest, batch_major=batch_major))


def _assemble_lhs_merged(model: Model, G, W, diag, ground, selfrows,
                         table: str, batch_major: bool = False,
                         gram: bool = False, sqrt_gram: bool = False):
    """ONE weighted Gram matmul for the whole 75×75 LHS.

    Every LHS term is Σ_rows w·r rᵀ for a row family r = [lin(3) | ang(72)]:
      body rows    r = [e_i | G_m],    w = m_k        (Jvᵀ m Jv, all blocks)
      inertia rows r = [0   | W_m],    w = 1          (WᵀW)
      point rows   r = [e_i | Gc_r],   w = wt_c       (wt·JcᵀJc)
      normal rows  r = [n_c | Jn_c],   w = wn_c−wt_c  ((wn−wt)·JnᵀJn)
      self rows    r = [0   | ·],      pair-difference linear columns cancel
    so stacking them into R (N, M, 75) and contracting (w∘R)ᵀR emits the
    full matrix — lin-lin corner, lin-ang strips, ang-ang block — in a
    single batched dot (75 lanes pad to the same 128 as 72: the strips are
    FREE). Replaces 9 small batched matmuls + block concats whose operand
    re-reads made the LHS the chain's HBM bill (scripts/merge_attribution.py:
    chain = 74% of the step; bf16 rows halve the remaining traffic)."""
    if sqrt_gram and not gram:
        # single-operand symmetric contraction: S = √w∘R used on BOTH dot
        # sides — XLA CSEs the operand, halving the (N, M, 75) row
        # materialization and deduplicating the two ~0.5 ms pre-dot layout
        # copies the (w∘R, R) form pays (trace: copy.578/579). Valid only
        # when every weight is ≥ 0 (callers check the static inequality);
        # same bf16 rounding budget (two roundings per product either way)
        # and the Gram term becomes exactly PSD. The weights land PER
        # FAMILY before the row concat (_merged_rows weight_fn): with the
        # self-contact families XLA stops fusing a 6-input concat with a
        # post-concat multiply and materializes three full (N, M, 75)
        # passes (concat 0.77 + multiply 0.64 + relayout 0.77 ms at 4,096
        # envs); per-family multiplies fuse into the family builders.
        S, _ = _merged_rows(model, G, W, ground, selfrows, table,
                            weight_fn=lambda w: jnp.sqrt(w))
        if batch_major:
            At = jnp.einsum("nmc,nmd->ncd", S, S,
                            preferred_element_type=jnp.float32)
            return At + jnp.eye(NU, dtype=At.dtype)[None] * diag[:, :, None]
        At = jnp.einsum("nmc,nmd->cdn", S, S,
                        preferred_element_type=jnp.float32)
        return (At + jnp.eye(NU, dtype=At.dtype)[:, :, None]
                * diag.T[:, None, :])
    R, wv = _merged_rows(model, G, W, ground, selfrows, table)
    if gram:
        # fused Pallas weighted Gram + diag: one MXU dot per env streamed
        # through VMEM (pallas_linalg.gram_diag, batch-major output); the
        # env-last solver layout comes from the chunked Pallas relayout
        # instead of XLA's HBM-hostile minor-dim transpose. The gram
        # output carries the relayout's 8-row staging pad directly
        # (out_rows) so no XLA pad copy sits between the two kernels.
        from .pallas_linalg import gram_diag, to_env_last
        d32 = diag.astype(jnp.float32)
        if batch_major:
            return gram_diag(R, wv, d32)
        staged = NU + (-NU) % 16
        return to_env_last(gram_diag(R, wv, d32, out_rows=staged),
                           out_rows=NU)
    if batch_major:
        # XLA's native batched-dot layout (n, c, d) — no post-dot relayout;
        # the batch-major solver path relayouts in its Pallas composition
        At = jnp.einsum("nmc,nmd->ncd", wv[..., None] * R, R,
                        preferred_element_type=jnp.float32)
        return At + jnp.eye(NU, dtype=At.dtype)[None] * diag[:, :, None]
    At = jnp.einsum("nmc,nmd->cdn", wv[..., None] * R, R,
                    preferred_element_type=jnp.float32)
    return At + jnp.eye(NU, dtype=At.dtype)[:, :, None] * diag.T[:, None, :]


def _sqrt_gram_ok(cfg) -> bool:
    """Static guard for the single-operand √w Gram: every merged-row weight
    is ≥ 0 iff the normal weight dominates the capped friction weight,
    dt·k_n + d_n ≥ max_friction_damping (wn − wt = gate·dt·(dt·k_n + d_n −
    d_t) with d_t ≤ max_friction_damping; mass/inertia/wt weights are
    nonnegative by construction). STRICT inequality: at exact equality the
    capped-friction normal rows carry weight exactly 0 and the
    XLA-CPU-jitted step was observed to go NaN (dt=1/120 test configs;
    the de-optimized trace is clean — a fusion artifact this guard keeps
    out of reach on every backend). All fields are static config floats,
    so the check never traces."""
    return (cfg.sqrt_gram
            and cfg.substep_dt * cfg.contact_stiffness + cfg.contact_damping
            > cfg.max_friction_damping)


def _merged_rows(model: Model, G, W, ground, selfrows, table: str,
                 weight_fn=None):
    """Stack every LHS row family into R (N, M, 75) + weights wv (N, M)
    (the [lin(3) | ang(72)] row table in _assemble_lhs_merged's docstring).

    With `weight_fn` (e.g. jnp.sqrt for the single-operand √w Gram), each
    family is scaled by weight_fn(w) BEFORE the concat and wv is returned
    as ones: the per-family multiplies fuse into the family builders'
    epilogues, where a post-concat multiply over the full (N, M, 75) stack
    stops fusing once the self-contact families push the concat to six
    inputs (three extra full-stack HBM passes, trace-measured)."""
    p = model.params
    Gc, Jn_a, nrm, wn, wt = ground
    _, _, _, _, ISELC = _merged_point_statics(table)
    rdt = G.dtype
    N = G.shape[0]
    isel = jnp.broadcast_to(jnp.asarray(_ISEL_M, rdt), (N, MROWS, 3))
    iselc = jnp.broadcast_to(jnp.asarray(ISELC, rdt), (N,) + ISELC.shape)
    mass_m = jnp.repeat(p.mass, 3, axis=-1)              # (N,72)
    rows = [jnp.concatenate([isel, G], -1),
            jnp.concatenate([jnp.zeros((N, MROWS, 3), rdt), W], -1),
            jnp.concatenate([iselc, Gc], -1),
            jnp.concatenate([nrm.astype(rdt), Jn_a], -1)]
    wgt = [mass_m, None,                                 # inertia w == 1
           jnp.repeat(wt, 3, axis=-1), wn - wt]
    if selfrows is not None:
        Gcs, Jn_sa, wn_s, wt_s = selfrows
        rows += [jnp.concatenate(
                     [jnp.zeros(Gcs.shape[:2] + (3,), rdt), Gcs], -1),
                 jnp.concatenate(
                     [jnp.zeros(Jn_sa.shape[:2] + (3,), rdt), Jn_sa], -1)]
        wgt += [jnp.repeat(wt_s, 3, axis=-1), wn_s - wt_s]
    if weight_fn is not None:
        rows = [r if w is None
                else r * weight_fn(w.astype(rdt))[..., None]
                for r, w in zip(rows, wgt)]
        R = jnp.concatenate(rows, axis=1)                # (N, M, 75)
        return R, jnp.ones(R.shape[:2], rdt)
    R = jnp.concatenate(rows, axis=1)                    # (N, M, 75)
    wv = jnp.concatenate(
        [jnp.ones_like(mass_m) if w is None else w for w in wgt],
        axis=1).astype(rdt)                              # (N, M)
    return R, wv


def _assemble_rhs_merged(model: Model, G, W, q, v_b, w_b, f_lin, dt, Q_rest,
                         batch_major: bool = False):
    """rhs = M·u + dt·Q via matvecs (no dense M), env-last (c, n) — or
    batch-major (n, c) for the batch-major solver path.

    The forward matvecs never touch the Jacobians: Jv·u IS the body-
    velocity cache v_b, and W·u = √D·Rᵀ·w_b — both elementwise. The Gᵀ
    contraction against (m·v_b + dt·f_lin) fuses the mass-matrix matvec
    with the gravity/bias generalized force, so each substep reads G and W
    exactly ONCE here; the identity linear block reduces to a body sum."""
    p = model.params
    fl = jnp.asarray(_FL_M)
    rdt = G.dtype
    fvec = p.mass[..., None] * v_b + dt * f_lin          # (N,B,3)
    fm = jnp.einsum("nki,kim->nm", fvec, fl).astype(rdt)
    v2 = jnp.sqrt(p.inertia) * quat.rotate_inv(q, w_b)
    v2m = jnp.einsum("nki,kim->nm", v2, fl).astype(rdt)
    if batch_major:
        Mu = jnp.concatenate(
            [fvec.sum(axis=1),
             jnp.einsum("nmc,nm->nc", G, fm,
                        preferred_element_type=jnp.float32)
             + jnp.einsum("nmc,nm->nc", W, v2m,
                          preferred_element_type=jnp.float32)],
            axis=-1)                                     # (N,75)
        return Mu + dt * Q_rest
    Mu = jnp.concatenate(
        [fvec.sum(axis=1).T,
         jnp.einsum("nmc,nm->cn", G, fm,
                    preferred_element_type=jnp.float32)
         + jnp.einsum("nmc,nm->cn", W, v2m,
                      preferred_element_type=jnp.float32)],
        axis=0)                                          # (75,N)
    return Mu + dt * Q_rest.T


def _assemble_lhs(model: Model, Jv4, W4, diag, wn, wt, Jn, Jc):
    """4-D-layout LHS (oracle/tests path; production is _assemble_lhs_merged
    — the equivalence is pinned by test_merged_assembly_matches_4d)."""
    p = model.params
    At = jnp.einsum("nkic,nkid->cdn", p.mass[..., None, None] * Jv4, Jv4)
    At = At + jnp.einsum("nkic,nkid->cdn", W4, W4)
    At = At + jnp.einsum("nkic,nkid->cdn", wt[..., None, None] * Jc, Jc)
    At = At + jnp.einsum("nci,ncj->ijn", (wn - wt)[..., None] * Jn, Jn)
    return At + jnp.eye(NU, dtype=At.dtype)[:, :, None] * diag.T[:, None, :]


def _assemble_rhs(model: Model, Jv4, W4, q, v_b, w_b, f_lin, dt, Q_rest):
    """4-D-layout rhs (oracle/tests path; production is
    _assemble_rhs_merged): rhs = M·u + dt·Q via matvecs, env-last (c, n).

    The forward matvecs never touch the Jacobians: Jv4·u IS the body-
    velocity cache v_b, and W4·u = √D·Rᵀ·w_b (W = √D·RᵀJw, Jw·u = w_b) —
    both elementwise. The Jv4ᵀ contraction against (m·v_b + dt·f_lin) fuses
    the mass-matrix matvec with the gravity/bias generalized force, so each
    substep reads Jv4 and W4 exactly ONCE here (was 3×/2× via J·u round
    trips — the (·,3,75) minor dims tile-pad ~4.5× on TPU, making those
    reads the substep's bandwidth bill)."""
    p = model.params
    Mu = jnp.einsum("nkic,nki->cn", Jv4,
                    p.mass[..., None] * v_b + dt * f_lin)
    v2 = jnp.sqrt(p.inertia) * quat.rotate_inv(q, w_b)
    Mu = Mu + jnp.einsum("nkic,nki->cn", W4, v2)
    return Mu + dt * Q_rest.T


# ---------------------------------------------------------------------------
# Generalized forces
# ---------------------------------------------------------------------------

def _point_jacobians(points, bodies, term2):
    """Velocity Jacobians (N, C, 3, 75) of world points attached to `bodies`
    (static index array), from the shared pivot contraction: term2 is
    _build_jacobians' (N, B, 3, 72) — reusing it keeps body and contact
    Jacobians structurally identical (and saves the two largest contractions
    a second evaluation per substep)."""
    N, C = points.shape[0], points.shape[1]
    eps_jwc = jnp.asarray(_EPS_JW[bodies])               # (C,3,3,72) static
    term1 = jnp.einsum("ncj,cjid->ncid", points, eps_jwc)
    term2c = term2[:, bodies]                            # (N,C,3,72)
    eye = jnp.broadcast_to(jnp.eye(3), (N, C, 3, 3))
    return jnp.concatenate([eye, term1 + term2c], axis=-1)  # (N,C,3,75)


def _capsule_segments(model: Model, x, q, bodies):
    """World-space segment endpoints of the capsules of `bodies`."""
    p = model.params
    a = p.capsule_axis[:, bodies] * p.capsule_half[:, bodies, None]
    off = quat.rotate(q[:, bodies], a)
    xb = x[:, bodies]
    return xb - off, xb + off


def _point_velocities(x, v_b, w_b, pts, bodies):
    """World velocity of points attached to `bodies` (static index array)
    from the body-velocity cache: v_pt = v_b + w_b × (pt − x_b).

    Exactly J_point(x)·u at the cache's pose (the cache is refreshed from u
    each substep) — (N,C,3) elementwise instead of reading the (N,C,3,75)
    contact Jacobian, whose (3,75) minor dims tile-pad ~4.5× on TPU. This
    substitution is what keeps the per-substep HBM traffic flat as contact
    rows grow (self-contact/mesh variants)."""
    return (v_b[:, bodies]
            + jnp.cross(w_b[:, bodies], pts - x[:, bodies]))


def _self_contact_geometry(model: Model, x, q):
    """Closest points between the _SELF_PAIR capsule segments (branchless
    Ericson segment-segment), outward normal n = (cA−cB)/‖·‖ and penetration
    rA + rB − dist. Returns (cA, cB, nrm (N,K,3), pen (N,K))."""
    pA0, pA1 = _capsule_segments(model, x, q, _SELF_A)
    pB0, pB1 = _capsule_segments(model, x, q, _SELF_B)
    d1 = pA1 - pA0
    d2 = pB1 - pB0
    r = pA0 - pB0
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d1 * r, -1)
    f = jnp.sum(d2 * r, -1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-9,
                  (b * f - c * e) / jnp.where(denom > 1e-9, denom, 1.0), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-9), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, 1e-9), 0.0, 1.0)
    cA = pA0 + d1 * s[..., None]
    cB = pB0 + d2 * t[..., None]
    delta = cA - cB
    dist = jnp.linalg.norm(delta, axis=-1)
    nrm = delta / jnp.maximum(dist, 1e-6)[..., None]
    p = model.params
    rsum = p.capsule_radius[:, _SELF_A] + p.capsule_radius[:, _SELF_B]
    return cA, cB, nrm, rsum - dist


def _self_contact_gates(model: Model, x, q, v_b, w_b, cfg,
                        speculative: bool):
    """Layout-independent self-contact geometry + implicit-row weights:
    returns (cA, cB, nrm, active, d_t, pen_f_masked, wn, wt) for the
    _SELF_PAIR table. Shared by the merged production rows and the 4-D
    oracle rows so both paths gate identically."""
    dt = cfg.substep_dt
    cA, cB, nrm, pen = _self_contact_geometry(model, x, q)
    active = (pen > 0.0).astype(x.dtype)
    vpt = (_point_velocities(x, v_b, w_b, cA, _SELF_A)
           - _point_velocities(x, v_b, w_b, cB, _SELF_B))
    vn = jnp.sum(vpt * nrm, axis=-1)
    vt = vpt - nrm * vn[..., None]
    vt_mag = jnp.linalg.norm(vt, axis=-1)
    k_n = cfg.contact_stiffness
    d_n = cfg.contact_damping
    pen_f = jnp.minimum(pen, cfg.max_depenetration)
    mu = jnp.where(vt_mag < cfg.friction_vel_ref,
                   cfg.static_friction, cfg.dynamic_friction)
    mu = mu * model.params.friction_scale[:, None]
    d_t = mu * (k_n * jnp.maximum(pen_f, 0.0)) / (vt_mag
                                                  + cfg.friction_vel_ref)
    d_t = jnp.minimum(d_t, cfg.max_friction_damping)
    if speculative:
        # approaching pairs get their implicit rows before touch (same
        # reasoning as ground speculative contacts; no gravity term — the
        # gap closes at the relative normal velocity)
        pen_pred = pen + (-cfg.control_dt * jnp.minimum(vn, 0.0))
        gate = (pen_pred > 0.0).astype(x.dtype)
        d_t_lhs = mu * (k_n * jnp.clip(pen_pred, 0.0,
                                       cfg.max_depenetration)) \
            / (vt_mag + cfg.friction_vel_ref)
        d_t_lhs = jnp.minimum(d_t_lhs, cfg.max_friction_damping)
        wt = gate * dt * d_t_lhs
    else:
        gate = active
        wt = gate * dt * d_t
    wn = gate * dt * (dt * k_n + d_n)
    return cA, cB, nrm, active, d_t, active * pen_f, wn, wt


def _self_contact_rows(model: Model, x, q, v_b, w_b, term2, cfg,
                       speculative: bool):
    """Self-contact solver rows in the exact shape of the ground rows: the
    relative-velocity Jacobian Jrel = J(cA on A) − J(cB on B) (root-linear
    columns cancel), so the same implicit spring-damper + Coulomb-capped
    viscous friction machinery applies unchanged. 4-D oracle layout; the
    production substep uses _self_contact_rows_merged. Returns
    ((Jc, Jn, nrm, active, d_t, pen_f_masked, wn, wt), (cA, cB))."""
    (cA, cB, nrm, active, d_t, pen_f_m, wn, wt) = _self_contact_gates(
        model, x, q, v_b, w_b, cfg, speculative)
    Jc = _self_pair_jacobians(cA, cB, term2)
    Jn = jnp.einsum("nci,ncij->ncj", nrm, Jc)
    return (Jc, Jn, nrm, active, d_t, pen_f_m, wn, wt), (cA, cB)


def _self_contact_rows_merged(model: Model, x, q, v_b, w_b, t2m, cfg,
                              speculative: bool):
    """Row-merged self-contact rows (production): Gcs (N,3K,72) relative
    pair Jacobian rows (linear columns exactly zero — the pair difference
    cancels the identity blocks), Jn_sa (N,K,72) normal-projected rows.
    Returns ((Gcs, Jn_sa, nrm, active, d_t, pen_f_masked, wn, wt),
    (cA, cB))."""
    (cA, cB, nrm, active, d_t, pen_f_m, wn, wt) = _self_contact_gates(
        model, x, q, v_b, w_b, cfg, speculative)
    pts2 = jnp.stack([cA, cB], axis=2)                   # (N,K,2,3)
    Gcs = _point_rows_merged(pts2, "self", t2m)
    Jn_sa = _normal_rows_merged(nrm, Gcs, "self")
    return (Gcs, Jn_sa, nrm, active, d_t, pen_f_m, wn, wt), (cA, cB)


def _gravity_bias_spring(model, x, q, v_b, w_b, u, target_q, gvec):
    """Generalized-force RHS, factored so the caller can fuse the expensive
    Jv4ᵀ contraction with the mass-matrix matvec (one Jv4 read per substep):
    returns (f_lin (N,B,3), Q_rest (N,75)) with
        Q = Jv4ᵀ f_lin + Q_rest
    where f_lin is the linear gravity−inertial body force and Q_rest carries
    the gyroscopic Jwᵀ term (static tensor, no big per-env operand) and the
    Stable-PD spring.

    Cross products are distributed (see _body_velocities) so the bias needs
    no (N, J, B, 3) intermediates; the gyroscopic torque uses quaternion
    rotations against the diagonal body-frame inertia (no I_world matrices).
    """
    p = model.params
    m = p.mass
    N = x.shape[0]
    parent = np.maximum(PARENTS, 0)
    qd = u[:, 6:].reshape(-1, NJ, 3)
    w_root = u[:, 3:6]

    # velocity-product accelerations: a_b = ω_root×(v_b − v_root)
    #   + (Σ_j S qd_j)×v_b − Σ_j S (qd_j×v_piv_j)
    piv_j = x[:, 1:] + quat.rotate(q[:, 1:], model.anchor_c[:, 1:])
    v_piv = (v_b[:, parent][:, 1:]
             + jnp.cross(w_b[:, parent][:, 1:],
                         piv_j - x[:, parent][:, 1:]))
    sub = jnp.asarray(_SUB)
    w_sum = jnp.einsum("jb,nji->nbi", sub, qd)
    a_vp = (jnp.cross(w_root[:, None], v_b - v_b[:, 0:1])
            + jnp.cross(w_sum, v_b)
            - jnp.einsum("jb,nji->nbi", sub, jnp.cross(qd, v_piv)))
    # gyro = ω × (R D Rᵀ ω), via two quat rotations on (N,B,3)
    Iw = quat.rotate(q, p.inertia * quat.rotate_inv(q, w_b))
    gyro = jnp.cross(w_b, Iw)

    # generalized forces: Q = Jvᵀ f_lin + Jwᵀ τ_ang; the Jv4ᵀ contraction is
    # deferred to _assemble_rhs (fused with M·u)
    f_lin = m[..., None] * (gvec[None, None] - a_vp)     # gravity − inertial
    jw = jnp.asarray(_JW_EXT)                            # (B,3,72)
    tau_ang = -gyro                                      # (N,B,3)
    Q = jnp.zeros((N, NU), x.dtype)
    Q = Q.at[:, 3:].add(jnp.einsum("kic,nki->nc", jw, tau_ang))

    # Stable-PD spring: θ in world frame; RHS gets −kp·θ (implicit terms → LHS)
    qp = q[:, parent][:, 1:]
    q_rel = quat.mul(quat.conjugate(qp), q[:, 1:])
    q_err = quat.mul(q_rel, quat.conjugate(target_q))
    theta = quat.rotate(qp, quat.to_exp_map(q_err))      # (N,23,3)
    spring = -p.kp[..., None] * theta                    # (N,23,3)
    # actuator saturation: clamp the drive torque per joint to the GAINS
    # torque limit (reference skeleton_mesh_local.py:14-38 column 4, applied
    # by PhysX as the drive's maxForce / MJCF motor gear). Without it a
    # fallen pose with θ≈π and kp≈500 commands kNm torques — the power
    # penalty Σ|τ·q̇| then reaches tens of kW and getup training diverges.
    # Norm clamp (slerp-drive semantics); the implicit kd/kp LHS terms stay,
    # so a saturated joint errs toward overdamping, never instability.
    nrm = jnp.linalg.norm(spring, axis=-1, keepdims=True)
    cap = p.torque_limit[..., None]
    spring = spring * (jnp.minimum(nrm, cap) / jnp.maximum(nrm, 1e-9))
    Q = Q.at[:, 6:].add(spring.reshape(N, -1))
    return f_lin, Q


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------

# contact sample table: capsule-end spheres of the bodies that can plausibly
# touch the ground (feet for locomotion; knees/pelvis/torso/head/arms for
# falls and getup). Inner-chain bodies (hips, spine, neck, thorax, shoulders,
# hands) are geometrically shadowed by these and excluded to cut the contact
# Jacobian pipeline ~40% (TPU memory traffic). Illegal-contact *detection*
# for terminations still covers every body (geometric penetration in the env).
_CONTACT_BODY_NAMES = (
    "Pelvis", "Torso", "Chest", "Head",
    "L_Knee", "R_Knee", "L_Ankle", "R_Ankle", "L_Toe", "R_Toe",
    "L_Elbow", "R_Elbow", "L_Wrist", "R_Wrist",
)
_CONTACT_BODY = np.repeat(
    np.array([bm.BODY_NAMES.index(n) for n in _CONTACT_BODY_NAMES]), 2)
_CONTACT_END = np.tile(np.array([0, 1]), len(_CONTACT_BODY_NAMES))
_CONTACT_ONEHOT = np.eye(B, dtype=np.float32)[_CONTACT_BODY]
NC = len(_CONTACT_BODY)

# --- intra-humanoid (self) contact: fixed-budget capsule-capsule pairs ---
# (reference capability: PhysX self-collision enabled through asset options
# and consumed in humanoid.py:643-835). Pairs picked where fall/getup
# interpenetration is visible — forearms/hands vs trunk/thighs and legs
# crossing. Adjacent bodies share a joint pivot (their capsules touch by
# construction) and are excluded; each pair's rest-pose clearance is pinned
# by tests/test_engine.py.
_SELF_PAIR_NAMES = (
    ("L_Elbow", "Pelvis"), ("L_Elbow", "Torso"), ("L_Elbow", "Chest"),
    ("R_Elbow", "Pelvis"), ("R_Elbow", "Torso"), ("R_Elbow", "Chest"),
    ("L_Wrist", "Pelvis"), ("L_Wrist", "Torso"), ("L_Wrist", "Chest"),
    ("R_Wrist", "Pelvis"), ("R_Wrist", "Torso"), ("R_Wrist", "Chest"),
    ("L_Hand", "Pelvis"), ("L_Hand", "Torso"), ("L_Hand", "Chest"),
    ("R_Hand", "Pelvis"), ("R_Hand", "Torso"), ("R_Hand", "Chest"),
    ("L_Wrist", "L_Hip"), ("R_Wrist", "R_Hip"),
    ("L_Knee", "R_Knee"), ("L_Ankle", "R_Ankle"),
    ("L_Knee", "R_Hip"), ("R_Knee", "L_Hip"),
)
_SELF_A = np.array([bm.BODY_NAMES.index(a) for a, _ in _SELF_PAIR_NAMES])
_SELF_B = np.array([bm.BODY_NAMES.index(b) for _, b in _SELF_PAIR_NAMES])
NSELF = len(_SELF_PAIR_NAMES)
# signed map: +F on body A, −F reaction on body B
_SELF_ONEHOT = (np.eye(B, dtype=np.float32)[_SELF_A]
                - np.eye(B, dtype=np.float32)[_SELF_B])
_COMBINED_ONEHOT = np.concatenate([_CONTACT_ONEHOT, _SELF_ONEHOT], axis=0)
# signed ε-folded tensors for the one-dot pair-difference Jacobian
# (_self_pair_jacobians): stack (+ε[A], −ε[B]) so the A/B term1 contractions
# collapse into a single dot_general with ONE (N,K,3,72) output
_SELF_EPS = np.stack([_EPS_JW[_SELF_A], -_EPS_JW[_SELF_B]],
                     axis=1).astype(np.float32)          # (K,2,3,3,72)


def _self_pair_jacobians(cA, cB, term2):
    """Relative-velocity Jacobian of the self-contact pairs, built as ONE
    contraction: Jrel_ang = [cA]-term1·ε[A] − [cB]-term1·ε[B] + term2[A] −
    term2[B]; root-linear columns are exactly zero (eye − eye). vs two
    `_point_jacobians` + subtract this materializes one (N,K,3,72) dot
    output instead of two (the (3,72) minor tile-pads ~4.5× on TPU, so each
    avoided materialization is real HBM traffic)."""
    pts2 = jnp.stack([cA, cB], axis=2)                   # (N,K,2,3)
    ang = jnp.einsum("ncsj,csjid->ncid", pts2, jnp.asarray(_SELF_EPS))
    ang = ang + term2[:, _SELF_A] - term2[:, _SELF_B]
    z = jnp.zeros(ang.shape[:3] + (3,), ang.dtype)
    return jnp.concatenate([z, ang], axis=-1)            # (N,K,3,75)

# --- mesh-geom ground-contact variant (reference get_joint_geometries,
# smpl_local_robot.py:83-146: per-beta mesh colliders): same contact bodies,
# MESH_K inscribed spheres each from BodyParams.mesh_points (capsule-axis
# spheres by default; SMPL-vert-fit spheres via from_smpl_npz) ---
_MESH_BODY_U = np.array([bm.BODY_NAMES.index(n) for n in _CONTACT_BODY_NAMES])
_MESH_BODY = np.repeat(_MESH_BODY_U, bm.MESH_K)
_MESH_ONEHOT = np.eye(B, dtype=np.float32)[_MESH_BODY]
NC_MESH = len(_MESH_BODY)


def _readback_onehot(cfg):
    ground = _MESH_ONEHOT if cfg.mesh_contacts else _CONTACT_ONEHOT
    if cfg.self_contact:
        return jnp.asarray(np.concatenate([ground, _SELF_ONEHOT], axis=0))
    return jnp.asarray(ground)


def _ground_geometry(model: Model, x, q, cfg):
    """Ground-contact sample set: (points (N,C,3), per-row radius (N,C),
    static row→body index). Capsule end-spheres by default; the mesh variant
    swaps in the per-beta collision spheres with identical row semantics."""
    if cfg.mesh_contacts:
        mp = model.params.mesh_points[:, _MESH_BODY_U]       # (N,14,K,3)
        mr = model.params.mesh_point_radius[:, _MESH_BODY_U]
        N = x.shape[0]
        pts = (x[:, _MESH_BODY_U, None]
               + quat.rotate(q[:, _MESH_BODY_U, None], mp))
        return (pts.reshape(N, NC_MESH, 3), mr.reshape(N, NC_MESH),
                _MESH_BODY)
    pts = _contact_points(model, x, q)
    radius = model.params.capsule_radius[:, _CONTACT_BODY]
    return pts, radius, _CONTACT_BODY


def _terrain_contact_lookup(terrain, x, pts, cfg: EngineConfig):
    """Contact-path height+normal: per-env corner-patch window when
    cfg.terrain_patch is set (one gather row per env), else the direct
    global corner-texture gather (one row per contact point)."""
    if cfg.terrain_patch and terrain.corner_tex is not None:
        patch, xb, yb = corner_patch(terrain, x[:, 0, :2],
                                     cfg.terrain_patch)
        return height_and_normal_at_patch(terrain, patch, xb, yb,
                                          pts[..., :2])
    return height_and_normal_at(terrain, pts[..., :2])


def _contact_points(model: Model, x, q):
    """Capsule end-sphere centers: body_x is the capsule center (COM), so the
    two sphere centers sit at ∓axis·half in the COM frame."""
    a = model.params.capsule_axis * model.params.capsule_half[..., None]
    offs = jnp.stack([-a, a], axis=2)                    # (N,B,2,3) COM frame
    pts = x[:, :, None] + quat.rotate(q[:, :, None], offs)
    return pts[:, _CONTACT_BODY, _CONTACT_END]           # (N,48,3)


_DEFAULT_TREE = None


def default_tree():
    global _DEFAULT_TREE
    if _DEFAULT_TREE is None:
        _DEFAULT_TREE = bm.canonical_skeleton()
    return _DEFAULT_TREE


def step(
    model: Model,
    terrain: Heightfield,
    state: PhysicsState,
    pd_target: jnp.ndarray,        # (N,23,3) exp-map joint targets
    cfg: EngineConfig = EngineConfig(),
    tree=None,
) -> PhysicsState:
    """Advance one control step (cfg.n_substeps implicit substeps)."""
    if tree is None:
        tree = default_tree()   # resolved outside jit → stable static arg
    return _step(model, terrain, state, pd_target, cfg, tree)


@functools.partial(jax.jit, static_argnames=("cfg", "tree"))
def _step(model, terrain, state, pd_target, cfg, tree):
    target_q = quat.exp_map_to_quat(pd_target)

    if cfg.tgs_step and cfg.n_substeps > 1:
        return _tgs_step(model, terrain, state, target_q, cfg, tree)

    def substep(st, _):
        return _implicit_substep(model, terrain, st, target_q, cfg, tree), None

    state, _ = jax.lax.scan(substep, state, None, length=cfg.n_substeps)
    return state


def _tgs_step(model: Model, terrain, state: PhysicsState, target_q,
              cfg: EngineConfig, tree) -> PhysicsState:
    """One control step reusing the substep-1 Jacobians and factorization.

    Substep 1 builds everything fresh; the remaining substeps keep the
    FORCE-BALANCE inputs fresh — contact penetrations, spring/gravity/bias
    magnitudes, Stable-PD error — while reusing the substep-1 projection
    tensors (body/contact Jacobians, contact normals, friction
    coefficients) and the Cholesky factor. The projections drift O(‖u‖·dt)
    within a step, exactly the staleness PhysX TGS accepts by building
    contact Jacobians once per step and iterating (reference budget
    pacer.yaml:94-99). Two hard-won requirements (see the regression test):
    fresh penetrations each substep (frozen ones inject energy at foot
    plant), and SPECULATIVE LHS rows — a contact landing mid-step whose
    friction/stiffness rows are absent from the reused factor is solved
    explicitly for one substep and kicks the body, so rows activate from
    predicted end-of-step penetration while RHS forces stay gated by true
    penetration (no adhesion)."""
    from .pallas_linalg import (backend_supports_pallas,
                                cholesky_factor_blocked,
                                cholesky_factor_blocked_t,
                                cholesky_resolve_blocked,
                                cholesky_resolve_blocked_t)
    dt = cfg.substep_dt
    use_pallas = backend_supports_pallas()
    # batch-major only pairs with the blocked kernels (or the jnp fallback,
    # which natively wants batch-major anyway)
    bm = cfg.batch_major_solver and (cfg.blocked_solver or not use_pallas)
    gk = cfg.gram_kernel and use_pallas
    sg = _sqrt_gram_ok(cfg)
    gvec = jnp.array([0.0, 0.0, cfg.gravity])
    k_n = cfg.contact_stiffness
    d_n = cfg.contact_damping

    # ---- substep 1: full geometry build, assembly, factor, solve ----
    st = state
    (G, W, ground, selfrows, Jn_a_all, nrm, active, d_t, pen_f, diag,
     h0, radius, pts0, ground_body, self_pts0, table) = \
        _contact_and_jacobians(model, terrain, st, cfg)
    ng = radius.shape[1]          # ground rows (capsule or mesh table)
    f_lin, Q_rest = _gravity_bias_spring(model, st.body_x, st.body_q,
                                         st.body_v, st.body_w, st.u,
                                         target_q, gvec)
    Q_rest = Q_rest + _q_contact_merged(k_n * pen_f[:, :ng], nrm[:, :ng],
                                        k_n * pen_f, Jn_a_all)
    rhs_t = _assemble_rhs_merged(model, G, W, st.body_q, st.body_v,
                                 st.body_w, f_lin, dt, Q_rest,
                                 batch_major=bm)
    At = _assemble_lhs_merged(model, G, W, diag, ground, selfrows, table,
                              batch_major=bm, gram=gk, sqrt_gram=sg)
    At = At + 1e-8 * (jnp.eye(NU)[None] if bm else jnp.eye(NU)[:, :, None])
    if use_pallas and bm:
        L = cholesky_factor_blocked(At, _ARROW_CHUNKS, _ARROW_LIMBS,
                                    _ARROW_S)

        def resolve(rhs):
            return cholesky_resolve_blocked(
                L, rhs, _ARROW_CHUNKS, _ARROW_LIMBS, _ARROW_S)
    elif use_pallas:
        L = cholesky_factor_blocked_t(At, _ARROW_CHUNKS, _ARROW_LIMBS,
                                      _ARROW_S)

        def resolve(rhs):
            return cholesky_resolve_blocked_t(
                L, rhs, _ARROW_CHUNKS, _ARROW_LIMBS, _ARROW_S).T
    else:
        L = jnp.linalg.cholesky(At if bm else jnp.moveaxis(At, -1, 0))

        def resolve(rhs):
            return jax.scipy.linalg.cho_solve((L, True),
                                              rhs if bm else rhs.T)

    onehot = _readback_onehot(cfg)
    u_new = _velocity_clamp(resolve(rhs_t), cfg)
    st = _integrate_pose(model, st, u_new, dt, tree)
    contact_force = _readback_contact(st, pts0, ground_body, self_pts0, nrm,
                                      active, d_t, k_n, pen_f, dt, d_n,
                                      onehot)
    st = st.replace(contact_force=contact_force)

    # ---- remaining substeps: fresh penetrations / spring / bias, stale
    # projections (Jacobians, contact normals/Jacobians, friction coeffs)
    # and the reused factorization — the PhysX-per-step staleness envelope,
    # at half the per-substep cost (no Jacobian rebuild, no assembly, no
    # factorization) ----

    def resolve_substep(st, _):
        pts, _, _ = _ground_geometry(model, st.body_x, st.body_q, cfg)
        pen = (h0 + radius - pts[..., 2]) * nrm[:, :ng, 2]
        self_pts = None
        if cfg.self_contact:
            # fresh pair separations along the (cheap) closest-point
            # geometry; Jacobians/normals stay substep-1 stale like ground
            cA, cB, _, pen_s = _self_contact_geometry(model, st.body_x,
                                                      st.body_q)
            pen = jnp.concatenate([pen, pen_s], axis=1)
            self_pts = (cA, cB)
        act = (pen > 0.0).astype(pen.dtype)
        pf = act * jnp.minimum(pen, cfg.max_depenetration)
        f_l, Q_r = _gravity_bias_spring(model, st.body_x, st.body_q,
                                        st.body_v, st.body_w, st.u,
                                        target_q, gvec)
        Q_r = Q_r + _q_contact_merged(k_n * pf[:, :ng], nrm[:, :ng],
                                      k_n * pf, Jn_a_all)
        rhs = _assemble_rhs_merged(model, G, W, st.body_q, st.body_v,
                                   st.body_w, f_l, dt, Q_r, batch_major=bm)
        u2 = _velocity_clamp(resolve(rhs), cfg)
        st2 = _integrate_pose(model, st, u2, dt, tree)
        cf = _readback_contact(st2, pts, ground_body, self_pts, nrm, act,
                               d_t, k_n, pf, dt, d_n, onehot)
        return st2.replace(contact_force=cf), None

    if cfg.n_substeps > 1:
        st, _ = jax.lax.scan(resolve_substep, st, None,
                             length=cfg.n_substeps - 1)
    return st


def _contact_and_jacobians(model: Model, terrain, st: PhysicsState,
                           cfg: EngineConfig):
    """Fresh step-start geometry for the TGS path, in the row-merged
    production layout: body/contact Jacobian rows, contact set,
    penetrations, friction weights, implicit diagonal. Returns
    (G, W, ground, selfrows, Jn_a_all, nrm, active, d_t, pen_f_m, diag,
     h, radius, pts, ground_body, self_pts, table) where `ground` /
    `selfrows` are the _assemble_lhs_rhs row tuples and nrm/active/d_t/
    pen_f_m are the readback concats (ground rows then pair rows)."""
    p = model.params
    N = st.num_envs
    dt = cfg.substep_dt
    x, q = st.body_x, st.body_q

    piv_j = x[:, 1:] + quat.rotate(q[:, 1:], model.anchor_c[:, 1:])
    pivots_x = jnp.concatenate([x[:, 0:1], piv_j], axis=1)
    rdt = jnp.bfloat16 if cfg.rows_bf16 else jnp.float32
    G, W, t2m = _build_rows_merged(model, x, q, pivots_x, rdt)

    diag_joint = dt * p.kd + dt * dt * p.kp
    diag = jnp.concatenate([
        jnp.full((N, 3), dt * cfg.linear_damping),
        jnp.full((N, 3), dt * cfg.angular_damping),
        jnp.repeat(diag_joint, 3, axis=-1),
    ], axis=-1)

    table = "mesh" if cfg.mesh_contacts else "capsule"
    pts, radius, ground_body = _ground_geometry(model, x, q, cfg)
    h, nrm = _terrain_contact_lookup(terrain, x, pts, cfg)
    pen = (h + radius - pts[..., 2]) * nrm[..., 2]
    active = (pen > 0.0).astype(x.dtype)
    Gc = _point_rows_merged(pts, table, t2m)
    vpt = _point_velocities(x, st.body_v, st.body_w, pts, ground_body)
    vn = jnp.sum(vpt * nrm, axis=-1)
    vt = vpt - nrm * vn[..., None]
    vt_mag = jnp.linalg.norm(vt, axis=-1)

    k_n = cfg.contact_stiffness
    d_n = cfg.contact_damping
    pen_f = jnp.minimum(pen, cfg.max_depenetration)
    mu = jnp.where(vt_mag < cfg.friction_vel_ref,
                   cfg.static_friction, cfg.dynamic_friction)
    mu = mu * p.friction_scale[:, None]
    d_t = mu * (k_n * pen_f) / (vt_mag + cfg.friction_vel_ref)
    d_t = jnp.minimum(d_t, cfg.max_friction_damping)

    Jn_a = _normal_rows_merged(nrm, Gc, table)
    # LHS rows activate SPECULATIVELY (PhysX speculative contacts): a
    # contact that can engage within the control step gets its implicit
    # stiffness/damping row now, so when the factorization is reused across
    # substeps a mid-step touchdown is still solved implicitly — without
    # this, the 240 kN/m spring of a fresh contact acts explicitly for one
    # substep and kicks the body (measured: |u| doubling on foot plant).
    # The RHS spring force stays gated by TRUE penetration (no adhesion).
    reach = (-cfg.control_dt * jnp.minimum(vn, 0.0)
             + 0.5 * abs(cfg.gravity) * cfg.control_dt ** 2)
    pen_pred = pen + reach
    active_lhs = (pen_pred > 0.0).astype(x.dtype)
    wn = active_lhs * dt * (dt * k_n + d_n)
    # friction weight from the PREDICTED end-of-step penetration: a foot
    # about to land gets its implicit friction row now, so the reused
    # factorization resolves tangential velocity at touchdown (with wt from
    # the true current pen — zero pre-touch — the stale LHS lets landing
    # feet slide for a substep and velocities double)
    d_t_lhs = mu * (k_n * jnp.clip(pen_pred, 0.0, cfg.max_depenetration)) \
        / (vt_mag + cfg.friction_vel_ref)
    d_t_lhs = jnp.minimum(d_t_lhs, cfg.max_friction_damping)
    wt = active_lhs * dt * d_t_lhs
    ground = (Gc, Jn_a, nrm, wn, wt)
    Jn_a_all = Jn_a
    pen_f_m = active * pen_f
    selfrows = None
    self_pts = None
    if cfg.self_contact:
        (Gcs, Jn_sa, nrm_s, act_s, d_t_s, pen_f_s, wn_s, wt_s), self_pts = \
            _self_contact_rows_merged(model, x, q, st.body_v, st.body_w,
                                      t2m, cfg, speculative=True)
        selfrows = (Gcs, Jn_sa, wn_s, wt_s)
        Jn_a_all = jnp.concatenate([Jn_a, Jn_sa], axis=1)
        nrm = jnp.concatenate([nrm, nrm_s], axis=1)
        active = jnp.concatenate([active, act_s], axis=1)
        d_t = jnp.concatenate([d_t, d_t_s], axis=1)
        pen_f_m = jnp.concatenate([pen_f_m, pen_f_s], axis=1)
    return (G, W, ground, selfrows, Jn_a_all, nrm, active, d_t, pen_f_m,
            diag, h, radius, pts, ground_body, self_pts, table)


def _implicit_substep(model: Model, terrain, state: PhysicsState, target_q,
                      cfg: EngineConfig, tree) -> PhysicsState:
    dt = cfg.substep_dt
    p = model.params
    N = state.num_envs
    x, q = state.body_x, state.body_q
    v_b, w_b = state.body_v, state.body_w
    u = state.u

    # extended pivots: [root COM, joint pivots]
    piv_j = x[:, 1:] + quat.rotate(q[:, 1:], model.anchor_c[:, 1:])
    pivots_x = jnp.concatenate([x[:, 0:1], piv_j], axis=1)   # (N,24ext,3)

    G, W, t2m = _build_rows_merged(
        model, x, q, pivots_x,
        jnp.bfloat16 if cfg.rows_bf16 else jnp.float32)

    gvec = jnp.array([0.0, 0.0, cfg.gravity])
    f_lin, Q_rest = _gravity_bias_spring(model, x, q, v_b, w_b, u,
                                         target_q, gvec)

    # ---- implicit diagonal: dt·D + dt²·K (+ small root damping) ----
    kp = p.kp                                            # (N,23)
    kd = p.kd
    diag_joint = (dt * kd + dt * dt * kp)                # (N,23)
    diag = jnp.concatenate([
        jnp.full((N, 3), dt * cfg.linear_damping),
        jnp.full((N, 3), dt * cfg.angular_damping),
        jnp.repeat(diag_joint, 3, axis=-1),
    ], axis=-1)

    # ---- contacts: implicit spring-damper normal + Coulomb-capped viscous
    # friction, active-set masked ----
    table = "mesh" if cfg.mesh_contacts else "capsule"
    pts, radius, ground_body = _ground_geometry(model, x, q, cfg)
    h, nrm = _terrain_contact_lookup(terrain, x, pts, cfg)
    pen = (h + radius - pts[..., 2]) * nrm[..., 2]
    active = (pen > 0.0).astype(x.dtype)

    Gc = _point_rows_merged(pts, table, t2m)             # (N,3C,72)
    # point velocities from the body-velocity cache (≡ Jc·u, elementwise)
    vpt = _point_velocities(x, v_b, w_b, pts, ground_body)
    vn = jnp.sum(vpt * nrm, axis=-1)
    vt = vpt - nrm * vn[..., None]
    vt_mag = jnp.linalg.norm(vt, axis=-1)

    k_n = cfg.contact_stiffness
    d_n = cfg.contact_damping
    # depenetration clamp: deep impact penetrations push back at a bounded
    # force (cfg.max_depenetration), like PhysX's maxDepenetrationVelocity —
    # without it a 5 m/s impact at 240 kN/m injects energy and can blow up
    # a long training run
    pen_f = jnp.minimum(pen, cfg.max_depenetration)
    f_n_est = k_n * pen_f                                # spring part estimate
    # Coulomb-limited viscous friction coefficient (implicit); static μ for
    # near-stationary contact points, dynamic μ once sliding; per-env
    # friction_scale supports domain randomization (reference
    # apply_randomizations friction DR, base_task.py:547-787)
    mu = jnp.where(vt_mag < cfg.friction_vel_ref,
                   cfg.static_friction, cfg.dynamic_friction)
    mu = mu * p.friction_scale[:, None]
    d_t = mu * f_n_est / (vt_mag + cfg.friction_vel_ref)
    d_t = jnp.minimum(d_t, cfg.max_friction_damping)

    Jn_a = _normal_rows_merged(nrm, Gc, table)           # (N,C,72)
    wn = active * dt * (dt * k_n + d_n)
    # tangential projector T = E − nnᵀ folds as wt·JcᵀJc + (wn−wt)·JnᵀJn
    wt = active * dt * d_t
    pen_f = active * pen_f
    self_pts = None
    selfrows = None
    nrm_g = nrm
    Jn_a_all = Jn_a
    if cfg.self_contact:
        # this path rebuilds geometry every substep, so plain (non-
        # speculative) activation suffices for the pair rows
        (Gcs, Jn_sa, nrm_s, act_s, d_t_s, pen_f_s, wn_s, wt_s), self_pts = \
            _self_contact_rows_merged(model, x, q, v_b, w_b, t2m, cfg,
                                      speculative=False)
        selfrows = (Gcs, Jn_sa, wn_s, wt_s)
        Jn_a_all = jnp.concatenate([Jn_a, Jn_sa], axis=1)
        # readback row vectors (pair rows appended after the ground rows)
        nrm = jnp.concatenate([nrm, nrm_s], axis=1)
        active = jnp.concatenate([active, act_s], axis=1)
        d_t = jnp.concatenate([d_t, d_t_s], axis=1)
        pen_f = jnp.concatenate([pen_f, pen_f_s], axis=1)
    # RHS contact: normal spring force at current penetration (linear block
    # from ground rows only — pair rows have zero linear columns)
    ng = nrm_g.shape[1]
    Q_rest = Q_rest + _q_contact_merged(k_n * pen_f[:, :ng], nrm_g,
                                        k_n * pen_f, Jn_a_all)

    from .pallas_linalg import (backend_supports_pallas,
                                cholesky_solve_blocked,
                                cholesky_solve_blocked_t,
                                cholesky_solve_soa_t)
    use_pallas = backend_supports_pallas()
    bm = cfg.batch_major_solver and (cfg.blocked_solver or not use_pallas)
    gk = cfg.gram_kernel and use_pallas
    sg = _sqrt_gram_ok(cfg)
    At, rhs_t = _assemble_lhs_rhs(model, G, W, q, v_b, w_b, f_lin, dt,
                                  Q_rest, diag, (Gc, Jn_a, nrm_g, wn, wt),
                                  selfrows, table, batch_major=bm, gram=gk,
                                  sqrt_gram=sg)
    # env-last (·,·,N), or batch-major (N,·,·) when bm

    # ---- solve ----
    At = At + 1e-8 * (jnp.eye(NU)[None] if bm else jnp.eye(NU)[:, :, None])
    if use_pallas:
        # SoA Pallas kernel: one HBM read of A, factorization stays in VMEM
        if cfg.blocked_solver and bm:
            u_new = cholesky_solve_blocked(
                At, rhs_t, _ARROW_CHUNKS, _ARROW_LIMBS, _ARROW_S)
        elif cfg.blocked_solver:
            # block-arrow factorization along the tree's branch-induced
            # sparsity (zero fill-in, exact) — ~5× fewer VPU flops
            u_new = cholesky_solve_blocked_t(
                At, rhs_t, _ARROW_CHUNKS, _ARROW_LIMBS, _ARROW_S).T
        else:
            u_new = cholesky_solve_soa_t(At, rhs_t).T
    else:
        L = jnp.linalg.cholesky(At if bm else jnp.moveaxis(At, -1, 0))
        u_new = jax.scipy.linalg.cho_solve((L, True),
                                           rhs_t if bm else rhs_t.T)

    u_new = _velocity_clamp(u_new, cfg)
    st2 = _integrate_pose(model, state, u_new, dt, tree)
    contact_force = _readback_contact(st2, pts, ground_body, self_pts, nrm,
                                      active, d_t, k_n, pen_f, dt, d_n,
                                      _readback_onehot(cfg))
    return st2.replace(contact_force=contact_force)


def _velocity_clamp(u_new, cfg: EngineConfig):
    """Velocity clamps (PhysX maxLinearVelocity/maxAngularVelocity): keep
    the explicit quadratic velocity terms bounded for the next substep."""
    N = u_new.shape[0]

    def _norm_clamp(v, cap):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v * (jnp.minimum(n, cap) / jnp.maximum(n, 1e-9))

    return jnp.concatenate([
        _norm_clamp(u_new[:, 0:3], cfg.max_linear_velocity),
        _norm_clamp(u_new[:, 3:6], cfg.max_angular_velocity),
        _norm_clamp(u_new[:, 6:].reshape(N, NJ, 3),
                    cfg.max_angular_velocity).reshape(N, -1),
    ], axis=-1)


def _readback_contact(st_new: PhysicsState, pts, ground_body, self_pts,
                      nrm, active, d_t, k_n, pen_f, dt, d_n, onehot=None):
    """Contact force readback (for resets/diagnostics), evaluated from the
    POST-integration body-velocity cache: vpt = v_b + w_b×(pt − x_b) at the
    solved velocities, instead of Jc·u_new — no Jacobian read (the contact
    Jacobian is dead after assembly; its (3,75)-minor layout tile-pads ~4.5×
    and reading it every substep was the readback's entire cost). The lever
    arm uses the pre-integration contact points against the integrated pose,
    an O(dt·|u|) drift inside the TGS staleness envelope.

    Deliberate readback/dynamics asymmetry: the linear implicit solve can
    transiently apply an adhesive ("glue") normal force on fast separation;
    PhysX contacts are unilateral, so we report the clamped force the
    reference would (keeps contact-force terminations from firing on
    penalty-model artifacts). `onehot` (C, B) maps rows to per-body forces —
    signed for self-contact pairs (+F on A, −F on B)."""
    if onehot is None:
        onehot = jnp.asarray(_CONTACT_ONEHOT)
    x, v_b, w_b = st_new.body_x, st_new.body_v, st_new.body_w
    vpt_new = _point_velocities(x, v_b, w_b, pts, ground_body)
    if self_pts is not None:
        cA, cB = self_pts
        vpt_s = (_point_velocities(x, v_b, w_b, cA, _SELF_A)
                 - _point_velocities(x, v_b, w_b, cB, _SELF_B))
        vpt_new = jnp.concatenate([vpt_new, vpt_s], axis=1)
    vn_new = jnp.sum(vpt_new * nrm, axis=-1)
    f_n = active * (k_n * pen_f - (dt * k_n + d_n) * vn_new)
    f_n = jnp.maximum(f_n, 0.0)
    vt_new = vpt_new - nrm * vn_new[..., None]
    f_t = -d_t[..., None] * vt_new * active[..., None]
    f_c = f_n[..., None] * nrm + f_t                     # (N,C,3)
    return jnp.einsum("cb,nci->nbi", onehot, f_c)


def _integrate_pose(model: Model, state: PhysicsState, u_new, dt, tree):
    """Integrate root/joint poses, enforce joint limits (position clamp +
    velocity projection), refresh the body cache. contact_force is set by
    the caller AFTER this (the readback reads the refreshed cache)."""
    p = model.params
    N = u_new.shape[0]
    q = state.body_q
    v_root = u_new[:, 0:3]
    w_root = u_new[:, 3:6]
    qd = u_new[:, 6:].reshape(N, NJ, 3)

    root_pos = state.root_pos + dt * v_root
    root_rot = quat.normalize(
        quat.mul(quat.exp_map_to_quat(w_root * dt), state.root_rot))
    parent = np.maximum(PARENTS, 0)
    qp = q[:, parent][:, 1:]
    dq_local = quat.exp_map_to_quat(quat.rotate_inv(qp, qd) * dt)
    joint_rot = quat.normalize(quat.mul(dq_local, state.joint_rot))

    th = quat.to_exp_map(joint_rot)
    lim = p.joint_limit
    th_cl = jnp.clip(th, -lim, lim)
    hit = jnp.abs(th - th_cl) > 1e-7
    joint_rot = jnp.where(hit.any(-1, keepdims=True),
                          quat.exp_map_to_quat(th_cl), joint_rot)
    qd_local = quat.rotate_inv(qp, qd)
    qd_local = jnp.where(hit, 0.0, qd_local)
    qd = quat.rotate(qp, qd_local)
    u_new = u_new.at[:, 6:].set(qd.reshape(N, -1))

    new_state = state.replace(
        root_pos=root_pos, root_rot=root_rot, joint_rot=joint_rot, u=u_new)
    return refresh_cache(model, new_state, tree)
