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
from .terrain import Heightfield, height_at, normal_at
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

# extended "joint" list: index 0 = root angular DOF (pivot = root COM, mask =
# all bodies); 1..23 = real joints. Used for uniform mass-matrix assembly.
_SUBX = np.concatenate([np.ones((1, B), np.float32), _SUB], 0)   # (24, 24)

# NESTX[a, b] = index of the deeper of two nested extended-joints (their
# subtree intersection equals that joint's subtree), or -1 if disjoint.
_NESTX = np.full((NJ + 1, NJ + 1), -1, np.int64)
for a in range(NJ + 1):
    for b_ in range(NJ + 1):
        if a == 0:
            _NESTX[a, b_] = b_
        elif b_ == 0:
            _NESTX[a, b_] = a
        elif _SUB[b_ - 1, a] > 0:     # child body of joint a inside subtree b
            _NESTX[a, b_] = a
        elif _SUB[a - 1, b_] > 0:
            _NESTX[a, b_] = b_
_NEST_VALID = (_NESTX >= 0).astype(np.float32)
_NESTX_SAFE = np.maximum(_NESTX, 0)


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
    """u → per-body COM velocity and angular velocity."""
    v_root = u[:, 0:3]
    w_root = u[:, 3:6]
    qd = u[:, 6:].reshape(-1, NJ, 3)
    sub = jnp.asarray(_SUB)
    # ω_b = ω_root + Σ_j SUB[j,b]·qd_j
    w_b = w_root[:, None] + jnp.einsum("jb,nji->nbi", sub, qd)
    # v_b = v_root + ω_root×(x_b − x_root) + Σ_j qd_j×(x_b − piv_j)
    x0 = x[:, 0:1]
    piv = gpos_pivot[:, 1:]                               # (N,23,3)
    r0 = x - x0
    v_b = v_root[:, None] + jnp.cross(w_root[:, None], r0)
    rj = x[:, None] - piv[:, :, None]                     # (N,23,B,3)
    v_b = v_b + jnp.einsum("jb,njbi->nbi", sub,
                           jnp.cross(qd[:, :, None], rj))
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

    st = PhysicsState(
        root_pos=root_com,
        root_rot=root_rot,
        joint_rot=joint_rot,
        u=jnp.zeros((N, NU)),
        body_x=jnp.zeros((N, B, 3)),
        body_q=jnp.zeros((N, B, 4)),
        body_v=jnp.zeros((N, B, 3)),
        body_w=jnp.zeros((N, B, 3)),
        contact_force=jnp.zeros((N, B, 3)),
    )
    st = refresh_cache(model, st, tree)
    # world-frame joint velocities: qd_j = R_parent · dof_vel_j
    parent = np.maximum(PARENTS, 0)
    qd = quat.rotate(st.body_q[:, parent][:, 1:], dof_vel)
    # root velocity given at the pivot; convert to COM
    r = quat.rotate(root_rot, model.com_off[:, 0])
    v_com = root_vel + jnp.cross(root_ang_vel, r)
    u = jnp.concatenate([v_com, root_ang_vel, qd.reshape(N, -1)], axis=-1)
    st = st.replace(u=u)
    return refresh_cache(model, st, tree)


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

def _skew(r):
    zero = jnp.zeros_like(r[..., 0])
    return jnp.stack([
        jnp.stack([zero, -r[..., 2], r[..., 1]], -1),
        jnp.stack([r[..., 2], zero, -r[..., 0]], -1),
        jnp.stack([-r[..., 1], r[..., 0], zero], -1),
    ], -2)


def _mass_matrix(model: Model, x, q, pivots_x):
    """M (N,75,75) via per-(extended-)subtree moments.

    For extended joints a,b with pivots p_a, p_b and intersection subtree s
    (tree ⇒ the deeper joint's subtree):
      M_vv[a,b] = Σ_{k∈s} m_k [r_ka]×ᵀ[r_kb]×,  r_ka = x_k − p_a
                = (tr(P) E − Pᵀ),  P = Σ m_k r_ka r_kbᵀ  (from moments)
      M_ωω[a,b] += Σ_{k∈s} I_k (world)
    Root-linear rows close the 75×75: M[lin,lin] = M_tot E,
    M[lin, a] = −[s_a]×, s_a = Σ_{k∈sub(a)} m_k (x_k − p_a).
    """
    p = model.params
    m = p.mass                                           # (N,B)
    R = quat.to_matrix(q)
    I_world = jnp.einsum("nbik,nbk,nbjk->nbij", R, p.inertia, R)

    subx = jnp.asarray(_SUBX)                            # (24ext,24)
    M0 = jnp.einsum("ab,nb->na", subx, m)                # (N,24ext)
    M1 = jnp.einsum("ab,nb,nbi->nai", subx, m, x)        # (N,24ext,3)
    M2 = jnp.einsum("ab,nb,nbi,nbj->naij", subx, m, x, x)
    Isum = jnp.einsum("ab,nbij->naij", subx, I_world)

    piv = pivots_x                                       # (N,24ext,3)

    nest = jnp.asarray(_NESTX_SAFE)
    valid = jnp.asarray(_NEST_VALID)

    # gather intersection moments for every (a,b) pair
    M0s = M0[:, nest]                                    # (N,24,24)
    M1s = M1[:, nest]                                    # (N,24,24,3)
    M2s = M2[:, nest]                                    # (N,24,24,3,3)
    Iss = Isum[:, nest]

    pa = piv[:, :, None]                                 # (N,24,1,3)
    pb = piv[:, None, :]                                 # (N,1,24,3)
    # P = Σ m r_ka r_kbᵀ = M2 − M1 pbᵀ − pa M1ᵀ + M0 pa pbᵀ
    P = (M2s
         - M1s[..., :, None] * pb[..., None, :]
         - pa[..., :, None] * M1s[..., None, :]
         + M0s[..., None, None] * pa[..., :, None] * pb[..., None, :])
    trP = P[..., 0, 0] + P[..., 1, 1] + P[..., 2, 2]
    eye = jnp.eye(3)
    Mvv = trP[..., None, None] * eye - jnp.swapaxes(P, -1, -2)
    blocks = (Mvv + Iss) * valid[None, :, :, None, None]  # (N,24,24,3,3)

    # root-linear couplings
    s_a = M1 - M0[..., None] * piv                       # (N,24ext,3)
    lin_a = -_skew(s_a)                                  # (N,24ext,3,3) = −[s_a]×

    N = x.shape[0]
    # assemble (N,75,75): [lin(3) | ang+joints(72)]
    A = jnp.zeros((N, NU, NU))
    Mtot = M0[:, 0]
    A = A.at[:, 0:3, 0:3].set(Mtot[:, None, None] * eye)
    # lin-ext blocks
    linext = jnp.swapaxes(lin_a, 1, 2).reshape(N, 3, -1)  # (N,3,24*3)
    A = A.at[:, 0:3, 3:].set(linext)
    A = A.at[:, 3:, 0:3].set(jnp.swapaxes(linext, -1, -2))
    big = jnp.swapaxes(blocks, 2, 3).reshape(N, (NJ + 1) * 3, (NJ + 1) * 3)
    A = A.at[:, 3:, 3:].set(big)
    return A


# ---------------------------------------------------------------------------
# Generalized forces
# ---------------------------------------------------------------------------

def _point_jacobian_rows(x0, pivots_x, points, body_idx_mask):
    """Jacobian of world point velocities wrt u.

    points (N,C,3); body_idx_mask (C, 24) one-hot body of each point (static).
    Returns Jc (N,C,3,75).
    """
    N, C = points.shape[0], points.shape[1]
    eye = jnp.eye(3)
    Jc = jnp.zeros((N, C, 3, NU))
    Jc = Jc.at[..., 0:3].set(jnp.broadcast_to(eye, (N, C, 3, 3)))
    r0 = points - x0[:, None]                            # (N,C,3)
    Jc = Jc.at[..., 3:6].set(-_skew(r0))
    # joints: −[p − piv_j]× if joint j is an ancestor of the point's body
    anc = body_idx_mask @ _SUB.T                         # (C, 23) static
    rj = points[:, :, None] - pivots_x[:, None, 1:]      # (N,C,23,3)
    sk = -_skew(rj) * jnp.asarray(anc)[None, :, :, None, None]
    Jc = Jc.at[..., 6:].set(
        jnp.swapaxes(sk, 2, 3).reshape(N, C, 3, NJ * 3))
    return Jc


def _gravity_bias_spring(model, x, q, v_b, w_b, u, pivots_x, target_q, dt,
                         gvec):
    """Q_gravity + Q_bias + explicit spring RHS; also returns (K, D) diags."""
    p = model.params
    m = p.mass
    subx = jnp.asarray(_SUBX)

    # gravity: Q_lin = M_tot g;  Q_a = Σ_{k∈sub(a)} m_k (x_k − p_a) × g
    s_a = (jnp.einsum("ab,nb,nbi->nai", subx, m, x)
           - jnp.einsum("ab,nb->na", subx, m)[..., None] * pivots_x)
    Qg_ext = jnp.cross(s_a, gvec)                        # (N,24ext,3)
    Qg_lin = jnp.einsum("nb,i->ni", m.sum(-1, keepdims=True), gvec)

    # velocity-product (bias): a_k^vp and gyroscopic
    parent = np.maximum(PARENTS, 0)
    qd = u[:, 6:].reshape(-1, NJ, 3)
    w_root = u[:, 3:6]
    v_root_pt = v_b[:, 0]
    # pivot point velocities (attached to parent body)
    piv_j = pivots_x[:, 1:]
    v_piv = (v_b[:, parent][:, 1:]
             + jnp.cross(w_b[:, parent][:, 1:],
                         piv_j - x[:, parent][:, 1:]))
    sub = jnp.asarray(_SUB)
    a_vp = jnp.cross(w_root[:, None], v_b - v_root_pt[:, None])
    a_vp = a_vp + jnp.einsum(
        "jb,njbi->nbi", sub,
        jnp.cross(qd[:, :, None], v_b[:, None] - v_piv[:, :, None]))
    R = quat.to_matrix(q)
    I_world = jnp.einsum("nbik,nbk,nbjk->nbij", R, p.inertia, R)
    gyro = jnp.cross(w_b, jnp.einsum("nbij,nbj->nbi", I_world, w_b))

    f_in = m[..., None] * a_vp                           # inertial force
    Qb_lin = -jnp.einsum("nbi->ni", f_in)
    r_ext = x[:, None] - pivots_x[:, :, None]            # (N,24ext,B,3)
    Qb_ext = -(jnp.einsum("ab,nabi->nai", subx,
                          jnp.cross(r_ext, f_in[:, None]))
               + jnp.einsum("ab,nbi->nai", subx, gyro))

    # Stable-PD spring: θ in world frame; RHS gets −kp·θ (implicit terms → LHS)
    qp = q[:, parent][:, 1:]
    q_rel = quat.mul(quat.conjugate(qp), q[:, 1:])
    q_err = quat.mul(q_rel, quat.conjugate(target_q))
    theta = quat.rotate(qp, quat.to_exp_map(q_err))      # (N,23,3)
    Q_spring = -p.kp[..., None] * theta

    Q = jnp.concatenate([
        Qg_lin + Qb_lin,
        (Qg_ext + Qb_ext)[:, 0],
        (Qg_ext + Qb_ext)[:, 1:].reshape(x.shape[0], -1)
        + Q_spring.reshape(x.shape[0], -1),
    ], axis=-1)
    return Q


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------

# contact sample table: every body contributes its two capsule-end spheres
_CONTACT_BODY = np.repeat(np.arange(B), 2)               # (48,)
_CONTACT_END = np.tile(np.array([0, 1]), B)              # (48,)
_CONTACT_ONEHOT = np.eye(B, dtype=np.float32)[_CONTACT_BODY]  # (48,24)
NC = len(_CONTACT_BODY)


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

    def substep(st, _):
        return _implicit_substep(model, terrain, st, target_q, cfg, tree), None

    state, _ = jax.lax.scan(substep, state, None, length=cfg.n_substeps)
    return state


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

    M = _mass_matrix(model, x, q, pivots_x)

    gvec = jnp.array([0.0, 0.0, cfg.gravity])
    Q = _gravity_bias_spring(model, x, q, v_b, w_b, u, pivots_x, target_q,
                             dt, gvec)

    # ---- LHS: M + dt·D + dt²·K (+ small root damping) ----
    kp = p.kp                                            # (N,23)
    kd = p.kd
    diag_joint = (dt * kd + dt * dt * kp)                # (N,23)
    diag = jnp.concatenate([
        jnp.full((N, 3), dt * cfg.linear_damping),
        jnp.full((N, 3), dt * cfg.angular_damping),
        jnp.repeat(diag_joint, 3, axis=-1),
    ], axis=-1)
    A = M + jax.vmap(jnp.diag)(diag)

    # ---- contacts: implicit spring-damper normal + Coulomb-capped viscous
    # friction, active-set masked ----
    pts = _contact_points(model, x, q)                   # (N,48,3)
    radius = p.capsule_radius[:, _CONTACT_BODY]          # (N,48)
    h = height_at(terrain, pts[..., :2])
    nrm = normal_at(terrain, pts[..., :2])               # (N,48,3)
    pen = (h + radius - pts[..., 2]) * nrm[..., 2]
    active = (pen > 0.0).astype(x.dtype)

    Jc = _point_jacobian_rows(x[:, 0], pivots_x, pts, _CONTACT_ONEHOT)
    # point velocities
    vpt = jnp.einsum("ncij,nj->nci", Jc, u)
    vn = jnp.sum(vpt * nrm, axis=-1)
    vt = vpt - nrm * vn[..., None]
    vt_mag = jnp.linalg.norm(vt, axis=-1)

    k_n = cfg.contact_stiffness
    d_n = cfg.contact_damping
    f_n_est = k_n * pen                                  # spring part estimate
    # Coulomb-limited viscous friction coefficient (implicit)
    d_t = cfg.dynamic_friction * f_n_est / (vt_mag + cfg.friction_vel_ref)
    d_t = jnp.minimum(d_t, cfg.max_friction_damping)

    Jn = jnp.einsum("nci,ncij->ncj", nrm, Jc)            # (N,48,75)
    wn = active * dt * (dt * k_n + d_n)
    A = A + jnp.einsum("nc,nci,ncj->nij", wn, Jn, Jn)
    # tangential projector T = E − nnᵀ: JcᵀT Jc = JcᵀJc − JnᵀJn
    wt = active * dt * d_t
    A = A + (jnp.einsum("nc,ncdi,ncdj->nij", wt, Jc, Jc)
             - jnp.einsum("nc,nci,ncj->nij", wt, Jn, Jn))
    # RHS contact: normal spring force at current penetration
    Q = Q + jnp.einsum("nc,ncj->nj", active * k_n * pen, Jn)

    rhs = jnp.einsum("nij,nj->ni", M, u) + dt * Q

    # ---- solve ----
    L = jnp.linalg.cholesky(A + 1e-8 * jnp.eye(NU))
    u_new = jax.scipy.linalg.cho_solve((L, True), rhs)

    # ---- contact force readback (for resets/diagnostics) ----
    vpt_new = jnp.einsum("ncij,nj->nci", Jc, u_new)
    vn_new = jnp.sum(vpt_new * nrm, axis=-1)
    f_n = active * (k_n * pen - (dt * k_n + d_n) * vn_new)
    f_n = jnp.maximum(f_n, 0.0)
    vt_new = vpt_new - nrm * vn_new[..., None]
    f_t = -d_t[..., None] * vt_new * active[..., None]
    f_c = f_n[..., None] * nrm + f_t                     # (N,48,3)
    contact_force = jnp.einsum("cb,nci->nbi", jnp.asarray(_CONTACT_ONEHOT), f_c)

    # ---- integrate positions ----
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

    # ---- joint limits: position clamp + velocity projection ----
    th = quat.to_exp_map(joint_rot)
    lim = p.joint_limit
    th_cl = jnp.clip(th, -lim, lim)
    hit = jnp.abs(th - th_cl) > 1e-7
    joint_rot = jnp.where(hit.any(-1, keepdims=True),
                          quat.exp_map_to_quat(th_cl), joint_rot)
    # remove joint velocity along clamped axes (parent frame)
    qd_local = quat.rotate_inv(qp, qd)
    qd_local = jnp.where(hit, 0.0, qd_local)
    qd = quat.rotate(qp, qd_local)
    u_new = u_new.at[:, 6:].set(qd.reshape(N, -1))

    new_state = state.replace(
        root_pos=root_pos, root_rot=root_rot, joint_rot=joint_rot,
        u=u_new, contact_force=contact_force)
    return refresh_cache(model, new_state, tree)
