"""SMPL-parameterized humanoid body model → batched physics parameters.

TPU-native replacement for the reference's Robot/MJCF pipeline
(/root/reference/pacer/uhc/smpllib/smpl_local_robot.py:1138-1447: per-env
SMPL betas → capsule MJCF XML → PhysX asset parse). A per-env XML round-trip
makes no sense on TPU: instead we map betas **directly** to batched arrays
(joint offsets, capsule radii/half-lengths, masses, inertias, PD gains,
torque limits, joint limits) that a single vmapped engine consumes — same
engine code for every env, heterogeneous bodies as data, zero recompilation
(reference equivalent: has_shape_variation, humanoid.py:690-739).

The canonical 24-joint skeleton follows the SMPL joint hierarchy (names and
order as the reference's MJCF humanoid, humanoid.py:264) with a z-up,
upright rest pose (reference `has_upright_start`, humanoid.py:239). When a
real SMPL model npz is available it can be plugged in via `from_smpl_npz`;
otherwise the built-in mean-shape template (canonical offsets + linear beta
scaling) is used, which preserves every downstream code path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from .skeleton import SkeletonTree

# ---------------------------------------------------------------------------
# Canonical skeleton (z-up, upright rest pose; T-pose arms along +/-y)
# Order matches the reference's `_body_names_orig` (humanoid.py:264).
# ---------------------------------------------------------------------------

BODY_NAMES = (
    "Pelvis", "L_Hip", "L_Knee", "L_Ankle", "L_Toe",
    "R_Hip", "R_Knee", "R_Ankle", "R_Toe",
    "Torso", "Spine", "Chest", "Neck", "Head",
    "L_Thorax", "L_Shoulder", "L_Elbow", "L_Wrist", "L_Hand",
    "R_Thorax", "R_Shoulder", "R_Elbow", "R_Wrist", "R_Hand",
)

PARENTS = np.array([
    -1, 0, 1, 2, 3,       # pelvis, left leg
    0, 5, 6, 7,           # right leg
    0, 9, 10, 11, 12,     # torso..head
    11, 14, 15, 16, 17,   # left arm (thorax from chest)
    11, 19, 20, 21, 22,   # right arm
], dtype=np.int64)

NUM_BODIES = len(BODY_NAMES)     # 24
NUM_JOINTS = NUM_BODIES - 1      # 23 actuated spherical joints
MESH_K = 6                       # collision spheres per body (mesh variant)
NUM_DOF = NUM_JOINTS * 3         # 69

# Mean-shape local joint offsets in parent frame (meters, z-up, x forward).
# Template values for an ~1.7 m adult; limbs scale with betas below.
_MEAN_OFFSETS = np.array([
    [0.000,  0.000,  0.000],   # Pelvis (root)
    [0.000,  0.084, -0.073],   # L_Hip
    [0.000,  0.000, -0.386],   # L_Knee
    [0.000,  0.000, -0.415],   # L_Ankle
    [0.130,  0.000, -0.060],   # L_Toe
    [0.000, -0.084, -0.073],   # R_Hip
    [0.000,  0.000, -0.386],   # R_Knee
    [0.000,  0.000, -0.415],   # R_Ankle
    [0.130,  0.000, -0.060],   # R_Toe
    [0.000,  0.000,  0.113],   # Torso
    [0.000,  0.000,  0.131],   # Spine
    [0.000,  0.000,  0.055],   # Chest
    [0.000,  0.000,  0.212],   # Neck
    [0.000,  0.000,  0.090],   # Head
    [0.000,  0.072,  0.137],   # L_Thorax
    [0.000,  0.105,  0.000],   # L_Shoulder
    [0.000,  0.262,  0.000],   # L_Elbow
    [0.000,  0.249,  0.000],   # L_Wrist
    [0.000,  0.085,  0.000],   # L_Hand
    [0.000, -0.072,  0.137],   # R_Thorax
    [0.000, -0.105,  0.000],   # R_Shoulder
    [0.000, -0.262,  0.000],   # R_Elbow
    [0.000, -0.249,  0.000],   # R_Wrist
    [0.000, -0.085,  0.000],   # R_Hand
], dtype=np.float32)

# Capsule geometry per body: radius (m). Half-length is derived from the
# child-bone length (distal direction, smpl_local_robot.py:1477-1501).
_CAPSULE_RADIUS = np.array([
    0.115,                     # Pelvis
    0.070, 0.055, 0.045, 0.035,   # left leg
    0.070, 0.055, 0.045, 0.035,   # right leg
    0.105, 0.105, 0.110, 0.045, 0.095,  # torso..head
    0.055, 0.045, 0.035, 0.030, 0.030,  # left arm
    0.055, 0.045, 0.035, 0.030, 0.030,  # right arm
], dtype=np.float32)

# Per-body mass fraction of total body mass (sums to 1). Derived from standard
# biomechanical segment-mass tables (Winter); total default mass = 77 kg
# when `real_weight` (reference humanoid.py:907, default_humanoid_mass).
_MASS_FRAC = np.array([
    0.1366,                          # Pelvis
    0.0700, 0.0465, 0.0130, 0.0020,  # left leg: thigh, shank, foot, toe
    0.0700, 0.0465, 0.0130, 0.0020,  # right leg
    0.0650, 0.0650, 0.1300, 0.0120, 0.0670,  # torso, spine, chest, neck, head
    0.0150, 0.0265, 0.0155, 0.0050, 0.0040,  # left arm
    0.0150, 0.0265, 0.0155, 0.0050, 0.0040,  # right arm
], dtype=np.float32)
_MASS_FRAC = _MASS_FRAC / _MASS_FRAC.sum()  # normalize to exactly 1

# PD gains and torque limits per joint (kp, kd, torque_limit). Values follow
# the reference's GAINS table (uhc/khrylib/mocap/skeleton_mesh_local.py:14-38:
# [kp, kd, _, torque_lim]).
_PD_TABLE = {
    "L_Hip": (500, 50, 500), "L_Knee": (500, 50, 500),
    "L_Ankle": (400, 40, 500), "L_Toe": (200, 20, 500),
    "R_Hip": (500, 50, 500), "R_Knee": (500, 50, 500),
    "R_Ankle": (400, 40, 500), "R_Toe": (200, 20, 500),
    "Torso": (1000, 100, 500), "Spine": (1000, 100, 500),
    "Chest": (1000, 100, 500), "Neck": (100, 10, 250), "Head": (100, 10, 250),
    "L_Thorax": (400, 40, 500), "L_Shoulder": (400, 40, 500),
    "L_Elbow": (300, 30, 150), "L_Wrist": (100, 10, 150), "L_Hand": (100, 10, 150),
    "R_Thorax": (400, 40, 150), "R_Shoulder": (400, 40, 250),
    "R_Elbow": (300, 30, 150), "R_Wrist": (100, 10, 150), "R_Hand": (100, 10, 150),
}

# Symmetric per-axis joint limits (rad), upright variant
# (smpl_local_robot.py:177-275 update_joint_limits[_upright]). Axis order is
# the joint exp-map axis order (x, y, z) in the child frame.
_PI = np.pi
_JOINT_LIMITS = {
    "Head": (_PI / 2, _PI / 2, _PI / 2),
    "Chest": (_PI / 3, _PI / 3, _PI / 3),
    "Spine": (_PI / 3, _PI / 3, _PI / 3),
    "Torso": (_PI / 3, _PI / 3, _PI / 3),
    "Neck": (_PI / 2, _PI / 2, _PI / 2),
    "L_Thorax": (_PI, _PI, _PI), "R_Thorax": (_PI, _PI, _PI),
    "L_Shoulder": (_PI, _PI, _PI), "R_Shoulder": (_PI, _PI, _PI),
    "L_Elbow": (_PI / 2, _PI, _PI / 32), "R_Elbow": (_PI / 2, _PI, _PI / 32),
    "L_Wrist": (_PI / 2, _PI / 2, _PI / 2), "R_Wrist": (_PI / 2, _PI / 2, _PI / 2),
    "L_Hand": (_PI / 2, _PI / 2, _PI / 2), "R_Hand": (_PI / 2, _PI / 2, _PI / 2),
    "L_Hip": (_PI / 2, _PI / 2, _PI / 2), "R_Hip": (_PI / 2, _PI / 3, _PI / 3),
    # upright variant: knee flexion about y
    "L_Knee": (_PI / 32, _PI, _PI / 32), "R_Knee": (_PI / 32, _PI, _PI / 32),
    "L_Ankle": (_PI / 4, _PI / 2, _PI / 4), "R_Ankle": (_PI / 4, _PI / 2, _PI / 4),
    "L_Toe": (_PI / 32, _PI / 2, _PI / 32), "R_Toe": (_PI / 32, _PI / 2, _PI / 32),
}

KEY_BODIES = ("R_Ankle", "L_Ankle", "R_Wrist", "L_Wrist")  # pacer.yaml keyBodies
CONTACT_BODIES = ("R_Ankle", "L_Ankle", "R_Toe", "L_Toe")  # allowed ground contact

DEFAULT_HUMANOID_MASS = 77.0  # kg (reference humanoid.py:907)


def canonical_skeleton() -> SkeletonTree:
    return SkeletonTree(names=BODY_NAMES, parents=PARENTS,
                        local_translation=_MEAN_OFFSETS.copy())


class BodyParams(struct.PyTreeNode):
    """Batched per-env physical parameters — the 'asset', as data.

    All arrays lead with the env axis (N, ...). This is the TPU-native
    equivalent of one parsed PhysX asset per env.
    """

    local_offsets: jnp.ndarray    # (N, 24, 3) rest offsets in parent frame
    capsule_radius: jnp.ndarray   # (N, 24)
    capsule_half: jnp.ndarray     # (N, 24) half-length along capsule axis
    capsule_axis: jnp.ndarray     # (N, 24, 3) capsule axis in body frame (unit)
    capsule_start: jnp.ndarray    # (N, 24, 3) capsule segment start in body frame
    #   (zero for most bodies; feet start behind the ankle pivot — the heel —
    #    mirroring the reference foot geoms that cover heel→toe,
    #    smpl_local_robot.py get_joint_geometries + replace_feet)
    mass: jnp.ndarray             # (N, 24)
    inv_mass: jnp.ndarray         # (N, 24)
    inertia: jnp.ndarray          # (N, 24, 3) principal inertia (body frame diag)
    inv_inertia: jnp.ndarray      # (N, 24, 3)
    kp: jnp.ndarray               # (N, 23) PD stiffness per joint
    kd: jnp.ndarray               # (N, 23) PD damping
    torque_limit: jnp.ndarray     # (N, 23)
    joint_limit: jnp.ndarray      # (N, 23, 3) symmetric per-axis limits (rad)
    betas: jnp.ndarray            # (N, 16) the generating shape params
    height_offset: jnp.ndarray    # (N,) rest pelvis height above ground
    friction_scale: jnp.ndarray   # (N,) per-env friction multiplier (DR)
    # mesh-geom collision variant (reference get_joint_geometries,
    # smpl_local_robot.py:83-146 builds per-beta vertex colliders): MESH_K
    # inscribed-sphere centers per body in the COM frame + radii. Static
    # shapes so the contact table compiles; consumed when
    # EngineConfig.mesh_contacts is on.
    mesh_points: jnp.ndarray = None        # (N, 24, MESH_K, 3)
    mesh_point_radius: jnp.ndarray = None  # (N, 24, MESH_K)

    @property
    def num_envs(self) -> int:
        return self.local_offsets.shape[0]


def _bone_vectors(offsets: np.ndarray | jnp.ndarray):
    """Mean child offset per body (the 'bone' each capsule covers).

    For leaf bodies uses a nominal extent along the capsule direction.
    """
    xp = jnp if isinstance(offsets, jnp.ndarray) else np
    children = [[] for _ in range(NUM_BODIES)]
    for j in range(1, NUM_BODIES):
        children[PARENTS[j]].append(j)
    bones = []
    leaf_extent = {
        "L_Toe": [0.10, 0.0, 0.0], "R_Toe": [0.10, 0.0, 0.0],
        "Head": [0.0, 0.0, 0.14],
        "L_Hand": [0.0, 0.10, 0.0], "R_Hand": [0.0, -0.10, 0.0],
    }
    for b in range(NUM_BODIES):
        if children[b]:
            v = sum(offsets[..., c, :] for c in children[b]) / len(children[b])
        else:
            v = xp.broadcast_to(
                xp.asarray(leaf_extent[BODY_NAMES[b]], dtype=offsets.dtype),
                offsets[..., b, :].shape,
            )
        bones.append(v)
    return xp.stack(bones, axis=-2)  # (..., 24, 3)


def build_body_params(
    betas: jnp.ndarray,
    kp_scale: float = 1.0,
    kd_scale: float = 1.0,
    total_mass: Optional[float] = None,
    offsets_override: Optional[jnp.ndarray] = None,
) -> BodyParams:
    """betas (N, 16) → BodyParams. Fully traced/jittable (reshape-free math).

    Beta semantics (template stand-in for the SMPL shape space; swap in real
    blend shapes via `from_smpl_npz` when model files are present):
      beta[0]: overall scale (±0.05 per unit), beta[1]: limb-length vs torso,
      beta[2]: girth (capsule radii / mass). Remaining betas perturb
      per-segment lengths with small weights so the 16-d input stays live.

    offsets_override (N, 24, 3): parent-relative rest offsets from a real
    SMPL model (from_smpl_npz) — every derived quantity (bones, capsule
    segments, inertia, rest height) is recomputed from them so the asset
    stays self-consistent.
    """
    betas = jnp.asarray(betas, dtype=jnp.float32)
    if betas.ndim == 1:
        betas = betas[None]
    if betas.shape[-1] < 16:      # real SMPL betas are 10-d; template uses 16
        betas = jnp.pad(betas, ((0, 0), (0, 16 - betas.shape[-1])))
    N = betas.shape[0]
    B = NUM_BODIES

    overall = 1.0 + 0.05 * betas[:, 0:1]                      # (N,1)
    limb = 1.0 + 0.04 * betas[:, 1:2]
    girth = 1.0 + 0.06 * betas[:, 2:3]
    # small per-body jitter from remaining betas (fixed random projection)
    rng = np.random.RandomState(7)
    proj = jnp.asarray(rng.randn(13, B).astype(np.float32) * 0.01)
    per_body = 1.0 + betas[:, 3:16] @ proj                    # (N,24)

    is_limb = np.zeros(B, np.float32)
    for i, n in enumerate(BODY_NAMES):
        if n.startswith(("L_", "R_")):
            is_limb[i] = 1.0
    limb_scale = jnp.where(jnp.asarray(is_limb)[None], limb, 1.0)  # (N,24)

    scale = overall * limb_scale * per_body                   # (N,24)
    if offsets_override is not None:
        offsets = jnp.asarray(offsets_override, jnp.float32)
        if offsets.ndim == 2:
            offsets = offsets[None]
        offsets = jnp.broadcast_to(offsets, (N, B, 3))
    else:
        offsets = jnp.asarray(_MEAN_OFFSETS)[None] * scale[..., None]

    bones = _bone_vectors(offsets)                            # (N,24,3)
    # feet: capsule spans heel→toe (heel extends behind the ankle pivot so the
    # support polygon brackets the COM — otherwise the humanoid cannot stand)
    start = jnp.zeros_like(offsets)
    for ankle, toe in ((BODY_NAMES.index("L_Ankle"), BODY_NAMES.index("L_Toe")),
                       (BODY_NAMES.index("R_Ankle"), BODY_NAMES.index("R_Toe"))):
        toe_off = offsets[:, toe]                             # (N,3)
        heel = jnp.stack(
            [-0.45 * jnp.abs(toe_off[:, 0]), jnp.zeros_like(toe_off[:, 1]),
             toe_off[:, 2]], axis=-1)
        start = start.at[:, ankle].set(heel)
        bones = bones.at[:, ankle].set(toe_off - heel)
    bone_len = jnp.linalg.norm(bones, axis=-1)
    axis = bones / jnp.maximum(bone_len[..., None], 1e-6)
    radius = jnp.asarray(_CAPSULE_RADIUS)[None] * girth * overall
    half = jnp.maximum(bone_len * 0.5, radius * 0.5)

    if total_mass is None:
        total_mass = DEFAULT_HUMANOID_MASS
    mass_scale = overall[:, 0] ** 3 * girth[:, 0]             # volume-ish scaling
    mass = jnp.asarray(_MASS_FRAC)[None] * total_mass * mass_scale[:, None]

    # capsule principal inertia (solid cylinder+caps approximation, body frame
    # diag with the long axis as the small moment)
    r2 = radius ** 2
    L = 2 * half
    i_axial = 0.5 * mass * r2
    i_trans = mass * (L ** 2 / 12.0 + r2 / 4.0)
    # compose diag in body frame: align the small moment with the capsule axis.
    # We keep a diagonal approximation: lerp between axial/transverse by axis
    # components (valid for near-axis-aligned capsules; cheap and stable).
    ax2 = axis ** 2
    inertia = ax2 * i_axial[..., None] + (1 - ax2) * i_trans[..., None]
    inertia = jnp.maximum(inertia, 1e-4)

    kp = jnp.asarray([_PD_TABLE[n][0] for n in BODY_NAMES[1:]], jnp.float32)
    kd = jnp.asarray([_PD_TABLE[n][1] for n in BODY_NAMES[1:]], jnp.float32)
    tl = jnp.asarray([_PD_TABLE[n][2] for n in BODY_NAMES[1:]], jnp.float32)
    # PD gains scale with body mass (reference humanoid.py:906-910)
    pd_scale = (mass.sum(-1) / DEFAULT_HUMANOID_MASS)[:, None]
    kp = kp[None] * pd_scale * kp_scale
    kd = kd[None] * pd_scale * kd_scale
    tl = jnp.broadcast_to(tl[None], (N, NUM_JOINTS))

    jl = jnp.asarray([_JOINT_LIMITS[n] for n in BODY_NAMES[1:]], jnp.float32)
    jl = jnp.broadcast_to(jl[None], (N, NUM_JOINTS, 3))

    # rest pelvis height = distance from pelvis pivot to the lowest capsule
    # surface point in the identity pose (exact rest-pose FK: cumulative
    # parent-chain offsets, since all joint rotations are identity)
    pivot_z = [offsets[:, 0, 2] * 0.0]
    for b in range(1, B):
        pivot_z.append(pivot_z[PARENTS[b]] + offsets[:, b, 2])
    pivot_z = jnp.stack(pivot_z, axis=-1)            # (N, 24)
    seg0_z = pivot_z + start[..., 2]
    bone_z = 2.0 * half * axis[..., 2]
    end_lo = jnp.minimum(seg0_z, seg0_z + bone_z) - radius
    height_offset = -jnp.min(end_lo, axis=-1) + 0.01

    # default mesh colliders: MESH_K spheres along the capsule axis — exactly
    # the capsule's support on flat ground (the segment's inscribed spheres),
    # denser sampling than the two end spheres on rough terrain.
    # from_smpl_npz replaces these with spheres fit to the skinned verts.
    ts = jnp.linspace(-1.0, 1.0, MESH_K)
    mesh_points = (axis[:, :, None, :]
                   * (half[:, :, None] * ts[None, None, :])[..., None])
    mesh_radius = jnp.broadcast_to(radius[:, :, None], (N, B, MESH_K))

    return BodyParams(
        local_offsets=offsets,
        capsule_radius=radius,
        capsule_half=half,
        capsule_axis=axis,
        capsule_start=start,
        mesh_points=mesh_points,
        mesh_point_radius=mesh_radius,
        mass=mass,
        inv_mass=1.0 / mass,
        inertia=inertia,
        inv_inertia=1.0 / inertia,
        kp=kp,
        kd=kd,
        torque_limit=tl,
        joint_limit=jl,
        betas=betas,
        height_offset=height_offset,
        friction_scale=jnp.ones((N,)),
    )


def to_mjcf(params: BodyParams, env_idx: int = 0,
            model_name: str = "emloco_humanoid") -> str:
    """Export one env's body parameters as a MuJoCo MJCF XML string.

    Interop counterpart of the reference's Robot.write_xml
    (smpl_local_robot.py:1235-1447): capsule geoms per body, spherical joints
    as 3 hinge-equivalent ball joints with per-axis ranges, actuator gears
    from the torque limits — so a humanoid built here can be loaded into
    MuJoCo (or compared against the reference's assets).
    """
    import xml.etree.ElementTree as ET

    i = env_idx
    off = np.asarray(params.local_offsets[i])
    start = np.asarray(params.capsule_start[i])
    axis = np.asarray(params.capsule_axis[i])
    half = np.asarray(params.capsule_half[i])
    radius = np.asarray(params.capsule_radius[i])
    lim = np.asarray(params.joint_limit[i])
    kp = np.asarray(params.kp[i])
    kd = np.asarray(params.kd[i])
    tl = np.asarray(params.torque_limit[i])

    root = ET.Element("mujoco", model=model_name)
    ET.SubElement(root, "option", timestep="0.016667", gravity="0 0 -9.81")
    worldbody = ET.SubElement(root, "worldbody")
    actuators = ET.SubElement(root, "actuator")

    nodes = {}
    h0 = float(params.height_offset[i])
    for b, name in enumerate(BODY_NAMES):
        parent_el = worldbody if PARENTS[b] < 0 else nodes[PARENTS[b]]
        pos = off[b] if b > 0 else np.array([0.0, 0.0, h0])
        body = ET.SubElement(parent_el, "body", name=name,
                             pos=" ".join(f"{v:.5f}" for v in pos))
        nodes[b] = body
        if b == 0:
            ET.SubElement(body, "freejoint", name="root")
        else:
            j = b - 1
            for ax_i, ax_v in enumerate(("1 0 0", "0 1 0", "0 0 1")):
                ET.SubElement(
                    body, "joint", name=f"{name}_{'xyz'[ax_i]}",
                    type="hinge", axis=ax_v, damping=f"{kd[j]:.3f}",
                    stiffness="0",
                    range=f"{-lim[j, ax_i]:.4f} {lim[j, ax_i]:.4f}")
                ET.SubElement(
                    actuators, "motor", name=f"{name}_{'xyz'[ax_i]}",
                    joint=f"{name}_{'xyz'[ax_i]}", gear=f"{tl[j]:.1f}")
        p0 = start[b]
        p1 = start[b] + 2 * half[b] * axis[b]
        ET.SubElement(
            body, "geom", type="capsule", size=f"{radius[b]:.5f}",
            fromto=" ".join(f"{v:.5f}" for v in np.concatenate([p0, p1])))
    ET.indent(root)
    return ET.tostring(root, encoding="unicode")


def from_smpl_npz(path: str, betas: jnp.ndarray, **kw) -> BodyParams:
    """Build BodyParams from a real SMPL model file (J_regressor/shapedirs).

    Mirrors SMPL_Parser.get_offsets (reference smpl_parser.py:370-385): joint
    rest positions from the regressor applied to the beta-shaped template,
    converted to parent-relative offsets (rotated to z-up upright).
    """
    data = np.load(path, allow_pickle=True)
    v_template = np.asarray(data["v_template"], np.float32)        # (V,3) y-up
    shapedirs = np.asarray(data["shapedirs"], np.float32)          # (V,3,K)
    j_reg = np.asarray(data["J_regressor"], np.float32)            # (24,V)
    K = min(shapedirs.shape[-1], betas.shape[-1])

    betas_np = np.asarray(betas, np.float32)
    if betas_np.ndim == 1:
        betas_np = betas_np[None]
    v = v_template[None] + np.einsum("vdk,nk->nvd", shapedirs[..., :K], betas_np[:, :K])
    joints = np.einsum("jv,nvd->njd", j_reg, v)                    # (N,24,3) y-up

    # y-up → z-up upright: (x, y, z)_smpl → (x, -z, y)? SMPL faces +z with +y
    # up; the upright MJCF robot faces +x with +z up. Map: x→x stays forward?
    # SMPL's forward is +z, so forward z→x, up y→z, left x→y.
    R = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32)
    joints = joints @ R.T

    offsets = joints.copy()
    offsets[:, 0] = 0.0
    for j in range(1, NUM_BODIES):
        offsets[:, j] = joints[:, j] - joints[:, PARENTS[j]]

    bp = build_body_params(jnp.asarray(betas_np),
                           offsets_override=jnp.asarray(offsets), **kw)

    # mesh-geom colliders from the real skinned vertex cloud (reference
    # get_joint_geometries, smpl_local_robot.py:83-146 builds per-beta vertex
    # colliders): per body, farthest-point-sample MESH_K verts (owner = argmax
    # skinning weight) and fit tangent inscribed spheres — center at γ·v in
    # the COM frame, radius (1−γ)·‖v‖, so each sphere surface passes through
    # its vert. Static shapes; sample indices chosen on env 0 and shared.
    wkey = "weights" if "weights" in data else "lbs_weights"
    if wkey in data:
        w = np.asarray(data[wkey], np.float32)                 # (V,24)
        verts = v @ R.T                                        # (N,V,3) z-up
        owner = np.argmax(w, axis=-1)                          # (V,)
        com_off = np.asarray(bp.capsule_start
                             + bp.capsule_axis * bp.capsule_half[..., None])
        com_rest = joints + com_off                            # (N,24,3)
        gamma = 0.8
        Nn = verts.shape[0]
        centers = np.zeros((Nn, NUM_BODIES, MESH_K, 3), np.float32)
        radii = np.zeros((Nn, NUM_BODIES, MESH_K), np.float32)
        for b in range(NUM_BODIES):
            sel = np.nonzero(owner == b)[0]
            if sel.size == 0:          # unskinned body: keep capsule spheres
                centers[:, b] = np.asarray(bp.mesh_points[:, b])
                radii[:, b] = np.asarray(bp.mesh_point_radius[:, b])
                continue
            loc0 = verts[0, sel] - com_rest[0, b]              # env-0 cloud
            picks = [int(np.argmax(np.linalg.norm(loc0, axis=-1)))]
            d = np.linalg.norm(loc0 - loc0[picks[0]], axis=-1)
            while len(picks) < MESH_K:
                picks.append(int(np.argmax(d)))
                d = np.minimum(
                    d, np.linalg.norm(loc0 - loc0[picks[-1]], axis=-1))
            vloc = verts[:, sel[picks]] - com_rest[:, b:b + 1]  # (N,K,3)
            centers[:, b] = gamma * vloc
            radii[:, b] = (1.0 - gamma) * np.linalg.norm(vloc, axis=-1)
        bp = bp.replace(mesh_points=jnp.asarray(centers),
                        mesh_point_radius=jnp.asarray(radii))
    return bp
