import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.kinematics import SkeletonTree, forward_kinematics, local_from_global
from emloco_tpu.kinematics import body_model
from emloco_tpu.ops import quat

KEY = jax.random.PRNGKey(1)


def _rand_local_rot(key, shape):
    q = jax.random.normal(key, shape + (4,))
    return quat.normalize(q)


def test_canonical_skeleton_shape():
    tree = body_model.canonical_skeleton()
    assert tree.num_joints == 24
    assert tree.parents[0] == -1
    # left/right symmetry of offsets (y-axis mirror)
    lt = tree.local_translation
    li = tree.index("L_Hip")
    ri = tree.index("R_Hip")
    np.testing.assert_allclose(lt[li] * np.array([1, -1, 1]), lt[ri], atol=1e-6)


def test_fk_rest_pose_heights():
    """In the rest pose the head must be highest and ankles near the bottom."""
    tree = body_model.canonical_skeleton()
    J = tree.num_joints
    local_rot = quat.identity_like((1, J))
    root_pos = jnp.array([[0.0, 0.0, 0.93]])
    grot, gpos = forward_kinematics(tree, local_rot, root_pos)
    names = list(tree.names)
    z = np.asarray(gpos[0, :, 2])
    assert z[names.index("Head")] == z.max()
    assert z[names.index("L_Ankle")] < 0.15
    assert abs(z[names.index("L_Ankle")] - z[names.index("R_Ankle")]) < 1e-6
    # identity rotations propagate
    np.testing.assert_allclose(grot[0], quat.identity_like((J,)), atol=1e-6)


def test_fk_local_roundtrip():
    tree = body_model.canonical_skeleton()
    J = tree.num_joints
    local_rot = _rand_local_rot(KEY, (4, J))
    root_pos = jnp.zeros((4, 3))
    grot, _ = forward_kinematics(tree, local_rot, root_pos)
    rec = local_from_global(tree, grot)
    dots = jnp.abs(jnp.sum(rec * local_rot, axis=-1))
    np.testing.assert_allclose(dots, jnp.ones((4, J)), atol=1e-5)


def test_fk_root_rotation_moves_children():
    tree = body_model.canonical_skeleton()
    J = tree.num_joints
    local_rot = quat.identity_like((1, J))
    yaw = jnp.array([np.pi / 2])
    rootq = quat.from_angle_axis(yaw, jnp.array([[0.0, 0.0, 1.0]]))
    local_rot = local_rot.at[:, 0].set(rootq)
    _, gpos = forward_kinematics(tree, local_rot, jnp.zeros((1, 3)))
    # L_Hip offset (0, +y, -z) rotates to (-y→x?) yaw +90°: (x,y)→(-y,x)
    lh = tree.local_translation[tree.index("L_Hip")]
    expect = np.array([-lh[1], lh[0], lh[2]])
    np.testing.assert_allclose(gpos[0, tree.index("L_Hip")], expect, atol=1e-5)


def test_fk_jit_vmap_consistency():
    tree = body_model.canonical_skeleton()
    J = tree.num_joints
    local_rot = _rand_local_rot(KEY, (8, J))
    root_pos = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    f = lambda lr, rp: forward_kinematics(tree, lr, rp)
    r1, p1 = jax.jit(f)(local_rot, root_pos)
    r2, p2 = jax.vmap(lambda lr, rp: forward_kinematics(tree, lr, rp))(
        local_rot, root_pos
    )
    np.testing.assert_allclose(p1, p2, atol=1e-5)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_body_params_batched():
    betas = jax.random.normal(KEY, (16, 16))
    bp = body_model.build_body_params(betas)
    assert bp.local_offsets.shape == (16, 24, 3)
    assert bp.mass.shape == (16, 24)
    assert bp.kp.shape == (16, 23)
    assert np.all(np.asarray(bp.mass) > 0)
    assert np.all(np.asarray(bp.capsule_half) > 0)
    assert np.all(np.isfinite(np.asarray(bp.inv_inertia)))
    # zero betas → default mass ~77 kg
    bp0 = body_model.build_body_params(jnp.zeros((1, 16)))
    np.testing.assert_allclose(
        np.asarray(bp0.mass.sum()), body_model.DEFAULT_HUMANOID_MASS, rtol=1e-3
    )


def test_body_params_beta_scaling():
    """beta[0] grows everything; taller humanoid → larger height offset."""
    bp_small = body_model.build_body_params(jnp.array([[-2.0] + [0.0] * 15]))
    bp_big = body_model.build_body_params(jnp.array([[2.0] + [0.0] * 15]))
    assert float(bp_big.height_offset[0]) > float(bp_small.height_offset[0])
    assert float(bp_big.mass.sum()) > float(bp_small.mass.sum())


def test_body_params_jit():
    f = jax.jit(body_model.build_body_params)
    bp = f(jnp.zeros((2, 16)))
    assert bp.local_offsets.shape == (2, 24, 3)


def test_mjcf_export():
    bp = body_model.build_body_params(jnp.zeros((1, 16)))
    xml = body_model.to_mjcf(bp)
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml)
    assert root.tag == "mujoco"
    bodies = root.findall(".//body")
    assert len(bodies) == 24
    joints = root.findall(".//joint")
    assert len(joints) == 69  # 23 spherical joints × 3 hinges
    motors = root.findall(".//motor")
    assert len(motors) == 69


def test_retarget_identity():
    """Retargeting a motion onto the same skeleton reproduces it."""
    from emloco_tpu.kinematics import motion_lib as ml
    from emloco_tpu.kinematics.retarget import retarget_motion
    from emloco_tpu.ops import quat as quat_ops

    tree = body_model.canonical_skeleton()
    lib = ml.synthetic_walk_motions(tree=tree, speeds=(1.0,), duration=1.0)
    ids = jnp.zeros((5,), jnp.int32)
    times = jnp.linspace(0.0, 0.9, 5)
    ms = ml.get_motion_state(lib, ids, times)
    jmap = {n: n for n in tree.names}
    out_rot, out_pos = retarget_motion(tree, tree, jmap,
                                       ms["local_rot"], ms["root_pos"])
    dots = jnp.abs(jnp.sum(quat_ops.normalize(out_rot)
                           * ms["local_rot"], axis=-1))
    np.testing.assert_allclose(np.asarray(dots), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_pos), np.asarray(ms["root_pos"]),
                               atol=1e-4)


def test_visualization_smoke(tmp_path):
    from emloco_tpu.kinematics.skeleton import forward_kinematics
    from emloco_tpu.kinematics.visualization import (animate_rollout,
                                                     plot_heightmap)
    from emloco_tpu.ops import quat as quat_ops

    tree = body_model.canonical_skeleton()
    lr = quat_ops.identity_like((3, 24))
    _, pos = forward_kinematics(tree, lr, jnp.tile(jnp.array([[0., 0., 0.9]]),
                                                   (3, 1)))
    p = animate_rollout(np.asarray(pos), str(tmp_path / "r.gif"),
                        rewards=np.zeros(3), fps=2)
    import os
    assert os.path.exists(p)
    hp = plot_heightmap(np.random.rand(16, 16), str(tmp_path / "h.png"))
    assert os.path.exists(hp)


def test_smpl_lbs_synthetic():
    """LBS with a synthetic SMPL model: rest pose reproduces the template."""
    from emloco_tpu.kinematics.smpl import SMPLModel, get_joints_verts

    rng = np.random.RandomState(0)
    V = 64
    tree = body_model.canonical_skeleton()
    # synthetic template: vertices scattered around rest-pose joints
    lr = quat.identity_like((1, 24))
    _, gpos = forward_kinematics(tree, lr, jnp.zeros((1, 3)))
    gpos = np.asarray(gpos[0])
    owner = rng.randint(0, 24, V)
    v_template = gpos[owner] + rng.randn(V, 3).astype(np.float32) * 0.05
    w = np.zeros((V, 24), np.float32)
    w[np.arange(V), owner] = 1.0
    jreg = np.zeros((24, V), np.float32)
    for j in range(24):
        idx = np.where(owner == j)[0]
        if len(idx):
            jreg[j, idx] = 1.0 / len(idx)
    model = SMPLModel(v_template=v_template,
                      shapedirs=np.zeros((V, 3, 16), np.float32),
                      posedirs=None, j_regressor=jreg, lbs_weights=w,
                      parents=body_model.PARENTS)
    pose0 = jnp.zeros((2, 72))
    verts, joints = get_joints_verts(model, pose0, jnp.zeros((2, 16)))
    assert verts.shape == (2, V, 3) and joints.shape == (2, 24, 3)
    # skinned rest pose must land near the template (regressor joints differ
    # slightly from FK joints; loose tolerance)
    err = np.abs(np.asarray(verts[0]) - v_template).max()
    assert err < 0.2, err
    # posing the body moves vertices
    pose1 = jnp.zeros((2, 72)).at[:, 3:6].set(0.7)
    verts1, _ = get_joints_verts(model, pose1, jnp.zeros((2, 16)))
    assert not np.allclose(np.asarray(verts1), np.asarray(verts), atol=1e-3)


def test_capsule_surface_points():
    from emloco_tpu.kinematics.smpl import capsule_surface

    bp = body_model.build_body_params(jnp.zeros((2, 16)))
    pos = jnp.zeros((2, 24, 3))
    rot = quat.identity_like((2, 24))
    pts = capsule_surface(bp, pos, rot)
    assert pts.shape == (2, 24 * 8, 3)
    assert np.all(np.isfinite(np.asarray(pts)))


def test_smpl_lbs_against_numpy_oracle():
    """Real-weights SMPL path (reference SMPL_Parser.get_joints_verts,
    smpl_parser.py:343-368): load the committed SMPL-format npz fixture and
    pin get_joints_verts against an independent straight-numpy LBS."""
    import os
    import jax
    import jax.numpy as jnp
    from emloco_tpu.kinematics import body_model as bm
    from emloco_tpu.kinematics.smpl import SMPLModel, get_joints_verts

    path = os.path.join(os.path.dirname(__file__), "data",
                        "smpl_fixture.npz")
    model = SMPLModel.load_npz(path)
    assert model.posedirs is not None
    rng = np.random.RandomState(0)
    Bq = 3
    betas = rng.randn(Bq, 10).astype(np.float32) * 0.5
    pose = rng.randn(Bq, 72).astype(np.float32) * 0.3
    trans = rng.randn(Bq, 3).astype(np.float32)

    verts, joints = get_joints_verts(model, jnp.asarray(pose),
                                     jnp.asarray(betas), jnp.asarray(trans))

    # ---- independent numpy oracle ----
    def rodrigues(aa):                       # (J,3) -> (J,3,3)
        th = np.linalg.norm(aa, axis=-1, keepdims=True)
        k = aa / np.maximum(th, 1e-9)
        K = np.zeros(aa.shape[:-1] + (3, 3))
        K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
        K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
        K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
        th = th[..., None]
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

    for b in range(Bq):
        v = model.v_template + model.shapedirs @ betas[b]
        j_rest = model.j_regressor @ v
        Rm = rodrigues(pose[b].reshape(24, 3))
        v = v + (model.posedirs @ (Rm[1:] - np.eye(3)).ravel())
        G_rot = np.zeros((24, 3, 3))
        G_pos = np.zeros((24, 3))
        G_rot[0], G_pos[0] = Rm[0], j_rest[0]
        for j in range(1, 24):
            p = bm.PARENTS[j]
            G_rot[j] = G_rot[p] @ Rm[j]
            G_pos[j] = G_pos[p] + G_rot[p] @ (j_rest[j] - j_rest[p])
        posed = np.einsum("jde,jve->jvd", G_rot, v[None] - j_rest[:, None]) \
            + G_pos[:, None]
        v_out = np.einsum("vj,jvd->vd", model.lbs_weights, posed) + trans[b]
        np.testing.assert_allclose(np.asarray(verts[b]), v_out, atol=2e-4)
        np.testing.assert_allclose(np.asarray(joints[b]),
                                   G_pos + trans[b], atol=2e-4)


def test_from_smpl_npz_builds_consistent_asset():
    """from_smpl_npz -> BodyParams: regressed joints become parent-relative
    offsets and every derived quantity (capsules, rest height) follows them;
    the asset runs in the engine (short standing sim stays upright)."""
    import os
    import jax.numpy as jnp
    from emloco_tpu.kinematics import body_model as bm
    from emloco_tpu.kinematics.smpl import SMPLModel
    from emloco_tpu.ops import quat
    from emloco_tpu.physics import (EngineConfig, build_model, default_tree,
                                    flat_terrain, kinematic_state, step)

    path = os.path.join(os.path.dirname(__file__), "data",
                        "smpl_fixture.npz")
    betas = jnp.zeros((2, 10))
    params = bm.from_smpl_npz(path, betas)

    # offsets reproduce the regressor's rest joints (z-up, pelvis-relative)
    model = SMPLModel.load_npz(path)
    v = model.v_template  # betas are zero
    joints_y = model.j_regressor @ v
    R = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32)
    joints_z = joints_y @ R.T
    chain = np.zeros((24, 3), np.float32)
    for j in range(1, 24):
        chain[j] = chain[bm.PARENTS[j]] + np.asarray(params.local_offsets)[0, j]
    np.testing.assert_allclose(chain, joints_z - joints_z[0], atol=1e-5)

    # capsule geometry follows the overridden skeleton: scaling the offsets
    # scales the derived bone capsules (the fixture itself is template-
    # derived, so its capsules legitimately match the template's)
    big = bm.build_body_params(
        betas, offsets_override=1.25 * params.local_offsets)
    knee = bm.BODY_NAMES.index("L_Knee")
    ratio = float(big.capsule_half[0, knee] / params.capsule_half[0, knee])
    assert abs(ratio - 1.25) < 0.01
    assert float(params.height_offset[0]) > 0.3

    # and the engine stands on it
    eng = build_model(params)
    terrain = flat_terrain(extent=10.0, cell=0.1)
    tree = default_tree()
    z = params.height_offset[:, None] * jnp.ones((2, 1))
    root_pos = jnp.concatenate([jnp.zeros((2, 2)), z], -1)
    st = kinematic_state(eng, tree, root_pos, quat.identity_like((2,)),
                         quat.identity_like((2, 24)))
    cfg = EngineConfig(n_substeps=2)
    for _ in range(30):
        st = step(eng, terrain, st, jnp.zeros((2, 23, 3)), cfg, tree)
    assert np.isfinite(np.asarray(st.body_x)).all()
    assert np.asarray(st.root_pos[:, 2]).min() > 0.4   # still upright (1 s)
