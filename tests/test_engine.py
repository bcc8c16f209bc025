import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.kinematics import body_model as bm
from emloco_tpu.ops import quat
from emloco_tpu.physics import (
    EngineConfig,
    body_frame_state,
    build_model,
    default_tree,
    flat_terrain,
    joint_state,
    kinematic_state,
    step,
)

TREE = default_tree()
CFG = EngineConfig(n_substeps=4)


def make_world(n_envs=2, betas=None):
    if betas is None:
        betas = jnp.zeros((n_envs, 16))
    params = bm.build_body_params(betas)
    model = build_model(params)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    return model, terrain


def rest_state(model, z=None):
    n = model.num_envs
    if z is None:
        z = model.params.height_offset[:, None] * jnp.ones((n, 1))
    root_pos = jnp.concatenate([jnp.zeros((n, 2)), jnp.reshape(z, (n, 1))], -1)
    root_rot = quat.identity_like((n,))
    local_rot = quat.identity_like((n, bm.NUM_BODIES))
    return kinematic_state(model, TREE, root_pos, root_rot, local_rot)


def test_kinematic_state_velocities():
    model, _ = make_world(1)
    root_vel = jnp.array([[1.0, 0.5, 0.0]])
    st = kinematic_state(
        model, TREE,
        jnp.array([[0.0, 0.0, 1.0]]),
        quat.identity_like((1,)),
        quat.identity_like((1, bm.NUM_BODIES)),
        root_vel=root_vel,
    )
    np.testing.assert_allclose(
        st.body_v, jnp.broadcast_to(root_vel[:, None], st.body_v.shape),
        atol=1e-5)


def test_freefall_com():
    """With no ground (start high), COM follows projectile motion."""
    model, terrain = make_world(1)
    st = rest_state(model, z=jnp.array([[5.0]]))
    m = model.params.mass[0][:, None]
    com0 = (st.body_x[0] * m).sum(0) / m.sum()
    T = 6
    for _ in range(T):
        st = step(model, terrain, st, jnp.zeros((1, 23, 3)), CFG)
    com1 = (np.asarray(st.body_x[0]) * np.asarray(m)).sum(0) / float(m.sum())
    t = T * CFG.control_dt
    expected_drop = 0.5 * 9.81 * t**2
    drop = float(com0[2] - com1[2])
    assert abs(drop - expected_drop) / expected_drop < 0.1
    assert abs(float(com1[0] - com0[0])) < 1e-3


def test_standing_stability():
    """PD holding the rest pose keeps the humanoid upright ≥1.5 s with the
    pose essentially unperturbed (joints are exact in reduced coords)."""
    model, terrain = make_world(1)
    st = rest_state(model)
    head = TREE.index("Head")
    z0 = float(st.body_x[0, head, 2])
    for _ in range(45):  # 1.5 s
        st = step(model, terrain, st, jnp.zeros((1, 23, 3)), CFG)
    assert np.all(np.isfinite(np.asarray(st.body_x)))
    z1 = float(st.body_x[0, head, 2])
    assert z1 > 0.9 * z0, f"head dropped from {z0:.2f} to {z1:.2f}"
    dof_pos, _ = joint_state(model, st)
    assert float(jnp.abs(dof_pos).max()) < 0.2, "pose not held"


def test_weight_on_ground():
    """Total normal contact force equals body weight once settled."""
    model, terrain = make_world(1)
    st = rest_state(model)
    for _ in range(20):
        st = step(model, terrain, st, jnp.zeros((1, 23, 3)), CFG)
    total_fz = float(st.contact_force[0, :, 2].sum())
    weight = float(model.params.mass[0].sum() * 9.81)
    assert abs(total_fz - weight) / weight < 0.1, (total_fz, weight)


def test_pd_tracks_target():
    """An elbow exp-map target is reached accurately (exact-stiffness SPD)."""
    model, terrain = make_world(1)
    st = rest_state(model, z=jnp.array([[5.0]]))  # in the air
    target = jnp.zeros((1, 23, 3))
    jidx = TREE.index("L_Elbow") - 1
    target = target.at[0, jidx, 1].set(0.8)
    for _ in range(15):
        st = step(model, terrain, st, target, CFG)
    dof_pos, _ = joint_state(model, st)
    got = float(dof_pos[0, jidx, 1])
    assert abs(got - 0.8) < 0.1, f"elbow angle {got:.3f} vs target 0.8"


def test_gravity_sag_matches_kp():
    """Static sag under gravity ≈ τ_gravity / kp (PD stiffness is exact)."""
    model, terrain = make_world(1)
    st = rest_state(model, z=jnp.array([[50.0]]))
    for _ in range(20):
        st = step(model, terrain, st, jnp.zeros((1, 23, 3)), CFG)
    dof_pos, _ = joint_state(model, st)
    sh = TREE.index("L_Shoulder") - 1
    sag = float(jnp.linalg.norm(dof_pos[0, sh]))
    # arm gravity torque about shoulder ~11 N·m, kp=400 → θ ≈ 0.028
    assert sag < 0.1, f"shoulder sag {sag:.3f} too large (drive too soft)"


def test_joint_limits_enforced():
    """Targets far beyond the limit cannot push the joint past it."""
    model, terrain = make_world(1)
    st = rest_state(model, z=jnp.array([[5.0]]))
    target = jnp.zeros((1, 23, 3))
    jidx = TREE.index("Head") - 1  # Head limits ±π/2
    target = target.at[0, jidx, 0].set(3.0)
    for _ in range(20):
        st = step(model, terrain, st, target, CFG)
    dof_pos, _ = joint_state(model, st)
    assert float(dof_pos[0, jidx, 0]) < np.pi / 2 + 0.05


def test_no_ground_penetration():
    model, terrain = make_world(1)
    st = rest_state(model)
    for _ in range(30):
        st = step(model, terrain, st, jnp.zeros((1, 23, 3)), CFG)
    low = (np.asarray(st.body_x[0, :, 2])
           - np.asarray(model.params.capsule_radius[0]))
    assert low.min() > -0.05, f"body sunk to {low.min():.3f}"


def test_vmap_over_envs_heterogeneous():
    """Different betas per env run in one batch; shapes stay static."""
    betas = jnp.array([[0.0] * 16, [1.5] + [0.0] * 15, [-1.5] + [0.0] * 15])
    model, terrain = make_world(3, betas)
    st = rest_state(model)
    for _ in range(10):
        st = step(model, terrain, st, jnp.zeros((3, 23, 3)), CFG)
    assert np.all(np.isfinite(np.asarray(st.body_x)))


def test_body_frame_state_shapes():
    model, terrain = make_world(2)
    st = rest_state(model)
    pos, rot, vel, ang = body_frame_state(model, st)
    assert pos.shape == (2, 24, 3) and rot.shape == (2, 24, 4)
    np.testing.assert_allclose(
        np.asarray(pos[:, 0, 2]), np.asarray(model.params.height_offset),
        atol=1e-4)


def test_scan_rollout():
    """The whole rollout compiles into one lax.scan (no host round-trips)."""
    model, terrain = make_world(2)
    st = rest_state(model)

    def rollout(st):
        def body(s, _):
            s = step(model, terrain, s, jnp.zeros((2, 23, 3)), CFG)
            return s, s.body_x[:, 0, 2]
        return jax.lax.scan(body, st, None, length=10)

    final, heights = jax.jit(rollout)(st)
    assert heights.shape == (10, 2)
    assert np.all(np.isfinite(np.asarray(heights)))


def test_pallas_cholesky_solve_interpret():
    """SoA Pallas Cholesky solve matches XLA (interpret mode on CPU)."""
    from emloco_tpu.physics.pallas_linalg import cholesky_solve_soa

    key = jax.random.PRNGKey(3)
    N, M = 130, 75  # deliberately not a multiple of 128 (padding path)
    X = jax.random.normal(key, (N, M, M))
    A = jnp.einsum("nij,nkj->nik", X, X) + 10 * jnp.eye(M)
    b = jax.random.normal(key, (N, M))
    x = cholesky_solve_soa(A, b, interpret=True)
    x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)


def test_violent_impacts_stay_finite():
    """Energy robustness at stiff contact (regression: a long training run
    diverged to NaN at 240 kN/m before the depenetration clamp): drop from
    3 m and a 10 m/s horizontal launch must settle to finite, bounded state
    (PhysX maxDepenetrationVelocity analog, EngineConfig.max_depenetration)."""
    import jax.numpy as jnp
    from emloco_tpu.physics import (EngineConfig, build_model, default_tree,
                                    flat_terrain, kinematic_state, step)
    from emloco_tpu.ops import quat as Q

    n = 4
    tree = default_tree()
    model = build_model(bm.build_body_params(jnp.zeros((n, 16))))
    terrain = flat_terrain(extent=40.0, cell=0.1)
    st = kinematic_state(
        model, tree,
        root_pos=jnp.tile(jnp.array([0.0, 0.0, 3.0]), (n, 1)),
        root_rot=Q.identity_like((n,)),
        local_rot=Q.identity_like((n, 24)),
        root_vel=jnp.tile(jnp.array([10.0, 0.0, -3.0]), (n, 1)),
        root_ang_vel=jnp.tile(jnp.array([0.0, 6.0, 0.0]), (n, 1)),
    )
    cfg = EngineConfig()
    tgt = jnp.zeros((n, 23, 3))
    for t in range(240):                       # 8 s — through impact + rest
        st = step(model, terrain, st, tgt, cfg, tree)
    assert bool(jnp.isfinite(st.u).all())
    assert bool(jnp.isfinite(st.body_x).all())
    assert float(jnp.abs(st.u).max()) < 50.0   # settled, not ringing
    assert float(st.body_x[..., 2].min()) > -0.5


def test_blocked_cholesky_matches_dense():
    """Block-arrow (supernodal) solver: the assembled LHS is exactly zero
    outside the tree's branch-induced sparsity pattern, and the blocked
    factorization solves it to machine precision (pallas interpret mode)."""
    import numpy as np
    from emloco_tpu.physics import reduced as R
    from emloco_tpu.physics.pallas_linalg import cholesky_solve_blocked_t

    chunks, limbs, s_lo = R._ARROW_CHUNKS, R._ARROW_LIMBS, R._ARROW_S
    M = 75
    # chunks are a permutation partition of 0..M
    cover = np.concatenate([np.arange(lo, hi) for lo, hi in chunks])
    assert sorted(cover.tolist()) == list(range(M))

    mask_new = np.zeros((M, M), bool)
    for lo, hi in limbs:
        mask_new[lo:hi, lo:hi] = True
        mask_new[s_lo:, lo:hi] = True
        mask_new[lo:hi, s_lo:] = True
    mask_new[s_lo:, s_lo:] = True
    perm = cover

    rng = np.random.RandomState(0)
    N = 8
    A_old = np.zeros((M, M, N), np.float32)
    for n in range(N):
        L = np.tril(rng.randn(M, M)).astype(np.float32) * mask_new
        An = L @ L.T + 5 * np.eye(M, dtype=np.float32)
        A_old[perm[:, None], perm[None, :], n] = An
    b = rng.randn(M, N).astype(np.float32)
    x = cholesky_solve_blocked_t(jnp.asarray(A_old), jnp.asarray(b),
                                 chunks, limbs, s_lo, interpret=True)
    x_ref = np.stack([np.linalg.solve(A_old[:, :, n], b[:, n])
                      for n in range(N)], -1)
    err = np.abs(np.asarray(x) - x_ref).max() / np.abs(x_ref).max()
    assert err < 1e-4


def test_assembled_lhs_has_arrow_pattern():
    """The implicit-substep LHS respects the block-arrow sparsity the
    blocked solver assumes (limbs couple only through trunk+root)."""
    import numpy as np
    from emloco_tpu.physics import reduced as R
    from emloco_tpu.ops import quat as Q

    model, terrain = make_world(4)
    st = rest_state(model)
    captured = {}
    orig = R._assemble_lhs_rhs
    def spy(*a, **k):
        out = orig(*a, **k)
        captured["At"] = out[0]
        return out
    R._assemble_lhs_rhs = spy
    try:
        with jax.disable_jit():
            R._implicit_substep(model, terrain, st,
                                Q.exp_map_to_quat(jnp.zeros((4, 23, 3))),
                                EngineConfig(), TREE)
    finally:
        R._assemble_lhs_rhs = orig
    chunks, limbs, s_lo = R._ARROW_CHUNKS, R._ARROW_LIMBS, R._ARROW_S
    perm = np.concatenate([np.arange(lo, hi) for lo, hi in chunks])
    mask_new = np.zeros((75, 75), bool)
    for lo, hi in limbs:
        mask_new[lo:hi, lo:hi] = True
        mask_new[s_lo:, lo:hi] = True
        mask_new[lo:hi, s_lo:] = True
    mask_new[s_lo:, s_lo:] = True
    An = np.asarray(captured["At"])[perm[:, None], perm[None, :], :]
    scale = np.abs(An).max()
    assert np.abs(An[~mask_new]).max() <= 1e-5 * scale


def test_tgs_step_matches_full_substeps():
    """The step-frozen (TGS-style) path stays close to fully re-assembled
    substeps over a short PD-driven rollout — the frozen Jacobians lag true
    geometry by at most one substep, so trajectories diverge only slowly."""
    from emloco_tpu.physics import step as phys_step

    model, terrain = make_world(2)
    st0 = rest_state(model)
    target = jnp.zeros((2, 23, 3)).at[:, 0, 0].set(0.3).at[:, 4, 0].set(-0.4)
    cfg_tgs = EngineConfig(n_substeps=2, tgs_step=True)
    cfg_full = EngineConfig(n_substeps=2, tgs_step=False)
    s_t, s_f = st0, st0
    for _ in range(30):
        s_t = phys_step(model, terrain, s_t, target, cfg_tgs, TREE)
        s_f = phys_step(model, terrain, s_f, target, cfg_full, TREE)
    # both finite, same qualitative pose (1 s of sim)
    assert np.isfinite(np.asarray(s_t.body_x)).all()
    dx = np.abs(np.asarray(s_t.body_x - s_f.body_x)).max()
    assert dx < 0.05, f"TGS diverged from full substeps by {dx:.3f} m"
    # still standing in both
    assert np.asarray(s_t.root_pos[:, 2]).min() > 0.5


def test_self_contact_rest_clearance_and_pushout():
    """Intra-humanoid capsule-capsule contact (reference capability: PhysX
    self-collision via asset options, humanoid.py:643-835). Contract:
    (1) the rest pose has clearance on every configured pair (no phantom
    forces while walking); (2) with the flag on, an arm PD-held inside the
    torso is pushed out with an equal-and-opposite force pair; with the
    flag off it interpenetrates freely (the round-1 regression)."""
    from emloco_tpu.physics import reduced as R
    from emloco_tpu.physics import step as phys_step

    model, terrain = make_world(2)
    st = rest_state(model)
    _, _, _, pen = R._self_contact_geometry(model, st.body_x, st.body_q)
    assert np.asarray(pen).max() < -0.02   # ≥2 cm clearance at rest

    # fold the left forearm into the torso (found by search: shoulder
    # exp-map (-2.2,0,0) + elbow (0,1.2,0) -> L_Elbow/Torso overlap 0.14 m)
    names = bm.BODY_NAMES
    j_sh, j_el = names.index("L_Shoulder") - 1, names.index("L_Elbow") - 1
    target = jnp.zeros((2, 23, 3))
    target = target.at[:, j_sh, 0].set(-2.2).at[:, j_el, 1].set(1.2)
    loc = quat.identity_like((2, bm.NUM_BODIES))
    loc = loc.at[:, names.index("L_Shoulder")].set(
        quat.exp_map_to_quat(target[:, j_sh]))
    loc = loc.at[:, names.index("L_Elbow")].set(
        quat.exp_map_to_quat(target[:, j_el]))
    st0 = kinematic_state(model, TREE, jnp.asarray([[0., 0., 1.], [0., 0., 1.]]),
                          quat.identity_like((2,)), loc)
    _, _, _, pen0 = R._self_contact_geometry(model, st0.body_x, st0.body_q)
    k = int(np.asarray(pen0)[0].argmax())
    assert np.asarray(pen0)[:, k].min() > 0.08   # genuinely interpenetrated

    for tgs in (False, True):
        cfg_on = EngineConfig(n_substeps=2, self_contact=True, tgs_step=tgs)
        cfg_off = EngineConfig(n_substeps=2, self_contact=False, tgs_step=tgs)
        s_on, s_off = st0, st0
        for _ in range(20):
            s_on = phys_step(model, terrain, s_on, target, cfg_on, TREE)
            s_off = phys_step(model, terrain, s_off, target, cfg_off, TREE)
        assert np.isfinite(np.asarray(s_on.body_x)).all()
        _, _, _, p_on = R._self_contact_geometry(model, s_on.body_x,
                                                 s_on.body_q)
        _, _, _, p_off = R._self_contact_geometry(model, s_off.body_x,
                                                  s_off.body_q)
        # contact resolves most of the overlap; without it the PD target
        # keeps the arm buried
        assert np.asarray(p_on)[:, k].max() < 0.03, (tgs, np.asarray(p_on)[:, k])
        assert np.asarray(p_off)[:, k].min() > 0.08, (tgs, np.asarray(p_off)[:, k])

    # reported forces: push-out on the arm, reaction into the trunk
    cfg_on = EngineConfig(n_substeps=2, self_contact=True)
    s1 = phys_step(model, terrain, st0, target, cfg_on, TREE)
    f = np.asarray(s1.contact_force)
    bA, bB = R._SELF_A[k], R._SELF_B[k]
    assert np.abs(f[:, bA]).max() > 1.0         # arm body feels the pair force
    # ground-only bodies unaffected by the flag at rest distances
    s_rest = phys_step(model, terrain, rest_state(model),
                       jnp.zeros((2, 23, 3)), cfg_on, TREE)
    s_rest_off = phys_step(model, terrain, rest_state(model),
                           jnp.zeros((2, 23, 3)),
                           EngineConfig(n_substeps=2), TREE)
    np.testing.assert_allclose(np.asarray(s_rest.body_x),
                               np.asarray(s_rest_off.body_x), atol=1e-5)


def test_mesh_contact_variant():
    """Mesh-geom ground contact (reference capability: per-beta mesh
    colliders, smpl_local_robot.py:83-146 get_joint_geometries). Contract:
    (1) with the default capsule-derived collision spheres, the standing
    humanoid carries its weight and holds pose like the capsule table;
    (2) mesh rows attribute force to the same bodies (feet); (3) the TGS
    path runs the variant too."""
    model, terrain = make_world(1)
    st0 = rest_state(model)
    weight = float(model.params.mass[0].sum() * 9.81)

    for tgs in (False, True):
        cfg = EngineConfig(n_substeps=4, mesh_contacts=True, tgs_step=tgs)
        st = st0
        for _ in range(20):
            st = step(model, terrain, st, jnp.zeros((1, 23, 3)), cfg)
        total_fz = float(st.contact_force[0, :, 2].sum())
        assert abs(total_fz - weight) / weight < 0.1, (tgs, total_fz, weight)
        # force lands on the feet, not the trunk, at rest
        feet = [bm.BODY_NAMES.index(n)
                for n in ("L_Ankle", "R_Ankle", "L_Toe", "R_Toe")]
        fz = np.asarray(st.contact_force[0, :, 2])
        assert fz[feet].sum() > 0.9 * total_fz, fz
        # still standing, joints near rest
        assert float(st.root_pos[0, 2]) > 0.5 * float(
            model.params.height_offset[0])


def test_mesh_points_from_smpl_fixture():
    """from_smpl_npz fits per-beta collision spheres to the skinned verts:
    static (N, 24, MESH_K) shapes, every sphere inside ~the body's capsule
    ball, and the sphere surfaces touch their generating verts (tangent
    construction)."""
    import os

    from emloco_tpu.kinematics.body_model import from_smpl_npz

    path = os.path.join(os.path.dirname(__file__), "data", "smpl_fixture.npz")
    betas = jnp.zeros((2, 10)).at[1, 0].set(1.0)
    bp = from_smpl_npz(path, betas)
    assert bp.mesh_points.shape == (2, bm.NUM_BODIES, bm.MESH_K, 3)
    assert bp.mesh_point_radius.shape == (2, bm.NUM_BODIES, bm.MESH_K)
    r = np.asarray(bp.mesh_point_radius)
    assert (r >= 0.0).all() and r.max() < 0.3, (r.min(), r.max())
    # center + radius reaches the generating vert: ‖c‖ + r = ‖v‖ by
    # construction (γ-shrink tangent spheres), so the farthest support
    # distance stays within the vert cloud's extent
    c = np.linalg.norm(np.asarray(bp.mesh_points), axis=-1)
    assert (c + r < 1.2).all()
    # the mesh variant runs end-to-end with real-weights params
    model = build_model(bp)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    st = rest_state(model)
    cfg = EngineConfig(n_substeps=2, mesh_contacts=True)
    for _ in range(5):
        st = step(model, terrain, st, jnp.zeros((2, 23, 3)), cfg)
    assert np.isfinite(np.asarray(st.body_x)).all()


def test_actuator_torque_saturation():
    """Drive torques saturate at the GAINS torque limits (reference
    skeleton_mesh_local.py:14-38 column 4 / PhysX drive maxForce). A target
    error of ~pi at kp up to 1000 would otherwise command multi-kNm torques;
    the saturated step must accelerate joints strictly less than an
    unsaturated one with the limits lifted."""
    model, terrain = make_world(2)
    st = rest_state(model)
    # extreme target: every joint driven hard toward a far pose
    tgt = jnp.full((2, bm.NUM_JOINTS, 3), 2.5)
    st1 = step(model, terrain, st, tgt, CFG, TREE)
    _, dof_vel_capped = joint_state(model, st1)

    uncapped = model.replace(params=model.params.replace(
        torque_limit=jnp.full_like(model.params.torque_limit, 1e9)))
    st2 = step(uncapped, terrain, st, tgt, CFG, TREE)
    _, dof_vel_free = joint_state(uncapped, st2)

    v_cap = float(jnp.abs(dof_vel_capped).max())
    v_free = float(jnp.abs(dof_vel_free).max())
    assert np.isfinite(v_cap) and np.isfinite(v_free)
    assert v_cap < v_free * 0.75, (v_cap, v_free)


def test_point_velocities_match_contact_jacobian():
    """The body-velocity-cache substitution v_pt = v_b + w_b x (pt - x_b)
    must equal J_pt(x)*u exactly at the cache's pose — the round-3
    bandwidth optimization rests on this identity (see _point_velocities;
    never reintroduce per-substep Jc*u einsums)."""
    from emloco_tpu.physics import reduced as R

    model, terrain = make_world(3)
    key = jax.random.PRNGKey(7)
    st = rest_state(model)
    # random non-trivial generalized velocities
    u = 0.5 * jax.random.normal(key, st.u.shape)
    st = st.replace(u=u)
    st = R.refresh_cache(model, st, TREE)

    x, q = st.body_x, st.body_q
    piv_j = x[:, 1:] + quat.rotate(q[:, 1:], model.anchor_c[:, 1:])
    pivots_x = jnp.concatenate([x[:, 0:1], piv_j], axis=1)
    _, _, term2 = R._build_jacobians(model, x, q, pivots_x)

    pts, _, ground_body = R._ground_geometry(model, x, q, EngineConfig())
    Jc = R._point_jacobians(pts, ground_body, term2)
    vpt_jac = jnp.einsum("ncij,nj->nci", Jc, st.u)
    vpt_cache = R._point_velocities(x, st.body_v, st.body_w, pts,
                                    ground_body)
    np.testing.assert_allclose(np.asarray(vpt_cache), np.asarray(vpt_jac),
                               atol=1e-4)

    # self-contact pair rows: the fused one-dot difference Jacobian agrees
    # with the two-build subtraction, and pair velocities agree with Jrel*u
    cA, cB, _, _ = R._self_contact_geometry(model, x, q)
    J_fused = R._self_pair_jacobians(cA, cB, term2)
    J_two = (R._point_jacobians(cA, R._SELF_A, term2)
             - R._point_jacobians(cB, R._SELF_B, term2))
    np.testing.assert_allclose(np.asarray(J_fused), np.asarray(J_two),
                               atol=1e-4)
    v_rel_jac = jnp.einsum("ncij,nj->nci", J_fused, st.u)
    v_rel = (R._point_velocities(x, st.body_v, st.body_w, cA, R._SELF_A)
             - R._point_velocities(x, st.body_v, st.body_w, cB, R._SELF_B))
    np.testing.assert_allclose(np.asarray(v_rel), np.asarray(v_rel_jac),
                               atol=1e-4)


def test_merged_assembly_matches_4d():
    """The row-merged production layout (_build_rows_merged /
    _point_rows_merged / _assemble_lhs_rhs) agrees with the 4-D oracle
    layout exactly: Jacobian rows, the full 75x75 LHS, the rhs matvec, and
    the contact-spring Q -- including self-contact pair rows with arbitrary
    (ungated) weights. This pins the round-3 bandwidth optimization (merged
    (.,72) minors pad 1.78x vs ~4.5x; 1.67x measured on chip)."""
    from emloco_tpu.physics import reduced as R

    model, terrain = make_world(3)
    key = jax.random.PRNGKey(11)
    st = rest_state(model)
    st = st.replace(u=0.7 * jax.random.normal(key, st.u.shape))
    st = R.refresh_cache(model, st, TREE)
    x, q = st.body_x, st.body_q
    N = 3
    piv_j = x[:, 1:] + quat.rotate(q[:, 1:], model.anchor_c[:, 1:])
    pivots_x = jnp.concatenate([x[:, 0:1], piv_j], axis=1)

    # --- row builders: merged row m = 3k+i is the 4-D row (k, i) ---
    Jv4, W4, term2 = R._build_jacobians(model, x, q, pivots_x)
    G, W, t2m = R._build_rows_merged(model, x, q, pivots_x)
    np.testing.assert_allclose(np.asarray(G).reshape(N, R.B, 3, R.NA),
                               np.asarray(Jv4[..., 3:]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(W).reshape(N, R.B, 3, R.NA),
                               np.asarray(W4[..., 3:]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2m).reshape(N, R.B, 3, R.NA),
                               np.asarray(term2), atol=1e-4)

    cfg = EngineConfig()
    pts, _, gbody = R._ground_geometry(model, x, q, cfg)
    C = pts.shape[1]
    Jc = R._point_jacobians(pts, gbody, term2)
    Gc = R._point_rows_merged(pts, "capsule", t2m)
    np.testing.assert_allclose(np.asarray(Gc).reshape(N, C, 3, R.NA),
                               np.asarray(Jc[..., 3:]), atol=1e-4)

    # mesh table variant shares the row semantics
    cfg_m = EngineConfig(mesh_contacts=True)
    pts_m, _, gbody_m = R._ground_geometry(model, x, q, cfg_m)
    Jc_m = R._point_jacobians(pts_m, gbody_m, term2)
    Gc_m = R._point_rows_merged(pts_m, "mesh", t2m)
    np.testing.assert_allclose(
        np.asarray(Gc_m).reshape(N, pts_m.shape[1], 3, R.NA),
        np.asarray(Jc_m[..., 3:]), atol=1e-4)

    # self-pair rows: relative Jacobian, linear columns exactly zero
    cA, cB, _, _ = R._self_contact_geometry(model, x, q)
    K = cA.shape[1]
    Jcs = R._self_pair_jacobians(cA, cB, term2)
    Gcs = R._point_rows_merged(jnp.stack([cA, cB], axis=2), "self", t2m)
    np.testing.assert_allclose(np.asarray(Gcs).reshape(N, K, 3, R.NA),
                               np.asarray(Jcs[..., 3:]), atol=1e-4)
    assert float(jnp.abs(Jcs[..., :3]).max()) == 0.0

    # --- full assembly with arbitrary weights (gating-independent) ---
    ks = jax.random.split(key, 10)
    nrm = jax.random.normal(ks[0], (N, C, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm_s = jax.random.normal(ks[1], (N, K, 3))
    nrm_s = nrm_s / jnp.linalg.norm(nrm_s, axis=-1, keepdims=True)
    wn = jnp.abs(jax.random.normal(ks[2], (N, C)))
    wt = 0.5 * jnp.abs(jax.random.normal(ks[3], (N, C)))
    wn_s = jnp.abs(jax.random.normal(ks[4], (N, K)))
    wt_s = 0.5 * jnp.abs(jax.random.normal(ks[5], (N, K)))
    diag = jnp.abs(jax.random.normal(ks[6], (N, R.NU))) + 0.1
    f_lin = jax.random.normal(ks[7], (N, R.B, 3))
    Q_rest = jax.random.normal(ks[8], (N, R.NU))
    kpen = jnp.abs(jax.random.normal(ks[9], (N, C + K)))
    dt = cfg.substep_dt

    Jn = jnp.einsum("nci,ncij->ncj", nrm, Jc)
    Jns = jnp.einsum("nci,ncij->ncj", nrm_s, Jcs)
    Jn_a = R._normal_rows_merged(nrm, Gc, "capsule")
    Jn_sa = R._normal_rows_merged(nrm_s, Gcs, "self")
    np.testing.assert_allclose(np.asarray(Jn_a), np.asarray(Jn[..., 3:]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(Jn[..., :3]), np.asarray(nrm),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(Jn_sa), np.asarray(Jns[..., 3:]),
                               atol=1e-4)

    # oracle: 4-D assembly over the concatenated row set
    Jc_all = jnp.concatenate([Jc, Jcs], axis=1)
    Jn_all = jnp.concatenate([Jn, Jns], axis=1)
    wn_all = jnp.concatenate([wn, wn_s], axis=1)
    wt_all = jnp.concatenate([wt, wt_s], axis=1)
    At_o = R._assemble_lhs(model, Jv4, W4, diag, wn_all, wt_all, Jn_all,
                           Jc_all)
    rhs_o = R._assemble_rhs(model, Jv4, W4, q, st.body_v, st.body_w, f_lin,
                            dt, Q_rest)
    At_m, rhs_m = R._assemble_lhs_rhs(
        model, G, W, q, st.body_v, st.body_w, f_lin, dt, Q_rest, diag,
        (Gc, Jn_a, nrm, wn, wt), (Gcs, Jn_sa, wn_s, wt_s), "capsule")
    scale = float(jnp.abs(At_o).max())
    np.testing.assert_allclose(np.asarray(At_m), np.asarray(At_o),
                               atol=2e-4 * scale)
    rscale = float(jnp.abs(rhs_o).max())
    np.testing.assert_allclose(np.asarray(rhs_m), np.asarray(rhs_o),
                               atol=2e-4 * rscale)

    # contact-spring Q: split normal rows reproduce Jn_all^T . kpen
    Q_o = jnp.einsum("nc,ncj->nj", kpen, Jn_all)
    Q_m = R._q_contact_merged(kpen[:, :C], nrm, kpen,
                              jnp.concatenate([Jn_a, Jn_sa], axis=1))
    np.testing.assert_allclose(np.asarray(Q_m), np.asarray(Q_o), atol=1e-3)

    # --- gated self-contact builders: the 4-D oracle (_self_contact_rows)
    # stays exercised against the merged production variant (ADVICE r3 #1) ---
    (Jc4s, Jn4s, nrm4, act4, dt4, pen4, wn4, wt4), (cA4, cB4) = \
        R._self_contact_rows(model, x, q, st.body_v, st.body_w, term2, cfg,
                             True)
    (Gms, Jnms, nrmm, actm, dtm, penm, wnm, wtm), (cAm, cBm) = \
        R._self_contact_rows_merged(model, x, q, st.body_v, st.body_w, t2m,
                                    cfg, True)
    np.testing.assert_allclose(np.asarray(Gms).reshape(N, K, 3, R.NA),
                               np.asarray(Jc4s[..., 3:]), atol=1e-4)
    assert float(jnp.abs(Jc4s[..., :3]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(Jnms), np.asarray(Jn4s[..., 3:]),
                               atol=1e-4)
    for a, b in ((nrm4, nrmm), (act4, actm), (dt4, dtm), (pen4, penm),
                 (wn4, wnm), (wt4, wtm), (cA4, cAm), (cB4, cBm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # --- mesh-table statics through the full merged assembly (ADVICE r3 #2:
    # the ISELC/P/FLC constants for table="mesh" were pinned only at the
    # row level) ---
    C_m = pts_m.shape[1]
    km = jax.random.split(jax.random.PRNGKey(23), 4)
    nrm_m = jax.random.normal(km[0], (N, C_m, 3))
    nrm_m = nrm_m / jnp.linalg.norm(nrm_m, axis=-1, keepdims=True)
    wn_m = jnp.abs(jax.random.normal(km[1], (N, C_m)))
    wt_m = 0.5 * jnp.abs(jax.random.normal(km[2], (N, C_m)))
    kpen_m = jnp.abs(jax.random.normal(km[3], (N, C_m + K)))
    Jn_m4 = jnp.einsum("nci,ncij->ncj", nrm_m, Jc_m)
    Jn_ma = R._normal_rows_merged(nrm_m, Gc_m, "mesh")
    np.testing.assert_allclose(np.asarray(Jn_ma), np.asarray(Jn_m4[..., 3:]),
                               atol=1e-4)
    Jc_all2 = jnp.concatenate([Jc_m, Jcs], axis=1)
    Jn_all2 = jnp.concatenate([Jn_m4, Jns], axis=1)
    At_o2 = R._assemble_lhs(model, Jv4, W4, diag,
                            jnp.concatenate([wn_m, wn_s], axis=1),
                            jnp.concatenate([wt_m, wt_s], axis=1),
                            Jn_all2, Jc_all2)
    At_m2, rhs_m2 = R._assemble_lhs_rhs(
        model, G, W, q, st.body_v, st.body_w, f_lin, dt, Q_rest, diag,
        (Gc_m, Jn_ma, nrm_m, wn_m, wt_m), (Gcs, Jn_sa, wn_s, wt_s), "mesh")
    scale2 = float(jnp.abs(At_o2).max())
    np.testing.assert_allclose(np.asarray(At_m2), np.asarray(At_o2),
                               atol=2e-4 * scale2)
    np.testing.assert_allclose(np.asarray(rhs_m2), np.asarray(rhs_o),
                               atol=2e-4 * rscale)
    Q_o2 = jnp.einsum("nc,ncj->nj", kpen_m, Jn_all2)
    Q_m2 = R._q_contact_merged(kpen_m[:, :C_m], nrm_m, kpen_m,
                               jnp.concatenate([Jn_ma, Jn_sa], axis=1))
    np.testing.assert_allclose(np.asarray(Q_m2), np.asarray(Q_o2), atol=1e-3)


def test_mesh_colliders_beta_variation_shifts_contacts():
    """Vert-fit mesh colliders respond to body shape: different betas give
    measurably different sphere geometry AND a different ground-contact
    force distribution over bodies in a fall (VERDICT r3 item 7 — the
    convex-hull analog of smpl_local_robot.py:83-146; capsule-axis default
    spheres ignore the skinned surface)."""
    import os

    from emloco_tpu.kinematics.body_model import from_smpl_npz

    path = os.path.join(os.path.dirname(__file__), "data", "smpl_fixture.npz")
    betas = jnp.zeros((2, 10)).at[1, 0].set(2.0).at[1, 1].set(-2.0)
    bp = from_smpl_npz(path, betas)
    # geometry varies with beta (a capsule-axis default with shared radii
    # would only move via bone lengths; the vert fit moves every sphere)
    dc = np.abs(np.asarray(bp.mesh_points[0]) - np.asarray(bp.mesh_points[1]))
    assert dc.max() > 0.01, dc.max()
    dr_ = np.abs(np.asarray(bp.mesh_point_radius[0])
                 - np.asarray(bp.mesh_point_radius[1]))
    assert dr_.max() > 0.003, dr_.max()

    # knock the humanoid over and accumulate per-body contact load
    model = build_model(bp)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    st = rest_state(model)
    st = st.replace(u=st.u.at[:, 3].set(6.0))      # hard roll about x
    cfg = EngineConfig(n_substeps=2, mesh_contacts=True)
    acc = jnp.zeros((2, bm.NUM_BODIES))
    for _ in range(30):
        st = step(model, terrain, st, jnp.zeros((2, 23, 3)), cfg)
        acc = acc + jnp.linalg.norm(st.contact_force, axis=-1)
    acc = np.asarray(acc)
    assert np.isfinite(acc).all() and acc.sum(-1).min() > 1.0
    p0 = acc[0] / acc[0].sum()
    p1 = acc[1] / acc[1].sum()
    # the two shapes load the ground through measurably different bodies
    assert np.abs(p0 - p1).sum() > 0.05, np.abs(p0 - p1).sum()


def test_bf16_rows_match_f32_physics():
    """cfg.rows_bf16 (default) stores the merged Jacobian rows in bfloat16
    to halve the factor chain's HBM traffic (scripts/merge_attribution.py:
    the chain is ~74% of the production step). The rounding enters only
    through the row projections — forces, penetrations, the assembled
    LHS/RHS, and the solve stay f32 — so settled physics must agree with
    the f32 rows path to well under a percent."""
    model, terrain = make_world(2)
    st_lo = rest_state(model)
    st_hi = st_lo
    cfg_lo = EngineConfig()                 # rows_bf16=True default
    cfg_hi = EngineConfig(rows_bf16=False)
    tgt = jnp.zeros((2, 23, 3))
    for _ in range(60):                     # 2 s, settled standing
        st_lo = step(model, terrain, st_lo, tgt, cfg_lo)
        st_hi = step(model, terrain, st_hi, tgt, cfg_hi)
    f_lo = float(st_lo.contact_force[..., 2].sum(-1).mean())
    f_hi = float(st_hi.contact_force[..., 2].sum(-1).mean())
    assert abs(f_lo - f_hi) / f_hi < 0.01, (f_lo, f_hi)
    dz = np.abs(np.asarray(st_lo.root_pos - st_hi.root_pos))
    assert dz.max() < 2e-3, dz.max()        # rest trajectory within 2 mm
    du = np.abs(np.asarray(st_lo.u - st_hi.u))
    assert du.max() < 0.05, du.max()


def test_terrain_patch_lookup_matches_global():
    """cfg.terrain_patch routes the contact-path terrain lookup through a
    per-env corner-texture window (one dynamic-slice row per env + one-hot
    interpolation) instead of one gather row per contact point. Same
    corners, same math — heights and normals must be EXACT wherever the
    contact points lie within the window, including envs whose window
    clamps at the grid border."""
    from emloco_tpu.physics.terrain import (corner_patch, height_and_normal_at,
                                            height_and_normal_at_patch,
                                            make_heightfield)
    rng = np.random.RandomState(3)
    hf = make_heightfield(rng.uniform(-0.3, 0.3, (64, 80)).astype(np.float32),
                          cell=0.1, origin=(-3.2, -4.0),
                          spawnable_xy=np.zeros((1, 2), np.float32))
    N, C = 16, 28
    # roots spread over the grid incl. the borders; points within 1.2 m
    root = jnp.asarray(rng.uniform([-3.2, -4.0], [3.2, 4.0], (N, 2)),
                       jnp.float32)
    pts = root[:, None] + jnp.asarray(rng.uniform(-1.2, 1.2, (N, C, 2)),
                                      jnp.float32)
    h_g, n_g = height_and_normal_at(hf, pts)
    patch, xb, yb = corner_patch(hf, root, 32)
    h_p, n_p = height_and_normal_at_patch(hf, patch, xb, yb, pts)
    np.testing.assert_array_equal(np.asarray(h_g), np.asarray(h_p))
    np.testing.assert_array_equal(np.asarray(n_g), np.asarray(n_p))

    # in-window queries report no clamping; a far query flags oob instead
    # of silently mis-colliding (ADVICE r4: the clamp needs a signal)
    h_m, n_m, oob = height_and_normal_at_patch(hf, patch, xb, yb, pts,
                                               return_oob=True)
    np.testing.assert_array_equal(np.asarray(h_m), np.asarray(h_p))
    assert not np.asarray(oob).any()
    # controlled interior case: a root mid-grid, one query 2.5 m away —
    # inside the GRID (so the shared grid-border clamp doesn't alias it)
    # but outside the 32-cell window's ~1.6 m half-extent
    root_c = jnp.asarray([[0.0, 0.0]], jnp.float32)
    pts_c = jnp.asarray([[[0.1, 0.1], [2.5, 0.0]]], jnp.float32)
    patch_c, xb_c, yb_c = corner_patch(hf, root_c, 32)
    _, _, oob_c = height_and_normal_at_patch(hf, patch_c, xb_c, yb_c,
                                             pts_c, return_oob=True)
    np.testing.assert_array_equal(np.asarray(oob_c), [[False, True]])

    # and through the engine: one step on rough terrain, patch vs global
    model, _ = make_world(2)
    st = rest_state(model)
    tgt = jnp.zeros((2, 23, 3))
    cfg_g = EngineConfig()
    cfg_p = EngineConfig(terrain_patch=32)
    s_g, s_p = st, st
    for _ in range(30):
        s_g = step(model, hf, s_g, tgt, cfg_g)
        s_p = step(model, hf, s_p, tgt, cfg_p)
    np.testing.assert_allclose(np.asarray(s_g.root_pos),
                               np.asarray(s_p.root_pos), atol=1e-6)


def test_batch_major_solver_matches_default():
    """cfg.batch_major_solver assembles the LHS/RHS in XLA's native batched
    layouts (N,75,75)/(N,75) and the batch-major Pallas kernels fuse the
    env-last relayout into their in-VMEM permutes. Kernel outputs must be
    exact vs the env-last kernels (interpret mode), and engine trajectories
    must agree with the default path (bf16 rows make the only difference a
    contraction-order rounding)."""
    from emloco_tpu.physics import pallas_linalg as PL
    from emloco_tpu.physics import reduced as R

    model, terrain = make_world(4)
    st0 = rest_state(model)
    tgt = jnp.zeros((4, 23, 3))
    sA, sB = st0, st0
    for _ in range(40):
        sA = step(model, terrain, sA, tgt, EngineConfig())
        sB = step(model, terrain, sB, tgt,
                  EngineConfig(batch_major_solver=True))
    assert float(jnp.abs(sA.root_pos - sB.root_pos).max()) < 1e-4
    # joint-velocity drift over 40 chaotic contact steps is bf16-row
    # rounding amplified by contact transients, and its size is
    # machine-dependent (XLA picks different fusion orders per host:
    # measured 0.0199 on an avx512 host vs <0.01 on the round-4 machine).
    # The exactness guarantee is the kernel-level assert below; this bound
    # only catches gross layout bugs.
    assert float(jnp.abs(sA.u - sB.u).max()) < 0.05

    # kernel-level exactness on a real assembled LHS (interpret mode)
    (G, W, ground, selfrows, *rest) = R._contact_and_jacobians(
        model, terrain, st0, EngineConfig())
    table, diag = rest[-1], rest[5]
    At = R._assemble_lhs_merged(model, G, W, diag, ground, selfrows,
                                table) + 1e-6 * jnp.eye(R.NU)[:, :, None]
    At_bm = jnp.moveaxis(At, -1, 0)
    b = jnp.asarray(np.random.RandomState(0).randn(4, R.NU), jnp.float32)
    args = (R._ARROW_CHUNKS, R._ARROW_LIMBS, R._ARROW_S)
    x_t = PL.cholesky_solve_blocked_t(At, b.T, *args, interpret=True).T
    x_bm = PL.cholesky_solve_blocked(At_bm, b, *args, interpret=True)
    np.testing.assert_array_equal(np.asarray(x_t), np.asarray(x_bm))
    L_bm = PL.cholesky_factor_blocked(At_bm, *args, interpret=True)
    x2 = PL.cholesky_resolve_blocked(L_bm, b, *args, interpret=True)
    np.testing.assert_array_equal(np.asarray(x_t), np.asarray(x2))


def test_sqrt_gram_matches_two_operand():
    """cfg.sqrt_gram contracts (√w∘R) with itself instead of (w∘R, R):
    same LHS to bf16 rounding, identical trajectories to the rounding
    budget, and the static guard rejects configs where wn−wt can go
    negative (dt·k_n + d_n < max_friction_damping)."""
    from emloco_tpu.physics import reduced as R

    model, terrain = make_world(4)
    st0 = rest_state(model)
    (G, W, ground, selfrows, *rest) = R._contact_and_jacobians(
        model, terrain, st0, EngineConfig())
    table, diag = rest[-1], rest[5]
    ref = R._assemble_lhs_merged(model, G, W, diag, ground, selfrows, table)
    sym = R._assemble_lhs_merged(model, G, W, diag, ground, selfrows, table,
                                 sqrt_gram=True)
    ref_n, sym_n = np.asarray(ref), np.asarray(sym)
    scale = np.abs(ref_n).max()
    assert np.abs(sym_n - ref_n).max() < 0.01 * scale    # bf16 rounding
    # trajectories agree to the rounding budget
    tgt = jnp.zeros((4, 23, 3))
    sA, sB = st0, st0
    for _ in range(40):
        sA = step(model, terrain, sA, tgt, EngineConfig(sqrt_gram=False))
        sB = step(model, terrain, sB, tgt, EngineConfig(sqrt_gram=True))
    assert float(jnp.abs(sA.root_pos - sB.root_pos).max()) < 1e-3
    assert float(jnp.abs(sA.u - sB.u).max()) < 0.05
    # self-contact and mesh row families share the weight contract: the
    # sym LHS matches the two-operand form for both variants too
    for vcfg in (EngineConfig(self_contact=True),
                 EngineConfig(mesh_contacts=True)):
        (G2, W2, ground2, self2, *rest2) = R._contact_and_jacobians(
            model, terrain, st0, vcfg)
        t2, d2 = rest2[-1], rest2[5]
        a = np.asarray(R._assemble_lhs_merged(model, G2, W2, d2, ground2,
                                              self2, t2))
        b = np.asarray(R._assemble_lhs_merged(model, G2, W2, d2, ground2,
                                              self2, t2, sqrt_gram=True))
        assert np.abs(b - a).max() < 0.01 * max(np.abs(a).max(), 1.0)
    # static guard: default holds strictly; a weaker normal weight
    # falls back to the two-operand form
    assert R._sqrt_gram_ok(EngineConfig(sqrt_gram=True))
    assert not R._sqrt_gram_ok(EngineConfig(sqrt_gram=True,
                                            contact_stiffness=1000.0,
                                            max_friction_damping=1e5))
    assert not R._sqrt_gram_ok(EngineConfig(sqrt_gram=False))


def test_gram_diag_kernel_matches_einsum():
    """cfg.gram_kernel: the Pallas fused weighted-Gram+diag emits the same
    batch-major LHS as the XLA einsum path, on REAL assembled rows (bf16,
    self-contact families included) and with env counts that exercise the
    block padding."""
    from emloco_tpu.physics import pallas_linalg as PL
    from emloco_tpu.physics import reduced as R

    model, terrain = make_world(4)
    st0 = rest_state(model)
    (G, W, ground, selfrows, *rest) = R._contact_and_jacobians(
        model, terrain, st0, EngineConfig())
    table, diag = rest[-1], rest[5]
    rows, wv = R._merged_rows(model, G, W, ground, selfrows, table)
    ref = R._assemble_lhs_merged(model, G, W, diag, ground, selfrows,
                                 table, batch_major=True)
    out = PL.gram_diag(rows, wv, diag.astype(jnp.float32),
                       block_envs=8, interpret=True)     # pads 4 → 8
    # bf16-rounding-scale agreement with the einsum (which rounds w∘R to
    # bf16 BEFORE the dot) ...
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=0.05)
    # ... and the kernel is the MORE exact path: its f32 accumulation of
    # exact bf16 products tracks an f64 gold to float precision
    r64 = np.asarray(rows[0], np.float64)
    w64 = np.asarray(wv[0], np.float64)
    gold = ((w64[:, None] * r64).T @ r64
            + np.diag(np.asarray(diag[0], np.float64)))
    assert np.abs(np.asarray(out)[0] - gold).max() < 1e-4
    # random rows at a non-divisible env count + f32 exactness
    rng = np.random.RandomState(1)
    Rr = jnp.asarray(rng.randn(5, 40, 75), jnp.float32)
    w = jnp.asarray(rng.rand(5, 40), jnp.float32)
    d = jnp.asarray(rng.rand(5, 75), jnp.float32)
    ref2 = (jnp.einsum("nmc,nmd->ncd", w[..., None] * Rr, Rr,
                       preferred_element_type=jnp.float32)
            + jnp.eye(75)[None] * d[:, :, None])
    out2 = PL.gram_diag(Rr, w, d, block_envs=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=0, atol=1e-5)
    # the chunked batch-major -> env-last relayout is an exact transpose
    # (incl. the env pad/crop), so gram + relayout == the env-last einsum
    el = PL.to_env_last(out2, interpret=True)
    np.testing.assert_array_equal(np.asarray(el),
                                  np.moveaxis(np.asarray(out2), 0, -1))
    # the staged production composition (gram emits the 16-row staging pad,
    # the relayout crops it) is also exact
    el2 = PL.to_env_last(PL.gram_diag(Rr, w, d, block_envs=4, out_rows=80,
                                      interpret=True),
                         out_rows=75, interpret=True)
    np.testing.assert_array_equal(np.asarray(el2), np.asarray(el))
