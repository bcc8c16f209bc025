import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
from emloco_tpu.envs import traj_gen
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.physics import flat_terrain


def make_env(n=4, terrain_obs=True):
    cfg = EnvConfig(num_envs=n, terrain_obs=terrain_obs)
    terrain = flat_terrain(extent=30.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0, 1.5))
    bank = traj_gen.synthetic_real_bank(num_paths=16)
    return PedestrianTerrainEnv(cfg, terrain, lib, real_traj_bank=bank)


def test_reset_shapes():
    env = make_env(4)
    st = env.reset(jax.random.PRNGKey(0))
    o = env.observe(st)
    assert o.shape == (4, env.cfg.obs_dim)
    assert st.waypoint_traj.shape == (4, 13, 2)
    assert st.init_pose.shape == (4, 24, 3)
    assert st.init_vel.shape == (4, 2)
    # waypoints are origin-normalized: first ≈ 0
    np.testing.assert_allclose(np.asarray(st.waypoint_traj[:, 0]), 0,
                               atol=1e-4)


def test_step_runs_and_is_finite():
    env = make_env(4)
    st = env.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for i in range(5):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (4, env.cfg.num_actions), minval=-0.2,
                               maxval=0.2)
        st, out = env.step(st, a)
        assert np.all(np.isfinite(np.asarray(out.obs)))
        assert np.all(np.isfinite(np.asarray(out.reward)))
    assert out.amp_obs.shape == (4, env.cfg.num_amp_obs_steps
                                 * env.cfg.amp_obs_per_step)


def test_location_reward_peak():
    """Standing exactly on the target gives reward ≈ location_coefficient."""
    env = make_env(2)
    st = env.reset(jax.random.PRNGKey(0))
    # overwrite the trajectory with a constant vertex chain at the root xy
    root_xy = st.physics.body_x[:, 0, :2]
    verts = jnp.tile(
        jnp.concatenate([root_xy, jnp.zeros((2, 1))], -1)[:, None],
        (1, env.cfg.traj.num_verts, 1))
    st = st.replace(traj_verts=verts)
    st2, out = env.step(st, jnp.zeros((2, env.cfg.num_actions)))
    assert np.all(np.asarray(out.reward_raw[:, 0]) > 0.95)


def test_episode_truncation_resets():
    env = make_env(2)
    st = env.reset(jax.random.PRNGKey(0))
    st = st.replace(progress=jnp.full((2,), env.cfg.episode_length - 2,
                                      jnp.int32))
    st2, out = env.step(st, jnp.zeros((2, env.cfg.num_actions)))
    assert bool(out.done.all())
    # progress reset to zero for done envs
    assert np.all(np.asarray(st2.progress) == 0)


def test_amp_demo_fetch():
    env = make_env(2)
    demo = env.fetch_amp_obs_demo(jax.random.PRNGKey(0), 8)
    assert demo.shape == (8, env.cfg.num_amp_obs_steps
                          * env.cfg.amp_obs_per_step)
    assert np.all(np.isfinite(np.asarray(demo)))


def test_rollout_in_scan():
    """The env steps inside lax.scan — the shape RL training uses."""
    env = make_env(2)
    st = env.reset(jax.random.PRNGKey(0))

    def body(s, _):
        s, out = env.step(s, jnp.zeros((2, env.cfg.num_actions)))
        return s, out.reward

    final, rewards = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=8))(st)
    assert rewards.shape == (8, 2)
    assert np.all(np.isfinite(np.asarray(rewards)))


def test_motion_lib_blending():
    lib = ml.synthetic_walk_motions(speeds=(1.0,))
    ids = jnp.zeros((3,), jnp.int32)
    t = jnp.array([0.0, 0.5, 1.0])
    ms = ml.get_motion_state(lib, ids, t)
    assert ms["root_pos"].shape == (3, 3)
    # walking forward: x increases with time
    x = np.asarray(ms["root_pos"][:, 0])
    assert x[0] < x[1] < x[2]
    # blended quats are unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ms["local_rot"]), axis=-1), 1.0, atol=1e-4)


def test_traj_calc_pos_endpoints():
    cfg = traj_gen.TrajConfig()
    key = jax.random.PRNGKey(0)
    init = jnp.zeros((3, 3))
    verts, _ = traj_gen.sample_traj(key, cfg, init)
    p0 = traj_gen.calc_pos(verts, jnp.zeros(3), cfg.episode_dur)
    np.testing.assert_allclose(np.asarray(p0[:, :2]), 0.0, atol=1e-5)
    pend = traj_gen.calc_pos(verts, jnp.full((3,), cfg.episode_dur),
                             cfg.episode_dur)
    np.testing.assert_allclose(np.asarray(pend), np.asarray(verts[:, -1]),
                               atol=1e-4)


def test_domain_randomization_hooks():
    cfg = EnvConfig(num_envs=2, terrain_obs=False, num_amp_obs_steps=3,
                    obs_noise_std=0.01, action_noise_std=0.01,
                    push_interval=2, push_vel=0.5)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    st = env.reset(jax.random.PRNGKey(0))
    st, out1 = env.step(st, jnp.zeros((2, env.cfg.num_actions)))
    st, out2 = env.step(st, jnp.zeros((2, env.cfg.num_actions)))
    assert np.all(np.isfinite(np.asarray(out2.obs)))
    # obs noise: two observe calls through step differ from clean observe
    clean = env.observe(st)
    assert not np.allclose(np.asarray(out2.obs), np.asarray(clean))


def test_projectile_perturbations():
    """Projectile hits (humanoid.py:95-133): at the interval step the root
    picks up a velocity + angular-velocity kick; sim stays finite."""
    cfg = EnvConfig(num_envs=4, terrain_obs=False, num_amp_obs_steps=3,
                    projectile_interval=2, projectile_impulse=20.0,
                    enable_early_termination=False)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    st = env.reset(jax.random.PRNGKey(0))
    a = jnp.zeros((4, env.cfg.num_actions))
    st, _ = env.step(st, a)                       # progress 0→1: no hit
    w_before = np.asarray(st.physics.u[:, 3:6])
    st, out = env.step(st, a)                     # progress 1: hit step
    w_after = np.asarray(st.physics.u[:, 3:6])
    assert np.all(np.isfinite(np.asarray(out.obs)))
    # angular velocity visibly kicked on at least one env
    assert np.abs(w_after - w_before).max() > 0.05


def test_traj_bank_export_roundtrip(tmp_path):
    from emloco_tpu.prediction.data import SyntheticScenes
    from emloco_tpu.prediction.export import (export_scene_dataset,
                                              load_traj_bank)

    ds = SyntheticScenes(num_people=2, seed=0)
    path = str(tmp_path / "bank.pkl")
    bank = export_scene_dataset(ds, path, num_scenes=8, batch_size=4)
    assert bank.shape[1] == 101 and bank.shape[2] == 2
    trajs, poses, vels = load_traj_bank(path)
    assert trajs.shape == bank.shape
    assert poses.shape[1:] == (24, 3)
    assert vels.shape[1:] == (2,)
    # spline endpoints interpolate the waypoints
    np.testing.assert_allclose(trajs[:, 0], 0.0, atol=1e-4)


def test_scheduled_domain_randomization():
    """Scheduled physical-property DR (reference apply_randomizations,
    base_task.py:547-787): per-env scales sampled within ranges, frequency-
    gated resampling at reset, and the scales actually reach the physics
    (standing weight tracks the mass multiplier)."""
    import jax
    import jax.numpy as jnp
    from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
    from emloco_tpu.envs.pedestrian_terrain import DRConfig
    from emloco_tpu.kinematics import motion_lib as ml
    from emloco_tpu.physics import flat_terrain

    n = 8
    cfg = EnvConfig(num_envs=n, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3,
                    dr=DRConfig(enabled=True, frequency=4))
    env = PedestrianTerrainEnv(cfg, flat_terrain(extent=20.0, cell=0.1),
                               ml.synthetic_walk_motions(speeds=(1.0,),
                                                         duration=1.5))
    st = env.reset(jax.random.PRNGKey(0))
    s0 = np.asarray(st.dr_scales)
    assert s0.shape == (n, 5)
    assert not np.allclose(s0[:, 0], 1.0)            # sampled, not neutral
    assert (s0[:, 0] >= 0.8 - 1e-6).all() and (s0[:, 0] <= 1.2 + 1e-6).all()
    assert (np.abs(s0[:, 4]) <= 0.005 + 1e-6).all()  # rest offset additive
    assert len(np.unique(s0[:, 0])) > 1              # per-env variation

    # frequency gate: a reset before `frequency` steps keeps the scales
    st1 = st.replace(dr_clock=jnp.asarray(2, jnp.int32))
    r1 = env._auto_reset(st1, jnp.ones((n,), bool))
    np.testing.assert_allclose(np.asarray(r1.dr_scales), s0)
    # ... and after `frequency` steps resamples them
    st2 = st.replace(dr_clock=jnp.asarray(10, jnp.int32))
    r2 = env._auto_reset(st2, jnp.ones((n,), bool))
    assert not np.allclose(np.asarray(r2.dr_scales), s0)
    assert (np.asarray(r2.dr_last) == 10).all()

    # physics effect: heavier envs press harder into the ground
    heavy = st.replace(dr_scales=jnp.ones((n, 5)).at[:, 4].set(0.0)
                       .at[:, 0].set(1.5))
    light = st.replace(dr_scales=jnp.ones((n, 5)).at[:, 4].set(0.0))
    a = jnp.zeros((n, env.cfg.num_actions))
    fh = fl = None
    sh, sl = heavy, light
    for _ in range(8):          # settle
        sh, _ = env.step(sh, a)
        sl, _ = env.step(sl, a)
    fh = np.asarray(sh.physics.contact_force[..., 2].sum(-1))
    fl = np.asarray(sl.physics.contact_force[..., 2].sum(-1))
    ratio = fh / np.maximum(fl, 1e-3)
    assert 1.3 < np.median(ratio) < 1.7, ratio

    # schedule ramp: intensity 0 at clock 0 -> neutral scales
    cfg_r = cfg.replace(dr=DRConfig(enabled=True, schedule_steps=1000))
    env_r = PedestrianTerrainEnv(cfg_r, flat_terrain(extent=20.0, cell=0.1),
                                 ml.synthetic_walk_motions(speeds=(1.0,),
                                                           duration=1.5))
    str0 = env_r.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(str0.dr_scales[:, :4]), 1.0,
                               atol=1e-6)
    half = env_r._sample_dr_scales(jax.random.PRNGKey(1), n,
                                   jnp.asarray(500, jnp.int32))
    assert np.abs(np.asarray(half[:, 0]) - 1.0).max() <= 0.1 + 1e-6


def test_dr_power_penalty_uses_randomized_gains():
    """The power penalty must price the torques the sim actually applied:
    under DR the engine drives with per-env-scaled kp/kd (via _dr_model), so
    a high-gain env producing 30% more torque must see a correspondingly
    larger |tau*qd| penalty — not the nominal-gain one (reference computes
    power from the randomized sim's dof forces)."""
    from emloco_tpu.envs.pedestrian_terrain import DRConfig

    n = 4
    cfg = EnvConfig(num_envs=n, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3, dr=DRConfig(enabled=True))
    env = PedestrianTerrainEnv(cfg, flat_terrain(extent=20.0, cell=0.1),
                               ml.synthetic_walk_motions(speeds=(1.0,),
                                                         duration=1.5))
    from emloco_tpu.physics import joint_state

    st = env.reset(jax.random.PRNGKey(0))
    # develop joint velocities so power |tau*qd| is nonzero
    a = jnp.full((n, env.cfg.num_actions), 0.5)
    for _ in range(4):
        st, _ = env.step(st, a)
    # identical physics + PD target, only the DR gain scales differ: the
    # unsaturated torque is exactly gain-proportional, so the penalty must be
    # strictly larger for the high-gain draw (pre-fix it read nominal gains
    # and was identical for both)
    dof_pos, _ = joint_state(env.model, st.physics)
    pd_target = dof_pos + 0.2
    progress = st.progress
    neutral = jnp.ones((n, 5)).at[:, 4].set(0.0)
    hi = st.replace(dr_scales=neutral.at[:, 1:3].set(1.3))
    lo = st.replace(dr_scales=neutral.at[:, 1:3].set(0.7))
    _, raw_hi = env._reward(hi, st.physics, progress, pd_target)
    _, raw_lo = env._reward(lo, st.physics, progress, pd_target)
    p_hi = np.asarray(raw_hi[:, 1])              # power reward (negative)
    p_lo = np.asarray(raw_lo[:, 1])
    assert (p_hi < p_lo).all(), (p_hi, p_lo)


def test_heading_inversion_misconfiguration_raises():
    """heading_inversion_prob > 0 without init-heading alignment (or without
    a real bank) silently produced ZERO hard negatives; it must raise."""
    import pytest

    key = jax.random.PRNGKey(0)
    init_pos = jnp.zeros((4, 3))
    vel = jnp.ones((4, 2))
    bank = traj_gen.synthetic_real_bank(num_paths=4)
    bad = traj_gen.TrajConfig(init_heading=False, heading_inversion_prob=0.5)
    with pytest.raises(ValueError, match="init_heading"):
        traj_gen.sample_traj(key, bad, init_pos, root_vel=vel,
                             real_bank=bank)
    nobank = traj_gen.TrajConfig(heading_inversion_prob=0.5)
    with pytest.raises(ValueError, match="real trajectory bank"):
        traj_gen.sample_traj(key, nobank, init_pos, root_vel=vel,
                             real_bank=None)
    # no root velocity at reset -> alignment (and inversion) can't fire
    with pytest.raises(ValueError, match="root velocity"):
        traj_gen.sample_traj(key, nobank, init_pos, root_vel=None,
                             real_bank=bank)


def test_diverged_joint_rot_recycles():
    """An env whose joint_rot (or body cache) goes NaN while u/root_pos stay
    finite must still trip the divergence recycle — pre-fix it survived the
    finiteness check, and the epoch's first obs (the one learning-facing
    tensor that skips the StepOutput sanitizer) poisoned the update."""
    env = make_env(4)
    st = env.reset(jax.random.PRNGKey(0))
    bad_rot = st.physics.joint_rot.at[1, 3, :].set(jnp.nan)
    st = st.replace(physics=st.physics.replace(joint_rot=bad_rot))
    st2, out = env.step(st, jnp.zeros((4, env.cfg.num_actions)))
    assert bool(out.done[1])                      # recycled this step
    assert np.all(np.isfinite(np.asarray(out.obs)))
    assert np.all(np.isfinite(np.asarray(out.amp_obs)))
    # the recycled env's fresh state is finite again
    assert np.all(np.isfinite(np.asarray(st2.physics.joint_rot[1])))


def test_sensor_min2_lookup_paths_agree():
    """The sensor height lookup's three fallback tiers (corner-texture
    linearized take — the production path since the r5 VMEM-promotion fix —
    min2-texture take, raw-heights min) return bit-identical values on the
    same heightfield."""
    import jax
    import jax.numpy as jnp

    from emloco_tpu.physics import generate_mixed_terrain
    from emloco_tpu.physics.terrain import height_at_min2_xy

    hf = generate_mixed_terrain(map_length=4.0, num_tiles=2, difficulty=0.7)
    key = jax.random.PRNGKey(3)
    kx, ky = jax.random.split(key)
    ext = hf.heights.shape[0] * hf.cell
    x = jax.random.uniform(kx, (64, 33), minval=-1.0, maxval=ext + 1.0) \
        + hf.origin[0]
    y = jax.random.uniform(ky, (64, 33), minval=-1.0, maxval=ext + 1.0) \
        + hf.origin[1]

    h_corner = height_at_min2_xy(hf, x, y)
    h_min2 = height_at_min2_xy(hf.replace(corner_tex=None), x, y)
    h_raw = height_at_min2_xy(
        hf.replace(corner_tex=None, min2_tex=None), x, y)
    np.testing.assert_array_equal(np.asarray(h_corner), np.asarray(h_min2))
    np.testing.assert_array_equal(np.asarray(h_corner), np.asarray(h_raw))
