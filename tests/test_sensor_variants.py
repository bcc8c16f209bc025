"""Sensor footprint variants (fov / square_fov), crowd pointnet, AMP-obs
joint dropout — reference init_fov_height_points /
init_square_fov_height_points (humanoid_pedestrain_terrain.py:670-730),
_build_pointnet (amp_network_sept_builder.py:167-181), get_dropout_mask
(amp_models.py:49-90)."""
import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
from emloco_tpu.envs import observations as obs
from emloco_tpu.envs import traj_gen
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.learning.networks import AMPSeptValueNet
from emloco_tpu.physics import flat_terrain


def _make_env(**cfg_kw):
    cfg = EnvConfig(num_envs=4, **cfg_kw)
    terrain = flat_terrain(extent=30.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,))
    bank = traj_gen.synthetic_real_bank(num_paths=8)
    return PedestrianTerrainEnv(cfg, terrain, lib, real_traj_bank=bank)


def test_fov_grid_shape_and_bounds():
    g = obs.make_sensor_grid_fov()
    assert g.shape == (18 * 25, 2)
    # forward fan: max range 2 m, bearings within ±110°
    r = np.linalg.norm(g, axis=-1)
    assert r.max() <= 2.0 + 1e-5
    ang = np.abs(np.degrees(np.arctan2(g[:, 1], g[:, 0])))
    assert ang.max() <= 110.0 + 1e-3


def test_square_fov_grid():
    g = obs.make_sensor_grid_square_fov()
    assert g.shape == (400, 2)
    assert g[:, 0].min() == np.float32(-0.02) and g[:, 1].max() == 1.0


def test_flip_perm_is_exact_involution():
    for g in (obs.make_sensor_grid(2.0, 8), obs.make_sensor_grid_fov(),
              obs.make_sensor_grid_square_fov()):
        p = obs.grid_flip_perm(g)
        assert (p[p] == np.arange(len(g))).all()
        np.testing.assert_allclose(g[p] * np.array([1, -1]), g, atol=1e-6)


def test_fov_env_obs_dims_and_flip():
    env = _make_env(sensor_shape="fov")
    assert env.cfg.num_sensor_points == 450
    st = env.reset(jax.random.PRNGKey(0))
    o = env.observe(st)
    assert o.shape == (4, env.cfg.obs_dim)
    f = env.observe_flipped(st)
    assert f.shape == o.shape
    # heightmap slice of flip(flip) == original (perm is an involution)
    off = env.cfg.self_obs_dim + env.cfg.num_traj_samples * 2
    P = env.cfg.num_sensor_points
    perm = np.asarray(env.sensor_flip_perm)
    hm, hm_f = np.asarray(o[:, off:off + P]), np.asarray(f[:, off:off + P])
    np.testing.assert_allclose(hm_f[:, perm], hm, atol=1e-5)


def test_pointnet_people_permutation_invariance():
    net = AMPSeptValueNet(num_actions=9, self_obs_dim=7, traj_obs_dim=6,
                          task_obs_dim=6 + 165, people_obs_dim=165)
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (3, 7 + 6 + 165))
    params = net.init(key, o, jnp.zeros((3, 12)))
    mu, _ = net.apply(params, o, method=net.actor)
    # shuffle the 5 people: actor output must not change. Group-obs layout
    # is [k·10 joint positions | k root velocities] (reference-exact), so a
    # person permutation permutes the two blocks separately.
    perm = [3, 1, 4, 0, 2]
    pos = o[:, -165:-15].reshape(3, 5, 30)[:, perm]
    vel = o[:, -15:].reshape(3, 5, 3)[:, perm]
    o2 = jnp.concatenate([o[:, :-165], pos.reshape(3, 150),
                          vel.reshape(3, 15)], -1)
    mu2, _ = net.apply(params, o2, method=net.actor)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), atol=1e-5)


def test_amp_dropout_mask_structure():
    steps, per = 3, 216
    m = np.asarray(obs.amp_dropout_mask(jax.random.PRNGKey(1), 64, steps,
                                        per, 0.3)).reshape(64, steps, per)
    # identical across window steps; root/key/shape dims never dropped
    assert (m == m[:, :1]).all()
    assert (m[:, :, :12] == 1).all() and (m[:, :, 12 + 114 + 57:] == 1).all()
    pos = m[:, 0, 12:126].reshape(64, 19, 6)
    vel = m[:, 0, 126:183].reshape(64, 19, 3)
    # a dropped joint zeroes BOTH its dof-obs and dof-vel blocks
    assert (pos[..., 0] == vel[..., 0]).all()
    assert ((pos == pos[..., :1]).all() and (vel == vel[..., :1]).all())
    frac = 1 - pos[..., 0].mean()
    assert 0.2 < frac < 0.4


def test_velocity_map_is_ego_pov():
    """Uncovered cells read −ego velocity in the heading frame (reference
    sample_height_points else-branch: zeros minus ego vel)."""
    from emloco_tpu.physics import flat_terrain as ft
    terrain = ft(20.0)
    grid = obs.make_sensor_grid(2.0, 4)
    n = 3
    pos = jnp.zeros((n, 3)).at[:, 2].set(1.6)
    rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (n, 1))  # identity (xyzw)
    vel = jnp.asarray([[1.0, 0.5, 0.0]] * n)
    out = np.asarray(obs.velocity_map_obs(terrain, pos, rot, pos[:, :2],
                                          grid, vel)).reshape(n, -1, 3)
    np.testing.assert_allclose(out[..., 1], -1.0, atol=1e-5)
    np.testing.assert_allclose(out[..., 2], -0.5, atol=1e-5)


def test_group_velocity_map_stamps_people():
    """A neighbor inside the sensor footprint appears as a +1.7 m obstacle
    with its relative velocity; far cells read −ego velocity."""
    from emloco_tpu.physics import flat_terrain as ft
    terrain = ft(20.0)
    grid = obs.make_sensor_grid(2.0, 16)
    # group of 2: observer at origin (still), neighbor 1 m ahead moving +y
    root_pos = jnp.asarray([[0.0, 0, 0.9], [1.0, 0, 0.9]])
    root_vel = jnp.asarray([[0.0, 0, 0], [0.0, 2.0, 0]])
    rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (2, 1))
    head = root_pos + jnp.asarray([0.0, 0, 0.7])
    out = np.asarray(obs.group_velocity_map_obs(
        terrain, head, rot, root_pos[:, :2], grid, root_pos, root_vel,
        group_size=2)).reshape(2, -1, 3)
    g = np.asarray(grid)
    # observer's cells at the neighbor's footprint (|x−1|≤.25, |y|≤.5)
    inside = (np.abs(g[:, 0] - 1.0) <= 0.25) & (np.abs(g[:, 1]) <= 0.5)
    assert inside.any()
    np.testing.assert_allclose(out[0, inside, 0], -1.7 * 5.0, atol=1e-4)
    np.testing.assert_allclose(out[0, inside, 2], 2.0, atol=1e-4)
    outside = ~inside
    np.testing.assert_allclose(out[0, outside, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(out[0, outside, 1], 0.0, atol=1e-4)
    # the moving neighbor sees the still observer at −2 rel-y velocity
    inside1 = (np.abs(g[:, 0] + 1.0) <= 0.25) & (np.abs(g[:, 1]) <= 0.5)
    np.testing.assert_allclose(out[1, inside1, 0], -1.7 * 5.0, atol=1e-4)
    np.testing.assert_allclose(out[1, inside1, 2], -2.0, atol=1e-4)
    np.testing.assert_allclose(out[1, ~inside1, 2], -2.0, atol=1e-4)


def test_group_spawn_clustering():
    env = _make_env(group_obs=True, group_size=4,
                    group_spawn_spread=2.0)
    st = env.reset(jax.random.PRNGKey(3))
    xy = np.asarray(st.physics.body_x[:, 0, :2])
    # all 4 members of the single group within the jitter box of each other
    assert np.abs(xy - xy.mean(0)).max() <= 2 * 2.0 + 1e-3


def test_group_spawn_nondivisible_env_count():
    """num_envs not divisible by group_size must still yield exactly n spawn
    rows (round-1 regression: floor-divide produced ng*G < n and a concat
    shape error downstream)."""
    cfg = EnvConfig(num_envs=12, group_obs=True, group_size=8,
                    group_spawn_spread=2.0)
    terrain = flat_terrain(extent=30.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,))
    env = PedestrianTerrainEnv(cfg, terrain, lib,
                               real_traj_bank=traj_gen.synthetic_real_bank(
                                   num_paths=8))
    xy = env._sample_spawn(jax.random.PRNGKey(0), 12)
    assert xy.shape == (12, 2)
    st = env.reset(jax.random.PRNGKey(1))
    assert st.physics.root_pos.shape[0] == 12
    assert np.isfinite(np.asarray(xy)).all()


def test_terrain_curriculum_grades_difficulty():
    from emloco_tpu.physics import generate_mixed_terrain
    hf = generate_mixed_terrain(map_length=4.0, num_tiles=4, cell=0.1,
                                curriculum=True, seed=1)
    h = np.asarray(hf.heights)
    tile = 40
    rough = [np.std(h[10 + i * tile:10 + (i + 1) * tile]) for i in range(4)]
    assert rough[-1] > rough[0]  # last row is harder than the first


def test_feature_space_flip_matches_state_flip():
    """observe_flipped_from (static signed permutation of the computed obs)
    must equal the state-based mirror exactly — across plain, velocity-map,
    group, and fov-sensor configurations, on states with real motion."""
    import jax as _jax
    for kw in (dict(), dict(velocity_map=True),
               dict(group_obs=True, group_size=4),
               dict(sensor_shape="fov")):
        env = _make_env(**kw)
        st = env.reset(_jax.random.PRNGKey(7))
        key = _jax.random.PRNGKey(8)
        for _ in range(3):   # build up velocities / heading changes
            key, k = _jax.random.split(key)
            a = _jax.random.uniform(k, (4, env.cfg.num_actions),
                                    minval=-0.4, maxval=0.4)
            st, out = env.step(st, a)
        ref = np.asarray(env.observe_flipped(st))
        fast = np.asarray(env.observe_flipped_from(env.observe(st)))
        np.testing.assert_allclose(fast, ref, atol=2e-4,
                                   err_msg=str(kw))


def test_feature_space_flip_hand_targets_swap():
    from emloco_tpu.envs.hand_task import PedestrianTerrainHandEnv
    from emloco_tpu.envs.pedestrian_terrain import EnvConfig as EC
    from emloco_tpu.kinematics import motion_lib as ml2
    from emloco_tpu.physics import flat_terrain as ft
    cfg = EC(num_envs=2, sensor_res=8, num_amp_obs_steps=3)
    env = PedestrianTerrainHandEnv(cfg, ft(20.0),
                                   ml2.synthetic_walk_motions(speeds=(1.0,),
                                                              duration=1.5))
    st = env.reset(jax.random.PRNGKey(0))
    o = env.observe(st)
    f = np.asarray(env.observe_flipped_from(o))
    S = cfg.num_traj_samples
    base = cfg.self_obs_dim + 2 * S
    np.testing.assert_allclose(f[:, base:base + 2],
                               np.asarray(st.hand_targets)[:, ::-1],
                               atol=1e-5)
