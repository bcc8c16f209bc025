import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.learning.amp_agent import AMPAgent, AMPConfig
from emloco_tpu.learning.networks import ValuePoseNet, rotate_normalization
from emloco_tpu.learning.running_norm import RunningNorm
from emloco_tpu.physics import flat_terrain


def tiny_agent():
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    acfg = AMPConfig(horizon=4, num_minibatches=2, mini_epochs=2,
                     amp_batch_size=8, amp_replay_size=64)
    return AMPAgent(env, acfg)


def test_running_norm():
    rn = RunningNorm.create(3)
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (1000, 3)) * 2.0 + 5.0
    rn = rn.update(data)
    np.testing.assert_allclose(np.asarray(rn.mean), 5.0, atol=0.3)
    np.testing.assert_allclose(np.asarray(jnp.sqrt(rn.var)), 2.0, atol=0.3)
    z = rn.normalize(data)
    assert abs(float(z.mean())) < 0.1


def test_value_pose_net_shapes_and_normalization():
    net = ValuePoseNet(use_pose=True, use_vel=True)
    key = jax.random.PRNGKey(0)
    traj = jax.random.normal(key, (6, 13, 2))
    pose = jax.random.normal(key, (6, 24, 3))
    vel = jax.random.normal(key, (6, 2))
    params = net.init(key, traj, pose, vel)
    v = net.apply(params, traj, pose, vel)
    assert v.shape == (6,)
    assert np.all((np.asarray(v) >= 0) & (np.asarray(v) <= 1))
    # rotation invariance: rotating all inputs about z leaves value unchanged
    ang = 1.1
    c, s = np.cos(ang), np.sin(ang)
    R = jnp.asarray(np.array([[c, -s], [s, c]], np.float32))
    traj_r = jnp.einsum("ij,bwj->bwi", R, traj)
    pose_r = jnp.concatenate(
        [jnp.einsum("ij,bkj->bki", R, pose[..., :2]), pose[..., 2:]], -1)
    vel_r = jnp.einsum("ij,bj->bi", R, vel)
    v_r = net.apply(params, traj_r, pose_r, vel_r)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_r), atol=1e-4)


def test_rotate_normalization_first_segment():
    key = jax.random.PRNGKey(1)
    traj = jax.random.normal(key, (8, 13, 2))
    out, _, _ = rotate_normalization(traj)
    # after normalization the second waypoint lies on the +x axis
    np.testing.assert_allclose(np.asarray(out[:, 1, 1]), 0.0, atol=1e-5)
    assert np.all(np.asarray(out[:, 1, 0]) >= -1e-5)


def test_train_epoch_runs():
    agent = tiny_agent()
    ts = agent.init(jax.random.PRNGKey(0))
    ts, metrics = agent.train_epoch(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(ts.epoch) == 1
    # a second epoch reuses the compiled function
    ts, metrics = agent.train_epoch(ts)
    assert int(ts.epoch) == 2


def test_train_epoch_updates_params():
    agent = tiny_agent()
    ts = agent.init(jax.random.PRNGKey(0))
    before = ts.params["params"]["mu"]["kernel"]
    ts, _ = agent.train_epoch(ts)
    after = ts.params["params"]["mu"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_locoval_training():
    from emloco_tpu.learning.value_train import LocoValTrainer, ValueTrainConfig

    agent = tiny_agent()
    ts = agent.init(jax.random.PRNGKey(0))
    vnet = ValuePoseNet(use_pose=True, use_vel=True)
    trainer = LocoValTrainer(agent, vnet,
                             ValueTrainConfig(horizon=8, step_to_pred=6))
    vts = trainer.init(ts, jax.random.PRNGKey(1))
    before = vts.vnet_params["params"]["fc1"]["kernel"]
    vts, metrics = trainer.train_epoch(vts)
    assert np.isfinite(float(metrics["vnet_loss"]))
    # step_to_pred=6 < horizon → samples latched
    assert float(metrics["num_latched"]) > 0
    after = vts.vnet_params["params"]["fc1"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # second epoch runs from carried state
    vts, metrics = trainer.train_epoch(vts)
    assert np.isfinite(float(metrics["vnet_loss"]))


def test_heading_inversion_hard_negatives():
    """LocoVal hard negatives end-to-end (reference --heading_inversion,
    traj_generator.py:195-200 + amp_continuous_value.py:63-64): inverted
    trajectories point OPPOSITE the root's facing, the env exposes the
    inverted flag, and latched value targets are depressed ×(−0.3)."""
    from emloco_tpu.envs import traj_gen
    from emloco_tpu.learning.value_train import LocoValTrainer, \
        ValueTrainConfig

    # geometric contract: aligned-but-inverted first segment anti-parallel
    # to the root velocity
    cfg = traj_gen.TrajConfig(hybrid_init_prob=0.0,
                              heading_inversion_prob=1.0)
    bank = traj_gen.synthetic_real_bank(num_paths=8)
    init_pos = jnp.zeros((4, 3))
    root_vel = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (4, 1))
    verts, inverted = traj_gen.sample_traj(jax.random.PRNGKey(0), cfg,
                                           init_pos, root_vel, bank)
    assert np.asarray(inverted).all()
    d0 = np.asarray(verts[:, 1, :2] - verts[:, 0, :2])
    d0 = d0 / np.linalg.norm(d0, axis=-1, keepdims=True)
    np.testing.assert_allclose(d0 @ np.array([1.0, 0.0]), -1.0, atol=1e-4)
    # prob-0 control: aligned WITH the root heading
    v2, inv2 = traj_gen.sample_traj(
        jax.random.PRNGKey(0), cfg.replace(heading_inversion_prob=0.0),
        init_pos, root_vel, bank)
    assert not np.asarray(inv2).any()
    d2 = np.asarray(v2[:, 1, :2] - v2[:, 0, :2])
    d2 = d2 / np.linalg.norm(d2, axis=-1, keepdims=True)
    np.testing.assert_allclose(d2 @ np.array([1.0, 0.0]), 1.0, atol=1e-4)

    # end-to-end: all-inverted valuenet training latches depressed targets
    def run(inv_prob):
        ecfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                         num_amp_obs_steps=3)
        ecfg = ecfg.replace(traj=ecfg.traj.replace(
            hybrid_init_prob=0.0, heading_inversion_prob=inv_prob))
        terrain = flat_terrain(extent=20.0, cell=0.1)
        lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
        env = PedestrianTerrainEnv(ecfg, terrain, lib,
                                   real_traj_bank=traj_gen
                                   .synthetic_real_bank(num_paths=8))
        agent = AMPAgent(env, AMPConfig(horizon=8, num_minibatches=2,
                                        mini_epochs=2, amp_batch_size=8,
                                        amp_replay_size=64))
        ts = agent.init(jax.random.PRNGKey(0))
        vnet = ValuePoseNet(use_pose=True, use_vel=True)
        trainer = LocoValTrainer(agent, vnet,
                                 ValueTrainConfig(horizon=8, step_to_pred=6))
        vts = trainer.init(ts, jax.random.PRNGKey(1))
        assert (np.asarray(vts.policy.env_state.inverted).mean()
                == (1.0 if inv_prob else 0.0))
        vts, m = trainer.train_epoch(vts)
        assert float(m["num_latched"]) > 0
        return float(m["mean_target"])

    t_inv, t_pos = run(1.0), run(0.0)
    # inverted returns are ×(−0.3): targets sit below the positive ones and
    # below the zero-return point of the [−10,100] normalization
    assert t_inv < t_pos
    assert t_inv < 10.0 / 110.0 + 1e-3


def test_cnn_network_variant():
    from emloco_tpu.learning.networks import AMPSeptCNNNet

    net = AMPSeptCNNNet(num_actions=69, self_obs_dim=378, traj_obs_dim=30,
                        task_obs_dim=30 + 16 * 16, sensor_res=16,
                        mlp_units=(64,), task_units=(32,), disc_units=(32,))
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (3, 378 + 30 + 256))
    amp = jax.random.normal(key, (3, 100))
    params = net.init(key, obs, amp)
    mu, sigma, v, d, tv = net.apply(params, obs, amp)
    assert mu.shape == (3, 69) and v.shape == (3,)
    assert np.all(np.isfinite(np.asarray(mu)))


def test_group_obs_and_velocity_map_env():
    from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
    from emloco_tpu.kinematics import motion_lib as ml
    from emloco_tpu.physics import flat_terrain

    cfg = EnvConfig(num_envs=4, sensor_res=8, num_amp_obs_steps=3,
                    group_obs=True, group_size=4, velocity_map=True)
    env = PedestrianTerrainEnv(cfg, flat_terrain(20.0),
                               ml.synthetic_walk_motions(speeds=(1.0,),
                                                         duration=2.0))
    st = env.reset(jax.random.PRNGKey(0))
    o = env.observe(st)
    assert o.shape == (4, env.obs_dim)
    assert env.task_obs_dim == 30 + 8 * 8 * 3 + 165
    assert np.all(np.isfinite(np.asarray(o)))


def test_flip_obs_group_and_velocity_map():
    """Symmetry-loss flip path covers group + velocity-map obs (regression:
    observe_flipped only handled [traj, 1-channel heightmap])."""
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3, velocity_map=True, group_obs=True,
                    group_size=4)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=1.5)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    st = env.reset(jax.random.PRNGKey(0))
    o = env.observe(st)
    f = env.observe_flipped(st)
    assert o.shape == f.shape == (4, env.obs_dim)
    assert np.isfinite(np.asarray(f)).all()
    # double flip of the task part restores it (flip is an involution on a
    # symmetric state representation): check the traj slice sign structure
    S = cfg.num_traj_samples
    base = cfg.self_obs_dim
    loc_o = np.asarray(o[:, base:base + 2 * S]).reshape(-1, S, 2)
    loc_f = np.asarray(f[:, base:base + 2 * S]).reshape(-1, S, 2)
    np.testing.assert_allclose(loc_f[..., 0], loc_o[..., 0], atol=1e-5)
    np.testing.assert_allclose(loc_f[..., 1], -loc_o[..., 1], atol=1e-5)
    # symmetry training runs end-to-end with these flags
    agent = AMPAgent(env, AMPConfig(horizon=4, num_minibatches=2,
                                    mini_epochs=1, amp_batch_size=8,
                                    amp_replay_size=64))
    ts = agent.init(jax.random.PRNGKey(1))
    ts, m = agent.train_epoch(ts)
    assert np.isfinite(float(m["total"]))


def test_obs_noise_reaches_training_rollout():
    """obs-noise DR must reach the policy's observations (regression: the
    training loop re-observed noise-free)."""
    def run(noise):
        cfg = EnvConfig(num_envs=4, terrain_obs=False, num_amp_obs_steps=3,
                        episode_length=24, obs_noise_std=noise)
        terrain = flat_terrain(extent=20.0, cell=0.1)
        lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=1.5)
        env = PedestrianTerrainEnv(cfg, terrain, lib)
        agent = AMPAgent(env, AMPConfig(horizon=4, num_minibatches=2,
                                        mini_epochs=1, amp_batch_size=8,
                                        amp_replay_size=64,
                                        motion_sym_loss=False))
        ts = agent.init(jax.random.PRNGKey(0))
        ts, m = agent.train_epoch(ts)
        return ts
    ts0 = run(0.0)
    ts1 = run(0.5)
    # identical seeds: any difference in learned params must come from the
    # noise actually reaching the training observations
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     ts0.params, ts1.params)
    assert max(jax.tree.leaves(d)) > 1e-7


def test_train_epoch_with_pointnet_and_amp_dropout():
    """Crowd pointnet (group obs) + whole-joint AMP dropout compile into the
    same single-epoch program (reference amp_network_sept_builder pointnet +
    amp_models.get_dropout_mask)."""
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3, group_obs=True, group_size=4)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    acfg = AMPConfig(horizon=4, num_minibatches=2, mini_epochs=2,
                     amp_batch_size=8, amp_replay_size=64, amp_dropout=True)
    agent = AMPAgent(env, acfg)
    assert agent.net.people_obs_dim == 165
    ts = agent.init(jax.random.PRNGKey(0))
    assert "point_net_0" in ts.params["params"]
    ts, metrics = agent.train_epoch(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_query_value_gradient():
    """Critic gradient flows back to a hypothetical trajectory through the
    spliced location obs (the reference hook left TODO,
    humanoid_pedestrain_terrain.py:353-374)."""
    agent = tiny_agent()
    ts = agent.init(jax.random.PRNGKey(0))
    st = ts.env_state
    n, S = agent.env.cfg.num_envs, agent.env.cfg.num_traj_samples
    traj = jnp.zeros((n, S, 3)).at[..., 0].add(
        jnp.linspace(0, 2, S)[None]) + st.physics.body_x[:, 0:1, :]
    v, g = agent.query_value_gradient(ts, st, traj)
    assert v.shape == (n,) and g.shape == (n, S, 3)
    assert np.isfinite(np.asarray(v)).all()
    gz = np.asarray(g)
    assert np.abs(gz[..., :2]).max() > 0  # xy gradient is live


def test_train_epoch_hidden_bf16():
    """Mixed-precision hidden matmuls train finitely and roughly track the
    f32 path (heads stay f32: PPO ratios and disc logits are sensitive)."""
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    acfg = AMPConfig(horizon=4, num_minibatches=2, mini_epochs=2,
                     amp_batch_size=8, amp_replay_size=64, hidden_bf16=True)
    agent = AMPAgent(env, acfg)
    ts = agent.init(jax.random.PRNGKey(0))
    # params remain f32 (dtype= casts activations only)
    k = ts.params["params"]["actor_mlp_0"]["kernel"]
    assert k.dtype == jnp.float32
    ts, m = agent.train_epoch(ts)
    for key, v in m.items():
        assert np.isfinite(float(v)), f"{key} not finite"


def test_cnn_agent_trains_end_to_end():
    """amp.network=sept_cnn wires the conv sensor encoder into the full
    agent (reference amp_network_sept_cnn_builder.py consumed via the
    network name in the train config): one compiled epoch on the 3-channel
    velocity-map image must run finite, and the conv params must exist."""
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3, velocity_map=True)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    acfg = AMPConfig(horizon=4, num_minibatches=2, mini_epochs=2,
                     amp_batch_size=8, amp_replay_size=64,
                     network="sept_cnn")
    agent = AMPAgent(env, acfg)
    ts = agent.init(jax.random.PRNGKey(0))
    assert any("cnn" in k for k in ts.params["params"])
    ts, m = agent.train_epoch(ts)
    assert all(np.isfinite(float(v)) for v in m.values()), m


def test_cnn_agent_rejects_non_square_sensor():
    import pytest

    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3, sensor_shape="fov")
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    with pytest.raises(ValueError):
        AMPAgent(env, AMPConfig(network="sept_cnn"))


def test_nonfinite_update_guard():
    """A minibatch whose gradients are nonfinite must not move params or
    optimizer state (pipeline_r4c3 regression: one pathological getup
    minibatch NaNed the params at epoch ~10 and the remaining 290 epochs
    trained a dead policy)."""
    agent = tiny_agent()
    ts = agent.init(jax.random.PRNGKey(0))
    obs = agent.env.observe(ts.env_state)
    m = 8
    k = jax.random.PRNGKey(1)
    mb = dict(
        obs_n=jnp.tile(obs[:1], (m, 1)),
        flip_obs_n=jnp.tile(obs[:1], (m, 1)),
        action=jnp.zeros((m, agent.env.cfg.num_actions)),
        logp=jnp.zeros((m,)),
        adv=jnp.ones((m,)),
        ret_n=jnp.zeros((m,)),
        ret_01=0.5 * jnp.ones((m,)),
        amp_n=jnp.tile(ts.replay_amp[:1], (m, 1)),
    )
    demo = jnp.zeros((4, agent.amp_dim))
    replay = jnp.zeros((2, agent.amp_dim))

    # clean minibatch: update applies
    p1, o1, met1 = agent._update_minibatch(ts.params, ts.opt_state, mb,
                                           demo, replay, k)
    assert float(met1["nonfinite_grad"]) == 0.0
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(ts.params)))
    assert moved

    # poisoned minibatch: NaN advantage → nonfinite grads → skipped update
    mb_bad = dict(mb, adv=mb["adv"].at[0].set(jnp.nan))
    p2, o2, met2 = agent._update_minibatch(ts.params, ts.opt_state, mb_bad,
                                           demo, replay, k)
    assert float(met2["nonfinite_grad"]) == 1.0
    # skipped minibatches must not leak NaN into the epoch's loss metrics
    assert all(np.isfinite(float(v)) for v in met2.values())
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(ts.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(o2),
                    jax.tree_util.tree_leaves(ts.opt_state)):
        if hasattr(a, "shape"):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_locoval_vru_waypoints():
    """VRU mode (reference --vru: 5 waypoints instead of 13,
    value_pose_net.py:36-44): the trainer slices the captured waypoint
    trajectory to the net's width and trains."""
    from emloco_tpu.learning.value_train import LocoValTrainer, ValueTrainConfig

    agent = tiny_agent()
    ts = agent.init(jax.random.PRNGKey(0))
    vnet = ValuePoseNet(use_pose=False, use_vel=True, num_waypoints=5)
    trainer = LocoValTrainer(agent, vnet,
                             ValueTrainConfig(horizon=8, step_to_pred=6))
    vts = trainer.init(ts, jax.random.PRNGKey(1))
    vts, metrics = trainer.train_epoch(vts)
    assert np.isfinite(float(metrics["vnet_loss"]))
    assert float(metrics["num_latched"]) > 0
    # the net really consumes 5 waypoints
    traj = jax.random.normal(jax.random.PRNGKey(2), (4, 5, 2))
    vel = jax.random.normal(jax.random.PRNGKey(3), (4, 2))
    v = vnet.apply(vts.vnet_params, traj, None, vel)
    assert v.shape == (4,)


def test_hard_negative_update_semantics():
    """hard_negative_update (reference update_sampling_weight,
    motion_lib_smpl.py:366-377): failing motions' sampling probability
    rises; unseen motions keep their success-rate estimate."""
    from emloco_tpu.kinematics.motion_lib import hard_negative_update

    succ = jnp.ones((3,))
    sampled = jnp.asarray([10.0, 10.0, 0.0])
    term = jnp.asarray([9.0, 1.0, 0.0])
    w, succ2, s0, t0 = hard_negative_update(succ, sampled, term)
    w, succ2 = np.asarray(w), np.asarray(succ2)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    assert w[0] > w[1] > w[2]          # 90% fail ≫ 10% fail > unseen
    np.testing.assert_allclose(succ2, [0.1, 0.9, 1.0], atol=1e-6)
    assert float(s0.sum()) == 0.0 and float(t0.sum()) == 0.0
    # reference-exact form: prob ∝ exp(−succ/0.2)
    expect = np.exp(-succ2 / 0.2)
    np.testing.assert_allclose(w, expect / expect.sum(), atol=1e-6)


def test_hard_negative_wired_through_training():
    """With cfg.hard_negative the trainer tracks per-motion episode
    outcomes, refreshes the live sampling weights each epoch, and resets
    the histories (VERDICT r3 item 4: previously dead code)."""
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=6,
                    num_amp_obs_steps=3, hard_negative=True)
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0, 2.0), duration=2.0)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    acfg = AMPConfig(horizon=8, num_minibatches=2, mini_epochs=1,
                     amp_batch_size=8, amp_replay_size=64)
    agent = AMPAgent(env, acfg)
    ts = agent.init(jax.random.PRNGKey(0))
    es = ts.env_state
    assert es.motion_weights is not None and es.cur_mid is not None
    np.testing.assert_allclose(np.asarray(es.motion_weights).sum(), 1.0,
                               atol=1e-5)
    ts, _ = agent.train_epoch(ts)
    es = ts.env_state
    w = np.asarray(es.motion_weights)
    assert w.shape == (2,) and np.isfinite(w).all()
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
    # episode_length 6 < horizon 8 → every env finished ≥1 episode, so the
    # refresh consumed the histories and zeroed them
    assert float(np.asarray(es.motion_sampled).sum()) == 0.0
    assert float(np.asarray(es.motion_term).sum()) == 0.0
    assert np.asarray(es.cur_mid).shape == (4,)
    assert set(np.asarray(es.cur_mid)) <= {0, 1}
    # success-rate estimates were actually written for sampled motions
    assert (np.asarray(es.motion_succ) <= 1.0).all()
