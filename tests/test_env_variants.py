"""Getup and hand-task env variants — reference
humanoid_pedestrain_terrain_getup.py:21-204 and
humanoid_pedestrain_terrain_hand.py:28-149."""
import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.envs import traj_gen
from emloco_tpu.envs.getup import GetupEnvConfig, PedestrianTerrainGetupEnv
from emloco_tpu.envs.hand_task import PedestrianTerrainHandEnv
from emloco_tpu.envs.pedestrian_terrain import EnvConfig
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.physics import flat_terrain


def _world():
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=1.5)
    return terrain, lib


def test_getup_env_fall_bank_and_recovery():
    terrain, lib = _world()
    cfg = GetupEnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                         num_amp_obs_steps=3, fall_init_prob=1.0,
                         recovery_episode_prob=1.0, recovery_steps=10,
                         fall_gen_steps=30)
    env = PedestrianTerrainGetupEnv(cfg, terrain, lib)
    # fall bank: settled, finite, NOT upright (random orientations dropped)
    bank_z = np.asarray(env.fall_bank.root_pos[:, 2])
    assert np.isfinite(np.asarray(env.fall_bank.body_x)).all()
    assert bank_z.max() < 0.85  # below standing pelvis height (~0.92)

    st = env.reset(jax.random.PRNGKey(0))
    assert st.recovery_counter.shape == (4,)
    # force all envs to truncate this step: resets must draw fall states +
    # start recovery episodes
    st = st.replace(progress=jnp.full((4,), cfg.episode_length - 1,
                                      jnp.int32))
    st2, out = env.step(st, jnp.zeros((4, env.cfg.num_actions)))
    assert np.asarray(out.done).all()
    assert np.asarray(st2.recovery_counter).max() >= cfg.recovery_steps - 1
    assert np.isfinite(np.asarray(out.obs)).all()
    # during recovery the early-termination gate is off
    for _ in range(3):
        st2, out = env.step(st2, jnp.zeros((4, env.cfg.num_actions)))
        assert not np.asarray(out.terminated).any()


def test_getup_schedule_curriculum_compiled():
    """The curriculum must take effect in COMPILED execution: the probs are
    jnp scalars in GetupEnvState, not host attributes baked in at trace time
    (round-1 regression: same env object -> jit cache hit -> first-compile
    constants forever)."""
    terrain, lib = _world()
    n = 16
    cfg = GetupEnvConfig(num_envs=n, sensor_res=8, episode_length=24,
                         num_amp_obs_steps=3, fall_init_prob=0.5,
                         recovery_episode_prob=0.2, fall_gen_steps=20)
    env = PedestrianTerrainGetupEnv(cfg, terrain, lib)
    st = env.reset(jax.random.PRNGKey(0))
    # schedule scalars: early epochs force fall-init, late ones use cfg
    early = env.update_getup_schedule(st, epoch=0)
    assert float(early.fall_init_prob) == 1.0
    late = env.update_getup_schedule(st, epoch=10_000)
    assert float(late.fall_init_prob) == cfg.fall_init_prob

    # ONE compiled reset fn; flipping the schedule between calls must change
    # the fall-init fraction without retracing
    reset_all = jax.jit(lambda s: env._auto_reset(s, jnp.ones((n,), bool)))
    bank_z = np.asarray(env.fall_bank.root_pos[:, 2])

    on = reset_all(st.replace(fall_init_prob=jnp.float32(1.0)))
    off = reset_all(st.replace(fall_init_prob=jnp.float32(0.0)))
    np.testing.assert_allclose(np.asarray(on.physics.root_pos[:, 2]), bank_z,
                               atol=1e-5)      # every env drew the fall bank
    assert not np.allclose(np.asarray(off.physics.root_pos[:, 2]), bank_z)
    # fall-inits start recovery episodes; prob-0 resets don't
    assert np.asarray(on.recovery_counter).min() >= cfg.recovery_steps - 1
    off2 = reset_all(st.replace(fall_init_prob=jnp.float32(0.0),
                                recovery_episode_prob=jnp.float32(0.0)))
    assert np.asarray(off2.recovery_counter).max() == 0


def test_getup_fall_init_anchored_to_spawn():
    """Fall-bank states must be translated to the freshly-sampled spawn:
    the trajectory, LocoVal inputs and AMP window are anchored there.
    Regression: bank states used to keep their original spawn, so fall-init
    episodes started meters from their trajectory targets (loc reward ~0)
    and the 1024-env getup run NaN'd within ten epochs."""
    terrain, lib = _world()
    n = 8
    cfg = GetupEnvConfig(num_envs=n, sensor_res=8, episode_length=24,
                         num_amp_obs_steps=3, fall_gen_steps=20)
    env = PedestrianTerrainGetupEnv(cfg, terrain, lib)
    st = env.reset(jax.random.PRNGKey(7))
    reset_all = jax.jit(lambda s: env._auto_reset(s, jnp.ones((n,), bool)))

    on = reset_all(st.replace(fall_init_prob=jnp.float32(1.0)))
    off = reset_all(st.replace(fall_init_prob=jnp.float32(0.0)))
    # same rng path → same spawn sample; the fall-init root must sit AT the
    # normal reset's root xy (trajectory anchor), not at the bank's spawn
    np.testing.assert_allclose(np.asarray(on.physics.root_pos[:, :2]),
                               np.asarray(off.physics.root_pos[:, :2]),
                               atol=1e-4)
    bank_xy = np.asarray(env.fall_bank.root_pos[:, :2])
    assert not np.allclose(np.asarray(on.physics.root_pos[:, :2]), bank_xy)
    # the fall pose (not the discarded standing pose) feeds LocoVal + AMP
    assert not np.allclose(np.asarray(on.init_pose), np.asarray(off.init_pose))
    assert not np.allclose(np.asarray(on.amp_obs_hist),
                           np.asarray(off.amp_obs_hist))
    assert np.isfinite(np.asarray(on.init_pose)).all()


def test_hand_env_obs_and_reward():
    terrain, lib = _world()
    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3)
    env = PedestrianTerrainHandEnv(cfg, terrain, lib)
    assert env.task_obs_dim == cfg.task_obs_dim + 2
    st = env.reset(jax.random.PRNGKey(0))
    assert st.hand_targets.shape == (4, 2)
    o = env.observe(st)
    assert o.shape == (4, env.obs_dim)
    # targets sit right after the location obs slice
    S = cfg.num_traj_samples
    got = np.asarray(o[:, cfg.self_obs_dim + 2 * S:
                       cfg.self_obs_dim + 2 * S + 2])
    np.testing.assert_allclose(got, np.asarray(st.hand_targets), atol=1e-5)
    st2, out = env.step(st, jnp.zeros((4, env.cfg.num_actions)))
    assert out.reward_raw.shape == (4, 2)        # [loc_r, hand_r]
    r = np.asarray(out.reward)
    lr = np.asarray(out.reward_raw[:, 0])
    hr = np.asarray(out.reward_raw[:, 1])
    np.testing.assert_allclose(r, 0.6 * lr + 0.4 * hr, atol=1e-5)
    # targets persist within an episode, resample on done
    assert np.allclose(np.asarray(st2.hand_targets),
                       np.asarray(st.hand_targets))


def test_getup_env_with_self_contact():
    """Getup + intra-humanoid contact (the regime self-contact exists for):
    fall-bank generation and recovery stepping stay finite with the flag on."""
    from emloco_tpu.physics.types import EngineConfig

    terrain, lib = _world()
    cfg = GetupEnvConfig(num_envs=2, sensor_res=8, episode_length=12,
                         num_amp_obs_steps=3, fall_init_prob=1.0,
                         recovery_episode_prob=1.0, recovery_steps=6,
                         fall_gen_steps=20,
                         engine=EngineConfig(self_contact=True))
    env = PedestrianTerrainGetupEnv(cfg, terrain, lib)
    assert np.isfinite(np.asarray(env.fall_bank.body_x)).all()
    st = env.reset(jax.random.PRNGKey(0))
    for _ in range(3):
        st, out = env.step(st, jnp.zeros((2, env.cfg.num_actions)))
        assert np.isfinite(np.asarray(out.obs)).all()


def test_getup_reward_weight_schedule_compiled():
    """Getup reward-weight curriculum (reference pre_epoch,
    amp_continuous.py:212-220): flipping the schedule on the SAME agent
    object (cached compiled epoch) must change the reward combine actually
    used — disc-only during the fall phase, cfg mix after. Pre-fix the
    weights were static cfg fields baked in at first compile."""
    from emloco_tpu.learning.amp_agent import AMPAgent, AMPConfig

    terrain, lib = _world()
    cfg = GetupEnvConfig(num_envs=4, sensor_res=8, episode_length=12,
                         num_amp_obs_steps=3, getup_update_epoch=5)
    env = PedestrianTerrainGetupEnv(cfg, terrain, lib)
    agent = AMPAgent(env, AMPConfig(horizon=4, num_minibatches=2,
                                    mini_epochs=1, amp_batch_size=8,
                                    amp_replay_size=32))
    ts = agent.init(jax.random.PRNGKey(0))

    early = agent.update_getup_reward_schedule(ts, epoch=0, update_epoch=5)
    assert float(early.task_reward_w) == 0.0
    assert float(early.disc_reward_w) == 1.0
    late = agent.update_getup_reward_schedule(ts, epoch=6, update_epoch=5)
    assert float(late.task_reward_w) == agent.cfg.task_reward_w

    # compiled-path check: same jitted epoch, same rng/state, only the
    # traced weights differ -> the combined-reward metric must differ
    _, m_early = agent.train_epoch(early)
    _, m_late = agent.train_epoch(late)
    assert float(m_early["combined_reward"]) != float(
        m_late["combined_reward"])
