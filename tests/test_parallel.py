"""Multi-device data-parallel training on the virtual 8-device CPU mesh.

Reference counterpart: the Horovod multi-GPU path (run.py:57-72, allreduce in
amp_continuous.py:268-301). Here: env-axis NamedSharding + jit → XLA
collectives; results must match the unsharded run bit-for-... well, to fp32
reduction tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv, traj_gen
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.learning.amp_agent import AMPAgent, AMPConfig
from emloco_tpu.parallel.mesh import make_mesh, pmean_metrics, shard_env_axis
from emloco_tpu.physics import flat_terrain


def _agent(num_envs):
    terrain = flat_terrain(extent=20.0, cell=0.1)
    lib = ml.synthetic_walk_motions(speeds=(1.0,), duration=1.5)
    cfg = EnvConfig(num_envs=num_envs, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3, terrain_obs=True)
    env = PedestrianTerrainEnv(cfg, terrain, lib,
                               real_traj_bank=traj_gen.synthetic_real_bank(8))
    return AMPAgent(env, AMPConfig(horizon=4, num_minibatches=2,
                                   mini_epochs=1, amp_batch_size=16,
                                   amp_replay_size=64))


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("env",)


def test_sharded_epoch_matches_unsharded():
    n = 16
    agent = _agent(n)
    ts0 = agent.init(jax.random.PRNGKey(0))

    ts_ref, m_ref = agent.train_epoch(ts0)

    mesh = make_mesh(8)
    ts_sh = shard_env_axis(ts0, mesh, n)
    # env-state leaves actually land on the env axis
    sh = ts_sh.env_state.physics.root_pos.sharding
    assert sh.spec == jax.sharding.PartitionSpec("env")
    assert ts_sh.params["params"]["log_sigma"].sharding.spec == \
        jax.sharding.PartitionSpec()
    with mesh:
        ts_sh, m_sh = agent.train_epoch(ts_sh)

    for k in m_ref:
        np.testing.assert_allclose(float(m_ref[k]), float(m_sh[k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)
    # params agree after one update
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     ts_ref.params, ts_sh.params)
    assert max(jax.tree.leaves(d)) < 2e-4


def test_pmean_metrics_shape():
    mesh = make_mesh(8)

    from jax.sharding import PartitionSpec as P

    def f(x):
        return pmean_metrics({"m": x.mean()})

    g = jax.shard_map(f, mesh=mesh, in_specs=P("env"), out_specs=P())
    out = g(jnp.arange(16.0))
    assert abs(float(out["m"]) - 7.5) < 1e-6


def test_sharded_predictor_epoch_matches_unsharded():
    """Batch-axis data parallelism for the predictor (the reference's torch
    DataParallel, train_jta.py:392): one scanned epoch sharded over the
    8-device mesh must match the unsharded update."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from emloco_tpu.prediction.data import SyntheticScenes
    from emloco_tpu.prediction.model import TransMotionConfig
    from emloco_tpu.prediction.train import (PredictTrainConfig,
                                             PredictorTrainer)

    mcfg = TransMotionConfig(nhid=16, nhead=2, dim_ff=32, nlayers_local=2,
                             nlayers_global=1, nmode=3, dropout=0.0)
    trainer = PredictorTrainer(mcfg, PredictTrainConfig())
    ds = SyntheticScenes(num_people=3, seed=0)
    bs = list(ds.batches(8, 2))
    stacks = [jnp.asarray(np.stack([b[i] for b in bs])) for i in range(5)]
    ts0 = trainer.init(jax.random.PRNGKey(0), bs[0])

    ts_ref, loss_ref = trainer._fit_epoch(ts0, *stacks)

    mesh = make_mesh(8, axis="batch")
    sh = NamedSharding(mesh, P(None, "batch"))
    stacks_sh = [jax.device_put(s, sh) for s in stacks]
    ts_sh = jax.device_put(ts0, NamedSharding(mesh, P()))
    with mesh:
        ts_sh, loss_sh = trainer._fit_epoch(ts_sh, *stacks_sh)

    np.testing.assert_allclose(float(loss_ref), float(loss_sh),
                               rtol=2e-3, atol=2e-3)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     ts_ref.params, ts_sh.params)
    assert max(jax.tree.leaves(d)) < 2e-4


def test_shard_env_axis_rejects_non_divisible():
    """20 envs over 8 devices: crisp error, not silent mis-sharding
    (VERDICT r2 weak #6 — the classic sharding edge)."""
    import pytest

    agent = _agent(20)
    ts0 = agent.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        shard_env_axis(ts0, mesh, 20)


def test_sharded_epoch_at_reference_scale_shape():
    """1,600 envs over 8 devices — the reference's actual env count
    (pacer.yaml:10) — shards, steps, and produces finite metrics with
    the env axis genuinely distributed (200 envs/device)."""
    n = 1600
    agent = _agent(n)
    ts0 = agent.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    ts_sh = shard_env_axis(ts0, mesh, n)
    sh = ts_sh.env_state.physics.root_pos.sharding
    assert sh.spec == jax.sharding.PartitionSpec("env")
    # each device holds exactly n/8 rows
    shard_shapes = {s.data.shape[0] for s in
                    ts_sh.env_state.physics.root_pos.addressable_shards}
    assert shard_shapes == {n // 8}
    with mesh:
        ts_sh, m = agent.train_epoch(ts_sh)
    assert all(np.isfinite(float(v)) for v in m.values())
    # state stays env-sharded through the compiled epoch (no silent
    # gather-to-replicated regression)
    out_sh = ts_sh.env_state.physics.root_pos.sharding
    assert out_sh.spec == jax.sharding.PartitionSpec("env")


def test_shard_env_axis_replicates_colliding_buffers():
    """The replay buffer and the hard-negative motion tables must REPLICATE
    even when their leading dim equals num_envs (VERDICT r3 weak #2: the
    old leading-dim heuristic silently env-sharded them). Placement is by
    field path now; this pins the collision case."""
    n = 16
    terrain = flat_terrain(extent=20.0, cell=0.1)
    # motion count == num_envs: the collision case for motion_weights
    lib = ml.synthetic_walk_motions(speeds=tuple(1.0 + 0.05 * i
                                                 for i in range(n)),
                                    duration=1.5)
    cfg = EnvConfig(num_envs=n, sensor_res=8, episode_length=24,
                    num_amp_obs_steps=3, hard_negative=True)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    # replay size == num_envs: the collision case for replay_amp
    agent = AMPAgent(env, AMPConfig(horizon=4, num_minibatches=2,
                                    mini_epochs=1, amp_batch_size=8,
                                    amp_replay_size=n))
    ts0 = agent.init(jax.random.PRNGKey(0))
    assert ts0.replay_amp.shape[0] == n
    assert ts0.env_state.motion_weights.shape[0] == n

    mesh = make_mesh(8)
    ts_sh = shard_env_axis(ts0, mesh, n)
    P = jax.sharding.PartitionSpec
    # per-env leaves sharded
    assert ts_sh.env_state.physics.root_pos.sharding.spec == P("env")
    assert ts_sh.env_state.cur_mid.sharding.spec == P("env")
    # colliding non-env leaves replicated
    assert ts_sh.replay_amp.sharding.spec == P()
    assert ts_sh.env_state.motion_weights.sharding.spec == P()
    assert ts_sh.env_state.motion_sampled.sharding.spec == P()
    # and a sharded epoch still runs end-to-end with finite outputs
    with mesh:
        ts_sh, m = agent.train_epoch(ts_sh)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
