"""Smallest end-to-end training loop: world → PPO+AMP agent → epochs.

Run: python examples/train_minimal.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
from emloco_tpu.envs.traj_gen import synthetic_real_bank
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.learning.amp_agent import AMPAgent, AMPConfig
from emloco_tpu.physics import generate_mixed_terrain

terrain = generate_mixed_terrain(map_length=6.0, num_tiles=2, difficulty=0.5)
lib = ml.synthetic_walk_motions(speeds=(1.0, 1.5, 2.0))
cfg = EnvConfig(num_envs=64, sensor_res=16, episode_length=96,
                num_amp_obs_steps=5)
env = PedestrianTerrainEnv(cfg, terrain, lib,
                           real_traj_bank=synthetic_real_bank(num_paths=32))
agent = AMPAgent(env, AMPConfig(horizon=16, num_minibatches=4, mini_epochs=3,
                                amp_batch_size=128, amp_replay_size=4096))
ts = agent.init(jax.random.PRNGKey(0))
for ep in range(20):
    ts, m = agent.train_epoch(ts)
    print(f"[{ep:03d}] loc={float(m['loc_reward']):.3f} "
          f"disc={float(m['disc_reward']):.3f} "
          f"d_loss={float(m['d_loss']):.3f} "
          f"done%={100 * float(m['episode_done_frac']):.1f}")
