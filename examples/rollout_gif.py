"""Render a trajectory-following rollout to GIF with reward overlay
(the reference's env_save_video, base_task.py:799-844).

Run: python examples/rollout_gif.py  → rollout.gif
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.kinematics.visualization import animate_rollout
from emloco_tpu.physics import generate_mixed_terrain, body_frame_state

terrain = generate_mixed_terrain(map_length=6.0, num_tiles=2, difficulty=0.3)
lib = ml.synthetic_walk_motions(speeds=(1.2,))
cfg = EnvConfig(num_envs=2, sensor_res=16, episode_length=60,
                num_amp_obs_steps=3)
env = PedestrianTerrainEnv(cfg, terrain, lib)
state = env.reset(jax.random.PRNGKey(0))

frames, rewards = [], []
for t in range(60):
    state, out = env.step(state, jnp.zeros((2, cfg.num_actions)))
    pos, _, _, _ = body_frame_state(env.model, state.physics)
    frames.append(np.asarray(pos[0]))
    rewards.append(float(out.reward[0]))

path = animate_rollout(np.stack(frames), "rollout.gif",
                       rewards=np.asarray(rewards),
                       traj=np.asarray(state.traj_verts[0]))
print(path)
