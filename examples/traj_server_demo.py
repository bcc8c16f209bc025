"""Interactive trajectory-input server demo (the reference's server mode,
traj_generator.input_new_trajs :242-258).

Run: python examples/traj_server_demo.py
Then from another shell:
    curl -X POST localhost:8702/trajs -d '[[[0,0],[1,0],[2,0],[3,1]]]'
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time
import urllib.request

import jax
import jax.numpy as jnp

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
from emloco_tpu.envs.traj_gen import synthetic_real_bank
from emloco_tpu.envs.traj_server import TrajInputServer, update_traj_bank
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.physics import flat_terrain

srv = TrajInputServer(port=8702)
print(f"listening on :{srv.port} — POST /trajs with [[x,y],...] lists")

terrain = flat_terrain(extent=20.0)
lib = ml.synthetic_walk_motions(speeds=(1.2,))
cfg = EnvConfig(num_envs=4, sensor_res=16, episode_length=48,
                num_amp_obs_steps=3)
bank = synthetic_real_bank(num_paths=16)
env = PedestrianTerrainEnv(cfg, terrain, lib, real_traj_bank=bank)
state = env.reset(jax.random.PRNGKey(0))

# demo client: submit one straight path
req = urllib.request.Request(
    f"http://127.0.0.1:{srv.port}/trajs",
    data=json.dumps([[[0.1 * i, 0.0] for i in range(13)]]).encode())
print(urllib.request.urlopen(req).read().decode())

ptr = 0
for step in range(120):
    # between compiled steps, drain new trajectories into the bank
    new = srv.drain()
    if len(new):
        bank, ptr = update_traj_bank(bank, new, ptr)
        env.real_traj_bank = bank
        print(f"step {step}: swapped in {len(new)} new trajectories")
    state, out = env.step(state, jnp.zeros((4, cfg.num_actions)))
    time.sleep(0.01)
srv.close()
print("done")
