"""Minimal engine demo: a batch of humanoids holds the rest pose under
Stable-PD on flat ground (isaacgym examples/joint_monkey.py spirit).

Run: python examples/standing_humanoid.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.kinematics import body_model as bm
from emloco_tpu.ops import quat
from emloco_tpu.physics import (EngineConfig, build_model, default_tree,
                                flat_terrain, kinematic_state, step)

N = 16
tree = default_tree()
model = build_model(bm.build_body_params(jnp.zeros((N, 16))))
terrain = flat_terrain(extent=10.0, cell=0.1)

state = kinematic_state(
    model, tree,
    root_pos=jnp.tile(jnp.array([0.0, 0.0, 0.93]), (N, 1)),
    root_rot=quat.identity_like((N,)),
    local_rot=quat.identity_like((N, 24)),
)

cfg = EngineConfig()
pd_target = jnp.zeros((N, 23, 3))          # hold the rest pose

for t in range(60):                         # 2 s at 30 Hz
    state = step(model, terrain, state, pd_target, cfg, tree)

z = np.asarray(state.root_pos[:, 2])
fz = np.asarray(state.contact_force[..., 2].sum(-1))
print(f"pelvis height: {z.mean():.3f} m (std {z.std():.4f})")
print(f"total vertical contact force: {fz.mean():.0f} N "
      f"(body weight = {float(model.params.mass.sum(-1)[0]) * 9.81:.0f} N)")
