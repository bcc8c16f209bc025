"""joint_monkey equivalent (isaacgym examples/joint_monkey.py): cycle each
joint's PD target through a sine sweep, one joint at a time, on a floating
(gravity-free) humanoid, and render the sweep to GIF.

Run: python examples/joint_sweep_gif.py  → joint_sweep.gif
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from emloco_tpu.kinematics import body_model as bm
from emloco_tpu.kinematics.visualization import animate_rollout
from emloco_tpu.ops import quat
from emloco_tpu.physics import (EngineConfig, body_frame_state, build_model,
                                default_tree, flat_terrain, kinematic_state,
                                step)

tree = default_tree()
model = build_model(bm.build_body_params(jnp.zeros((1, 16))))
terrain = flat_terrain(extent=10.0, cell=0.1)
cfg = EngineConfig(gravity=0.0)           # float like the reference viewer

state = kinematic_state(
    model, tree,
    root_pos=jnp.array([[0.0, 0.0, 1.2]]),
    root_rot=quat.identity_like((1,)),
    local_rot=quat.identity_like((1, 24)),
)

STEPS_PER_JOINT = 20
frames = []
for j in range(23):                        # 23 spherical joints
    for t in range(STEPS_PER_JOINT):
        ang = 0.6 * np.sin(2 * np.pi * t / STEPS_PER_JOINT)
        tgt = jnp.zeros((1, 23, 3)).at[0, j, 0].set(ang)
        state = step(model, terrain, state, tgt, cfg, tree)
        pos, _, _, _ = body_frame_state(model, state)
        frames.append(np.asarray(pos[0]))

path = animate_rollout(np.stack(frames), "joint_sweep.gif", fps=20)
print(path)
