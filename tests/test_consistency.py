"""Sim-vs-kinematics consistency harness.

The reference's strongest physics oracle (HACK_CONSISTENCY_TEST,
humanoid_amp.py:40-44, 753-812): pose the simulator kinematically from
motion-library states and check that AMP observations derived from SIM state
match AMP observations computed directly from the MOTION LIBRARY. This
validates the whole chain FK → engine state → body/joint readback → obs
kernels against the independent motion-data path.
"""
import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.envs import observations as obs_mod
from emloco_tpu.kinematics import body_model as bm
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.physics import (
    body_frame_state,
    build_model,
    default_tree,
    joint_state,
    kinematic_state,
)

TREE = default_tree()


def _amp_from_motion(lib, ids, times):
    ms = ml.get_motion_state(lib, ids, times)
    return obs_mod.amp_obs(ms["root_pos"], ms["root_rot"], ms["root_vel"],
                           ms["root_ang_vel"], ms["dof_pos"], ms["dof_vel"],
                           ms["key_pos"])


def _amp_from_sim(model, lib, ids, times):
    ms = ml.get_motion_state(lib, ids, times)
    st = kinematic_state(
        model, TREE, ms["root_pos"], ms["root_rot"], ms["local_rot"],
        root_vel=ms["root_vel"], root_ang_vel=ms["root_ang_vel"],
        dof_vel=ms["dof_vel"])
    pos, rot, vel, ang = body_frame_state(model, st)
    dof_pos, dof_vel = joint_state(model, st)
    key_pos = pos[:, jnp.asarray(obs_mod.KEY_BODY_IDS)]
    return obs_mod.amp_obs(pos[:, 0], rot[:, 0], vel[:, 0], ang[:, 0],
                           dof_pos, dof_vel, key_pos)


def test_sim_kinematics_amp_obs_consistency():
    lib = ml.synthetic_walk_motions(speeds=(1.0, 1.8))
    params = bm.build_body_params(jnp.zeros((8, 16)))
    model = build_model(params)
    key = jax.random.PRNGKey(0)
    ids = ml.sample_motions(lib, key, 8)
    times = ml.sample_time(lib, jax.random.fold_in(key, 1), ids,
                           truncate_time=0.2) + 0.1

    a_motion = np.asarray(_amp_from_motion(lib, ids, times))
    a_sim = np.asarray(_amp_from_sim(model, lib, ids, times))
    assert a_motion.shape == a_sim.shape
    # positions/rotations (first 13 + dof obs) must agree tightly; velocity
    # features agree to finite-difference tolerance
    err = np.abs(a_motion - a_sim)
    # layout: [rot 6, vel 3, angvel 3, dof_obs 114, dof_vel 57, key 12]
    # (no root_h slot — ampRootHeightObs False, humanoid_amp.py:67)
    pos_like = np.concatenate([err[:, 0:6], err[:, 12:126], err[:, 183:195]],
                              axis=1)
    vel_like = np.concatenate([err[:, 6:12], err[:, 126:183]], axis=1)
    assert pos_like.max() < 5e-3, f"pose mismatch {pos_like.max():.5f}"
    assert vel_like.max() < 0.5, f"velocity mismatch {vel_like.max():.3f}"


def test_kinematic_state_roundtrip_dof():
    """joint_state inverts kinematic_state's dof inputs."""
    lib = ml.synthetic_walk_motions(speeds=(1.2,))
    params = bm.build_body_params(jnp.zeros((4, 16)))
    model = build_model(params)
    ids = jnp.zeros((4,), jnp.int32)
    times = jnp.array([0.1, 0.5, 1.0, 1.5])
    ms = ml.get_motion_state(lib, ids, times)
    st = kinematic_state(model, TREE, ms["root_pos"], ms["root_rot"],
                         ms["local_rot"], dof_vel=ms["dof_vel"])
    dof_pos, dof_vel = joint_state(model, st)
    np.testing.assert_allclose(np.asarray(dof_pos), np.asarray(ms["dof_pos"]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dof_vel), np.asarray(ms["dof_vel"]),
                               atol=1e-3)
