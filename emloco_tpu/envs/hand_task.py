"""Hand-height variant: trajectory following + per-hand height targets.

Semantic rebuild of HumanoidPedestrianTerrainHand
(/root/reference/pacer/pacer/env/tasks/humanoid_pedestrain_terrain_hand.py:
28-249): task obs gains the 2 target heights; reward =
0.6·exp(−2‖Δxy‖²) + 0.4·exp(−6·Σ(hand_rel_height − target)²); targets are
resampled uniform [0,1) at episode reset (:121-127).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..kinematics import body_model as bm
from ..physics import body_frame_state
from . import traj_gen
from .pedestrian_terrain import EnvConfig, EnvState, PedestrianTerrainEnv

HAND_IDS = np.array([bm.BODY_NAMES.index("L_Hand"),
                     bm.BODY_NAMES.index("R_Hand")])


class HandEnvState(EnvState):
    hand_targets: jnp.ndarray = None   # (N, 2) relative target heights


class PedestrianTerrainHandEnv(PedestrianTerrainEnv):

    @property
    def _task_extra_dim(self):
        return 2

    def reset(self, key) -> HandEnvState:
        base = super().reset(key)
        k = jax.random.fold_in(key, 77)
        n = self.cfg.num_envs
        return HandEnvState(
            **{f: getattr(base, f) for f in base.__dataclass_fields__},
            hand_targets=jax.random.uniform(k, (n, 2)),
        )

    def _task_obs(self, state):
        base = super()._task_obs(state)
        cfg = self.cfg
        S = cfg.num_traj_samples
        # insert targets after the location obs (reference _compute_task_obs
        # appends tar_hand_height right after loc_obs, :129-134)
        return jnp.concatenate(
            [base[:, :2 * S], state.hand_targets, base[:, 2 * S:]], -1)

    def _flip_task_extra(self, extra):
        # mirrored body swaps left/right hand targets
        return extra[:, ::-1]

    def _auto_reset(self, state, done):
        new_state = super()._auto_reset(state, done)
        k = jax.random.fold_in(new_state.rng, 78)
        fresh = jax.random.uniform(k, state.hand_targets.shape)
        targets = jnp.where(done[:, None], fresh, state.hand_targets)
        return new_state.replace(hand_targets=targets)

    def _reward(self, state, physics, progress, pd_target):
        cfg = self.cfg
        times = progress.astype(jnp.float32) * cfg.dt
        tar = traj_gen.calc_pos(state.traj_verts, times, cfg.traj.episode_dur)
        pos, _, _, _ = body_frame_state(self.model, physics)
        root = pos[:, 0]
        err = jnp.sum((tar[:, :2] - root[:, :2]) ** 2, -1)
        loc_r = jnp.exp(-2.0 * err)
        hand_rel = pos[:, jnp.asarray(HAND_IDS), 2] - root[:, None, 2]
        h_err = jnp.sum((hand_rel - state.hand_targets) ** 2, -1)
        hand_r = jnp.exp(-6.0 * h_err)
        reward = 0.6 * loc_r + 0.4 * hand_r
        return reward, jnp.stack([loc_r, hand_r], -1)
