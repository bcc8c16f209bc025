"""Getup variant: fall-state initialization + recovery episodes.

Semantic rebuild of HumanoidPedestrianTerrainGetup
(/root/reference/pacer/pacer/env/tasks/humanoid_pedestrain_terrain_getup.py:
21-204):
  * a fall-state bank is generated once at init: random root orientations on
    the terrain, zero dof state, random actions, simulated 150 steps until
    settled (_generate_fall_states, :65-174)
  * resets draw from the fall bank with prob fall_init_prob; those episodes
    are "recovery episodes" for recovery_steps during which early termination
    is disabled (_update_recovery_count gating, :176-204)
  * a curriculum schedule ramps from always-fall-init to the target
    probabilities after getup_update_epoch epochs (update_getup_schedule,
    :50-56)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..kinematics import body_model as bm
from ..ops import quat
from ..physics import kinematic_state, step as physics_step
from .pedestrian_terrain import EnvConfig, EnvState, PedestrianTerrainEnv


class GetupEnvConfig(EnvConfig):
    recovery_episode_prob: float = struct.field(pytree_node=False,
                                                default=0.2)
    recovery_steps: int = struct.field(pytree_node=False, default=60)
    fall_init_prob: float = struct.field(pytree_node=False, default=0.1)
    fall_gen_steps: int = struct.field(pytree_node=False, default=150)
    # epochs of always-fall-init before the target probabilities kick in
    # (reference getup_udpate_epoch, humanoid_pedestrain_terrain_getup.py:50)
    getup_update_epoch: int = struct.field(pytree_node=False, default=5000)


class GetupEnvState(EnvState):
    recovery_counter: jnp.ndarray = None   # (N,) int32
    # curriculum probabilities live IN the traced state: the env object is a
    # static jit argument, so host-float attributes would be baked into the
    # first-compiled executable and later schedule updates silently ignored
    fall_init_prob: jnp.ndarray = None          # () f32
    recovery_episode_prob: jnp.ndarray = None   # () f32


class PedestrianTerrainGetupEnv(PedestrianTerrainEnv):
    """Fall-state bank lives on device; resets mix normal and fall inits."""

    def __init__(self, cfg: GetupEnvConfig, terrain, motion_lib, **kw):
        super().__init__(cfg, terrain, motion_lib, **kw)
        self.fall_bank = self._generate_fall_states(jax.random.PRNGKey(1234))

    def update_getup_schedule(self, state: "GetupEnvState", epoch: int,
                              update_epoch: int | None = None
                              ) -> "GetupEnvState":
        """Curriculum: always fall-init until update_epoch (default:
        cfg.getup_update_epoch), then the target probabilities (reference
        update_getup_schedule, humanoid_pedestrain_terrain_getup.py:50-56).
        Returns a new state — the probabilities are jnp scalars consumed by
        the compiled step, so the update takes effect without retracing."""
        if update_epoch is None:
            update_epoch = self.cfg.getup_update_epoch
        early = epoch <= update_epoch
        return state.replace(
            fall_init_prob=jnp.float32(
                1.0 if early else self.cfg.fall_init_prob),
            recovery_episode_prob=jnp.float32(
                0.0 if early else self.cfg.recovery_episode_prob))

    def _generate_fall_states(self, key):
        """Drop randomly-oriented humanoids and let them settle."""
        cfg = self.cfg
        n = cfg.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        root_rot = quat.normalize(jax.random.normal(k1, (n, 4)))
        spawn_xy = self._sample_spawn(k2, n)
        from ..physics import height_at
        ground = height_at(self.terrain, spawn_xy)
        root_pos = jnp.concatenate(
            [spawn_xy, (ground + 0.6)[:, None]], -1)
        local = quat.identity_like((n, bm.NUM_BODIES)).at[:, 0].set(root_rot)
        st = kinematic_state(self.model, self.tree, root_pos, root_rot, local)
        actions = jax.random.uniform(k3, (n, bm.NUM_JOINTS, 3),
                                     minval=-0.5, maxval=0.5)
        pd = actions * self.pd_action_scale[None]

        def body(s, _):
            return physics_step(self.model, self.terrain, s, pd,
                                cfg.engine, self.tree), None

        st, _ = jax.lax.scan(body, st, None,
                             length=cfg.fall_gen_steps // cfg.engine.n_substeps)
        return st

    def reset(self, key) -> GetupEnvState:
        base = super().reset(key)
        n = self.cfg.num_envs
        return GetupEnvState(
            **{f: getattr(base, f) for f in base.__dataclass_fields__},
            recovery_counter=jnp.zeros((n,), jnp.int32),
            fall_init_prob=jnp.float32(self.cfg.fall_init_prob),
            recovery_episode_prob=jnp.float32(self.cfg.recovery_episode_prob),
        )

    def _auto_reset(self, state, done):
        cfg = self.cfg
        n = cfg.num_envs
        key, k_fall, k_rec = jax.random.split(state.rng, 3)
        new_state = super()._auto_reset(state.replace(rng=key), done)

        # swap a fraction of resets to fall-bank states
        use_fall = (jax.random.uniform(k_fall, (n,)) < state.fall_init_prob) \
            & done

        # translate each bank state to the env's freshly-sampled spawn (the
        # trajectory, LocoVal inputs and AMP window are all anchored there).
        # Without this, fall-init episodes started at the bank's original
        # spawn while their trajectory targets stayed at the new one — the
        # location reward collapsed to ~0 and first-contact violence at the
        # mismatched terrain drove power |τ·q̇| two orders of magnitude up,
        # NaN-ing the 1024-env training run within ten epochs.
        from ..physics import height_at
        bank = self.fall_bank
        bank_xy = bank.root_pos[:, :2]
        new_xy = new_state.physics.root_pos[:, :2]
        dz = height_at(self.terrain, new_xy) - height_at(self.terrain,
                                                         bank_xy)
        delta = jnp.concatenate([new_xy - bank_xy, dz[:, None]], -1)
        fall_physics = bank.replace(
            root_pos=bank.root_pos + delta,
            body_x=bank.body_x + delta[:, None])

        def pick(a, b):
            d = use_fall.reshape((n,) + (1,) * (a.ndim - 1))
            return jnp.where(d, a, b)

        physics = jax.tree.map(pick, fall_physics, new_state.physics)

        # fall-init episodes: AMP window and LocoVal init pose/vel must
        # describe the FALL state, not the discarded standing reset
        amp_fall = self._amp_obs_single(physics)
        hist_fall = jnp.tile(amp_fall[:, None], (1, cfg.num_amp_obs_steps, 1))
        wp, pose, vel = self._capture_locoval_inputs(physics,
                                                     new_state.traj_verts)

        # recovery episodes: grace period without termination. Counter is set
        # on (fall or recovery) resets and decays each step
        # (_update_recovery_count, reference :176-204).
        recov = (jax.random.uniform(k_rec, (n,))
                 < state.recovery_episode_prob) & done
        counter = jnp.maximum(state.recovery_counter - 1, 0)
        counter = jnp.where((use_fall | recov) & done,
                            jnp.int32(cfg.recovery_steps), counter)
        counter = jnp.where(done & ~(use_fall | recov), 0, counter)
        return new_state.replace(
            physics=physics,
            amp_obs_hist=pick(hist_fall, new_state.amp_obs_hist),
            waypoint_traj=pick(wp, new_state.waypoint_traj),
            init_pose=pick(pose, new_state.init_pose),
            init_vel=pick(vel, new_state.init_vel),
            recovery_counter=counter)

    def _termination_allowed(self, state):
        return state.recovery_counter <= 0
