"""HumanoidPedestrianTerrain — the main EmLoco environment, TPU-native.

Semantic rebuild of the reference env
(/root/reference/pacer/pacer/env/tasks/humanoid_pedestrain_terrain.py):
trajectory following over procedural terrain with a heightmap sensor,
location+power reward, contact/height early termination and motion-library
resets with random heading — BUT structured as pure functions over pytrees:

  reset(key)             → EnvState
  step(state, actions)   → (EnvState, StepOutput)

Auto-reset happens INSIDE step with `where` masks (the reference resets
between steps with indexed tensor setters from the host, humanoid.py:467-481;
here the whole rollout compiles into one lax.scan with no host round-trips —
that host-sync per step is exactly where the reference pays its throughput).

Config cross-references (reference pacer/pacer/data/cfg/pacer.yaml):
episodeLength 168, numTrajSamples 15, trajSampleTimestep 0.4, stepToPred 144,
speedMin/Max 0.0005/3.0, accelMax 2.0, sharpTurnProb 0.02, sensor 32×32 ±2 m,
power_coefficient 5e-4, terminationHeight 0.15, keyBodies ankles+wrists,
contactBodies ankles+toes.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..kinematics import body_model as bm
from ..kinematics import motion_lib as ml
from ..ops import quat
from ..physics import (
    EngineConfig,
    Heightfield,
    Model,
    PhysicsState,
    body_frame_state,
    build_model,
    default_tree,
    height_at,
    joint_state,
    kinematic_state,
    step as physics_step,
)
from . import observations as obs
from . import traj_gen


class DRConfig(struct.PyTreeNode):
    """Scheduled physical-property domain randomization (reference
    apply_randomizations, base_task.py:547-787): per-env multiplicative
    scales on mass/PD gains/friction and an additive contact rest-offset,
    re-sampled at env reset no more often than `frequency` env steps, with
    a linear intensity ramp over `schedule_steps` (the reference's
    'linear' schedule). All static so the flag set compiles into the step."""

    enabled: bool = struct.field(pytree_node=False, default=False)
    mass_range: tuple = struct.field(pytree_node=False, default=(0.8, 1.2))
    kp_range: tuple = struct.field(pytree_node=False, default=(0.85, 1.15))
    kd_range: tuple = struct.field(pytree_node=False, default=(0.85, 1.15))
    friction_range: tuple = struct.field(pytree_node=False,
                                         default=(0.7, 1.3))
    # additive delta on capsule radius (the rigid-shape rest-offset analog)
    rest_offset_range: tuple = struct.field(pytree_node=False,
                                            default=(-0.005, 0.005))
    frequency: int = struct.field(pytree_node=False, default=128)
    schedule_steps: int = struct.field(pytree_node=False, default=0)


NUM_DR_PROPS = 5  # [mass, kp, kd, friction, rest_offset]


class EnvConfig(struct.PyTreeNode):
    num_envs: int = struct.field(pytree_node=False, default=64)
    episode_length: int = struct.field(pytree_node=False, default=168)
    num_traj_samples: int = struct.field(pytree_node=False, default=15)
    traj_sample_timestep: float = struct.field(pytree_node=False, default=0.4)
    step_to_pred: int = struct.field(pytree_node=False, default=144)
    sensor_extent: float = struct.field(pytree_node=False, default=2.0)
    sensor_res: int = struct.field(pytree_node=False, default=32)
    # sensor footprint: "square" (±extent, res²), "fov" (forward fan, 450
    # pts) or "square_fov" (forward 2×2 m, 400 pts) — reference
    # init_{square,fov,square_fov}_height_points
    sensor_shape: str = struct.field(pytree_node=False, default="square")
    height_meas_scale: float = struct.field(pytree_node=False, default=5.0)
    terrain_obs: bool = struct.field(pytree_node=False, default=True)
    power_reward: bool = struct.field(pytree_node=False, default=True)
    power_coefficient: float = struct.field(pytree_node=False, default=5e-4)
    location_coefficient: float = struct.field(pytree_node=False, default=1.0)
    fail_dist: float = struct.field(pytree_node=False, default=4.0)
    termination_height: float = struct.field(pytree_node=False, default=0.15)
    enable_early_termination: bool = struct.field(pytree_node=False, default=True)
    contact_force_threshold: float = struct.field(pytree_node=False, default=1.0)
    num_amp_obs_steps: int = struct.field(pytree_node=False, default=15)
    random_heading: bool = struct.field(pytree_node=False, default=True)
    num_waypoints: int = struct.field(pytree_node=False, default=13)  # LocoVal
    freeze_toe: bool = struct.field(pytree_node=False, default=True)
    freeze_hand: bool = struct.field(pytree_node=False, default=True)
    # ref-state init: probability of motion-library state vs default pose
    # (reference StateInit Random / hybridInitProb semantics)
    ref_state_init_prob: float = struct.field(pytree_node=False, default=0.9)
    # hard-negative motion sampling (reference hard_negative flag,
    # humanoid.py:259 + update_sampling_weight, motion_lib_smpl.py:366-387):
    # per-motion sampling probabilities live in EnvState and are refreshed
    # from per-episode termination rates by the trainer
    hard_negative: bool = struct.field(pytree_node=False, default=False)
    hard_negative_temp: float = struct.field(pytree_node=False, default=0.2)
    # shape/limb-weight obs gating (reference has_shape_obs / has_weight_obs,
    # humanoid.py:228-231; the flagship configs enable shape obs only —
    # has_weight_obs appears in no cfg yaml, so its default False holds)
    has_shape_obs: bool = struct.field(pytree_node=False, default=True)
    has_limb_weight_obs: bool = struct.field(pytree_node=False, default=False)
    # crowd observation (reference divide_group/group_obs, humanoid.py:222-226)
    group_obs: bool = struct.field(pytree_node=False, default=False)
    group_size: int = struct.field(pytree_node=False, default=128)
    # half-width of the uniform jitter around each group's spawn center
    # (reference group_diffs ±8 m, humanoid_pedestrain_terrain.py:1200)
    group_spawn_spread: float = struct.field(pytree_node=False, default=8.0)
    # 3-channel velocity-map sensor variant (reference velocity_map flag)
    velocity_map: bool = struct.field(pytree_node=False, default=False)
    # domain randomization / in-task fault injection (reference
    # apply_randomizations base_task.py:547-787, obs noise config.py:492-495,
    # projectile perturbations humanoid.py:95-133)
    obs_noise_std: float = struct.field(pytree_node=False, default=0.0)
    action_noise_std: float = struct.field(pytree_node=False, default=0.0)
    push_interval: int = struct.field(pytree_node=False, default=0)  # 0 = off
    push_vel: float = struct.field(pytree_node=False, default=1.0)
    # projectile-style hits (reference _build_projectiles/_launch_projectiles,
    # humanoid.py:46-48,95-133): an impulse at a random BODY point — linear
    # kick plus the lever-arm angular kick a small flying object imparts
    projectile_interval: int = struct.field(pytree_node=False, default=0)
    projectile_impulse: float = struct.field(pytree_node=False, default=3.0)
    dr: DRConfig = struct.field(pytree_node=False, default=DRConfig())
    traj: traj_gen.TrajConfig = struct.field(
        pytree_node=False,
        default=traj_gen.TrajConfig(episode_dur=2 * 168 / 30.0))
    engine: EngineConfig = struct.field(pytree_node=False,
                                        default=EngineConfig())

    @property
    def dt(self):
        return self.engine.control_dt

    @property
    def self_obs_dim(self):
        return (obs.SELF_OBS_DIM + 11 * self.has_shape_obs
                + 10 * self.has_limb_weight_obs)

    @property
    def num_sensor_points(self):
        return len(obs.SENSOR_GRIDS[self.sensor_shape](self.sensor_extent,
                                                       self.sensor_res))

    @property
    def task_obs_dim(self):
        d = self.num_traj_samples * 2
        if self.terrain_obs:
            d += self.num_sensor_points * (3 if self.velocity_map else 1)
        if self.group_obs:
            d += 5 * 11 * 3
        return d

    @property
    def obs_dim(self):
        return self.self_obs_dim + self.task_obs_dim

    @property
    def amp_obs_per_step(self):
        # disc-side gating mirrors the obs side (reference has_shape_obs_disc
        # True in every flagship cfg, has_weight_obs_disc absent → False)
        return (obs.AMP_OBS_DIM + 11 * self.has_shape_obs
                + 10 * self.has_limb_weight_obs)

    @property
    def num_actions(self):
        return bm.NUM_DOF


class EnvState(struct.PyTreeNode):
    physics: PhysicsState
    traj_verts: jnp.ndarray        # (N, V, 3)
    inverted: jnp.ndarray          # (N,) bool — heading-inverted real path
    progress: jnp.ndarray          # (N,) int32
    reset_buf: jnp.ndarray         # (N,) bool — needs reset next step
    terminate_buf: jnp.ndarray     # (N,) bool — early termination
    rng: jnp.ndarray
    amp_obs_hist: jnp.ndarray      # (N, S, amp_dim) newest at index 0
    # LocoVal capture at episode start (reference humanoid_pedestrain_terrain
    # .py:93-99, 493-523; origin-normalized in vec_task_wrappers.py:44-66)
    waypoint_traj: jnp.ndarray     # (N, W, 2)
    init_pose: jnp.ndarray         # (N, 24, 3)
    init_vel: jnp.ndarray          # (N, 2)
    # scheduled DR state: per-env property scales [mass, kp, kd, friction,
    # rest_offset(+m)], the global step clock, and each env's last-resample
    # stamp (reference apply_randomizations frequency gating)
    dr_scales: jnp.ndarray = None  # (N, NUM_DR_PROPS)
    dr_clock: jnp.ndarray = None   # () int32
    dr_last: jnp.ndarray = None    # (N,) int32
    # hard-negative motion sampling state (reference update_sampling_weight
    # bookkeeping, motion_lib_smpl.py:366-387) — None unless cfg.hard_negative
    motion_weights: jnp.ndarray = None  # (M,) live sampling probabilities
    cur_mid: jnp.ndarray = None         # (N,) int32 motion id per episode
    motion_sampled: jnp.ndarray = None  # (M,) episodes finished per motion
    motion_term: jnp.ndarray = None     # (M,) early terminations per motion
    motion_succ: jnp.ndarray = None     # (M,) persistent success-rate est.


class StepOutput(struct.PyTreeNode):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray              # reset (terminated | truncated)
    terminated: jnp.ndarray        # early termination only
    amp_obs: jnp.ndarray           # (N, S·amp_dim) flattened window
    reward_raw: jnp.ndarray        # (N, 2) [location, power]


class PedestrianTerrainEnv:
    """Holds static members (model/terrain/motion lib/config); all methods are
    pure and jit-compatible."""

    def __init__(self, cfg: EnvConfig, terrain: Heightfield,
                 motion_lib: ml.MotionLib,
                 betas: Optional[jnp.ndarray] = None,
                 real_traj_bank: Optional[jnp.ndarray] = None,
                 params: Optional[bm.BodyParams] = None):
        self.cfg = cfg
        self.terrain = terrain
        self.motion_lib = motion_lib
        self.tree = default_tree()
        if betas is None:
            betas = jnp.zeros((cfg.num_envs, 16))
        # params override: callers with a real SMPL model pass
        # from_smpl_npz(...) params (vert-fit mesh colliders + regressed
        # offsets); default is the procedural capsule asset
        self.params = params if params is not None \
            else bm.build_body_params(betas)
        self.model = build_model(self.params)
        self.real_traj_bank = real_traj_bank
        self.sensor_grid = obs.SENSOR_GRIDS[cfg.sensor_shape](
            cfg.sensor_extent, cfg.sensor_res)
        # index permutation realizing the y-mirror of the sensor grid for
        # the symmetry loss (exact for all three y-symmetric shapes)
        self.sensor_flip_perm = jnp.asarray(
            obs.grid_flip_perm(self.sensor_grid))
        # feature-space self-obs mirror (signed permutation)
        fidx, fsign = obs.build_self_obs_flip(cfg.self_obs_dim)
        self._flip_self_idx = jnp.asarray(fidx)
        self._flip_self_sign = jnp.asarray(fsign)
        # PD action mapping (reference _build_pd_action_offset_scale,
        # humanoid.py:950-1025: symmetric ±1.2·max|limit| clamped to π;
        # knee y-scale widened to 5)
        lim = np.asarray(self.params.joint_limit[0])           # (23,3)
        scale = np.minimum(1.2 * np.abs(lim).max(-1, keepdims=True), np.pi)
        scale = np.broadcast_to(scale, lim.shape).copy()
        for knee in ("L_Knee", "R_Knee"):
            scale[bm.BODY_NAMES.index(knee) - 1, 1] = 5.0
        self.pd_action_scale = jnp.asarray(scale)
        # limb weight obs: per-group mass fractions + total mass scale
        mass = self.params.mass                                 # (N,24)
        groups = [
            ["L_Hip", "L_Knee", "L_Ankle", "L_Toe"],
            ["R_Hip", "R_Knee", "R_Ankle", "R_Toe"],
            ["Pelvis", "Torso", "Spine", "Chest", "Neck", "Head"],
            ["L_Thorax", "L_Shoulder", "L_Elbow", "L_Wrist", "L_Hand"],
            ["R_Thorax", "R_Shoulder", "R_Elbow", "R_Wrist", "R_Hand"],
        ]
        gm = jnp.stack([
            mass[:, [bm.BODY_NAMES.index(n) for n in g]].sum(-1)
            for g in groups], -1)                               # (N,5)
        total = mass.sum(-1, keepdims=True)
        # 10-dim limb weight obs: per-group mass fraction + absolute group
        # mass (scaled) — reference humanoid_limb_and_weights (humanoid.py:766+)
        self.limb_weights = jnp.concatenate([gm / total, gm / 20.0], -1)
        # obs-side gating (reference has_shape_obs / has_weight_obs)
        self._obs_betas = self.params.betas if cfg.has_shape_obs else None
        self._obs_limbw = (self.limb_weights if cfg.has_limb_weight_obs
                           else None)
        # frozen joints: toes (+ hands) pinned to default targets
        frozen = []
        if cfg.freeze_toe:
            frozen += [bm.BODY_NAMES.index("L_Toe") - 1,
                       bm.BODY_NAMES.index("R_Toe") - 1]
        if cfg.freeze_hand:
            frozen += [bm.BODY_NAMES.index("L_Hand") - 1,
                       bm.BODY_NAMES.index("R_Hand") - 1]
        mask = np.ones((bm.NUM_JOINTS, 1), np.float32)
        mask[frozen] = 0.0
        self.action_mask = jnp.asarray(mask)

    # ------------------------------------------------------------------
    # resets
    # ------------------------------------------------------------------

    @property
    def _task_extra_dim(self):
        return 0

    @property
    def task_obs_dim(self):
        return self.cfg.task_obs_dim + self._task_extra_dim

    @property
    def obs_dim(self):
        return self.cfg.self_obs_dim + self.task_obs_dim

    def _sample_spawn(self, key, n):
        table = self.terrain.spawnable_xy
        if self.cfg.group_obs:
            # group-clustered spawns: one walkable center per group plus a
            # uniform jitter, so group members actually start near each other
            # (reference sample_valid_locations sample_groups=True,
            # humanoid_pedestrain_terrain.py:1196-1205; the reference also
            # re-rolls centers on every reset call, so per-env resets drift
            # groups apart over time exactly like this does)
            G = min(self.cfg.group_size, n)
            ng = -(-n // G)  # ceil: ng*G >= n so the [:n] slice is exact
            k1, k2 = jax.random.split(key)
            centers = table[jax.random.randint(k1, (ng,), 0, table.shape[0])]
            H, W = self.terrain.shape
            cell = self.terrain.cell
            spread = min(self.cfg.group_spawn_spread,
                         0.25 * (min(H, W) - 1) * cell)
            jit = jax.random.uniform(k2, (ng, G, 2), minval=-spread,
                                     maxval=spread)
            xy = (centers[:, None] + jit).reshape(ng * G, 2)[:n]
            lo = jnp.asarray(self.terrain.origin) + 2 * cell
            hi = jnp.asarray(self.terrain.origin) + jnp.asarray(
                [(H - 3) * cell, (W - 3) * cell])
            return jnp.clip(xy, lo, hi)
        idx = jax.random.randint(key, (n,), 0, table.shape[0])
        return table[idx]

    def _reset_states(self, key, n, motion_weights=None):
        """Sample fresh per-env states: motion-lib pose, random heading,
        terrain spawn, new trajectory (reference _reset_actors +
        _reset_task, humanoid_pedestrain_terrain.py:493-631). Returns the
        sampled motion ids too (hard-negative bookkeeping)."""
        cfg = self.cfg
        keys = jax.random.split(key, 6)
        mids = ml.sample_motions(self.motion_lib, keys[0], n,
                                 weights=motion_weights)
        t = ml.sample_time(self.motion_lib, keys[1], mids)
        ms = ml.get_motion_state(self.motion_lib, mids, t)

        spawn_xy = self._sample_spawn(keys[2], n)
        ground_h = height_at(self.terrain, spawn_xy)

        root_rot = ms["root_rot"]
        root_vel = ms["root_vel"]
        root_ang_vel = ms["root_ang_vel"]
        if cfg.random_heading:
            yaw = jax.random.uniform(keys[3], (n,), minval=-np.pi,
                                     maxval=np.pi)
            ez = jnp.zeros((n, 3)).at[:, 2].set(1.0)
            dq = quat.from_angle_axis(yaw, ez)
            # strip current heading, apply new (reference _reset_ref_state_init
            # random-heading logic, humanoid_pedestrain_terrain.py:526-573)
            hq_inv = quat.heading_quat_inv(root_rot)
            root_rot = quat.mul(dq, quat.mul(hq_inv, root_rot))
            root_vel = quat.rotate(dq, quat.rotate(hq_inv, root_vel))
            root_ang_vel = quat.rotate(dq, quat.rotate(hq_inv, root_ang_vel))

        root_pos = jnp.concatenate(
            [spawn_xy, (ms["root_pos"][:, 2] + ground_h)[:, None]], -1)

        # default-pose fallback with probability (1 − ref_state_init_prob)
        use_ref = (jax.random.uniform(keys[4], (n,))
                   < cfg.ref_state_init_prob)
        ident = quat.identity_like((n, bm.NUM_BODIES))
        local_rot = jnp.where(use_ref[:, None, None], ms["local_rot"], ident)
        zed = jnp.zeros((n, 3))
        root_pos_d = jnp.concatenate(
            [spawn_xy, (self.params.height_offset[:n] + ground_h)[:, None]],
            -1)
        root_pos = jnp.where(use_ref[:, None], root_pos, root_pos_d)
        root_rot = jnp.where(use_ref[:, None], root_rot,
                             quat.identity_like((n,)))
        root_vel = jnp.where(use_ref[:, None], root_vel, zed)
        root_ang_vel = jnp.where(use_ref[:, None], root_ang_vel, zed)
        dof_vel = jnp.where(use_ref[:, None, None], ms["dof_vel"],
                            jnp.zeros((n, bm.NUM_JOINTS, 3)))
        local_rot = local_rot.at[:, 0].set(root_rot)

        physics = kinematic_state(
            self.model, self.tree, root_pos, root_rot, local_rot,
            root_vel=root_vel, root_ang_vel=root_ang_vel, dof_vel=dof_vel)

        verts, inverted = traj_gen.sample_traj(
            keys[5], cfg.traj, root_pos, root_vel=root_vel,
            real_bank=self.real_traj_bank)
        # pin traj z to terrain height under each vertex (flat obs frame)
        return physics, verts, inverted, mids

    def _capture_locoval_inputs(self, physics: PhysicsState, verts):
        """Waypoints + initial pose/velocity for the LocoVal function,
        origin-normalized (reference get_waypoint_traj/get_init_pose/
        get_init_vel, vec_task_wrappers.py:44-66; capture at reset,
        humanoid_pedestrain_terrain.py:93-99)."""
        cfg = self.cfg
        n = verts.shape[0]
        times = jnp.zeros((n,))
        wp = traj_gen.fetch_samples(verts, times, cfg.traj.episode_dur,
                                    cfg.num_waypoints,
                                    cfg.traj_sample_timestep)[..., :2]
        origin = physics.body_x[:, 0, :2]
        wp = wp - origin[:, None]
        pose = physics.body_x - physics.body_x[:, 0:1]     # root-relative
        init_vel = physics.body_v[:, 0, :2]
        return wp, pose, init_vel

    def reset(self, key) -> EnvState:
        cfg = self.cfg
        n = cfg.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        physics, verts, inverted, mids = self._reset_states(k1, n)
        wp, pose, vel = self._capture_locoval_inputs(physics, verts)
        amp = self._amp_obs_single(physics)
        hist = jnp.tile(amp[:, None], (1, cfg.num_amp_obs_steps, 1))
        clock0 = jnp.zeros((), jnp.int32)
        scales = self._sample_dr_scales(k3, n, clock0) if cfg.dr.enabled \
            else self._neutral_dr_scales(n)
        hn = {}
        if cfg.hard_negative:
            M = self.motion_lib.num_motions
            hn = dict(motion_weights=self.motion_lib.weights,
                      cur_mid=mids,
                      motion_sampled=jnp.zeros((M,)),
                      motion_term=jnp.zeros((M,)),
                      motion_succ=jnp.ones((M,)))
        return EnvState(
            **hn,
            physics=physics,
            traj_verts=verts,
            inverted=inverted,
            progress=jnp.zeros((n,), jnp.int32),
            reset_buf=jnp.zeros((n,), bool),
            terminate_buf=jnp.zeros((n,), bool),
            rng=k2,
            amp_obs_hist=hist,
            waypoint_traj=wp,
            init_pose=pose,
            init_vel=vel,
            dr_scales=scales,
            dr_clock=clock0,
            dr_last=jnp.zeros((n,), jnp.int32),
        )

    # ------------------------------------------------------------------
    # scheduled domain randomization (reference apply_randomizations,
    # base_task.py:547-787)
    # ------------------------------------------------------------------

    @staticmethod
    def _neutral_dr_scales(n):
        s = jnp.ones((n, NUM_DR_PROPS))
        return s.at[:, 4].set(0.0)          # rest offset is additive

    def _sample_dr_scales(self, key, n, clock):
        """Per-env property scales with linear intensity ramping toward the
        configured ranges (the reference's 'linear' schedule)."""
        dr = self.cfg.dr
        if dr.schedule_steps > 0:
            ramp = jnp.minimum(clock.astype(jnp.float32)
                               / dr.schedule_steps, 1.0)
        else:
            ramp = jnp.float32(1.0)
        ranges = jnp.asarray([dr.mass_range, dr.kp_range, dr.kd_range,
                              dr.friction_range, dr.rest_offset_range])
        u = jax.random.uniform(key, (n, NUM_DR_PROPS))
        raw = ranges[:, 0] + u * (ranges[:, 1] - ranges[:, 0])
        neutral = self._neutral_dr_scales(n)
        return neutral + ramp * (raw - neutral)

    def _dr_model(self, state: EnvState):
        """Model with the env's current DR scales folded into the batched
        body parameters — the TPU-native asset-property setter (the model's
        base params are jit constants; per-env variation rides the state)."""
        if not self.cfg.dr.enabled:
            return self.model
        s = state.dr_scales
        p = self.model.params
        m, kp, kd, fr, ro = (s[:, 0], s[:, 1], s[:, 2], s[:, 3], s[:, 4])
        p = p.replace(
            mass=p.mass * m[:, None],
            inv_mass=p.inv_mass / m[:, None],
            inertia=p.inertia * m[:, None, None],
            inv_inertia=p.inv_inertia / m[:, None, None],
            kp=p.kp * kp[:, None],
            kd=p.kd * kd[:, None],
            friction_scale=p.friction_scale * fr,
            capsule_radius=p.capsule_radius + ro[:, None],
            mesh_point_radius=p.mesh_point_radius + ro[:, None, None],
        )
        return self.model.replace(params=p)

    # ------------------------------------------------------------------
    # observations
    # ------------------------------------------------------------------

    def _amp_obs_single(self, physics: PhysicsState):
        pos, rot, vel, ang = body_frame_state(self.model, physics)
        dof_pos, dof_vel = joint_state(self.model, physics)
        key_pos = pos[:, jnp.asarray(obs.KEY_BODY_IDS)]
        return obs.amp_obs(pos[:, 0], rot[:, 0], vel[:, 0], ang[:, 0],
                           dof_pos, dof_vel, key_pos,
                           betas=self._obs_betas,
                           limb_weights=self._obs_limbw)

    def _self_obs(self, physics: PhysicsState):
        pos, rot, vel, ang = body_frame_state(self.model, physics)
        return obs.humanoid_obs_max(pos, rot, vel, ang,
                                    betas=self._obs_betas,
                                    limb_weights=self._obs_limbw)

    def _task_obs(self, state: EnvState):
        cfg = self.cfg
        physics = state.physics
        pos, rot, _, _ = body_frame_state(self.model, physics)
        root_pos, root_rot = pos[:, 0], rot[:, 0]
        times = state.progress.astype(jnp.float32) * cfg.dt
        samples = traj_gen.fetch_samples(
            state.traj_verts, times, cfg.traj.episode_dur,
            cfg.num_traj_samples, cfg.traj_sample_timestep)
        loc = obs.location_obs(root_pos, root_rot, samples)
        parts = [loc]
        if cfg.terrain_obs:
            head = pos[:, self.tree.index("Head")]
            if cfg.velocity_map:
                vel = physics.body_v[:, 0]
                if cfg.group_obs:
                    # other people stamped into the height/velocity field
                    gsz = min(cfg.group_size, cfg.num_envs)
                    parts.append(obs.group_velocity_map_obs(
                        self.terrain, head, root_rot, root_pos[:, :2],
                        self.sensor_grid, root_pos, vel, gsz,
                        cfg.height_meas_scale))
                else:
                    parts.append(obs.velocity_map_obs(
                        self.terrain, head, root_rot, root_pos[:, :2],
                        self.sensor_grid, vel, cfg.height_meas_scale))
            else:
                parts.append(obs.heightmap_obs(
                    self.terrain, head, root_rot, root_pos[:, :2],
                    self.sensor_grid, cfg.height_meas_scale))
        if cfg.group_obs:
            gsz = min(cfg.group_size, cfg.num_envs)
            parts.append(obs.group_obs(pos, physics.body_v, root_rot, gsz))
        return jnp.concatenate(parts, -1) if len(parts) > 1 else loc

    def observe(self, state: EnvState):
        return jnp.concatenate(
            [self._self_obs(state.physics), self._task_obs(state)], -1)

    def observe_with_traj(self, state: EnvState, traj_samples):
        """Observation with the trajectory slice rebuilt from hypothetical
        samples (N,S,3) — differentiable wrt traj_samples, so a critic
        gradient can flow back to candidate trajectories (the reference's
        query_value_gradient hook, humanoid_pedestrain_terrain.py:353-374,
        builds exactly this spliced obs but leaves the gradient TODO)."""
        o = self.observe(state)
        physics = state.physics
        pos, rot, _, _ = body_frame_state(self.model, physics)
        loc = obs.location_obs(pos[:, 0], rot[:, 0], traj_samples)
        base = self.cfg.self_obs_dim
        S = self.cfg.num_traj_samples * 2
        return jnp.concatenate([o[:, :base], loc, o[:, base + S:]], -1)

    def observe_flipped(self, state: EnvState):
        """Left/right mirrored observation, computed from the state
        (reference _compute_flip_humanoid_obs humanoid.py:1066-1108 and
        _compute_flip_task_obs humanoid_pedestrain_terrain.py:455-490).
        The training hot path uses observe_flipped_from instead — a pure
        feature-space signed permutation of the already-computed obs; this
        state-based version is its oracle (tests pin their equality)."""
        physics = state.physics
        pos, rot, vel, ang = body_frame_state(self.model, physics)
        fp, fr, fv, fa = obs.flip_body_state(pos, rot, vel, ang)
        self_obs = obs.humanoid_obs_max(fp, fr, fv, fa,
                                        betas=self._obs_betas,
                                        limb_weights=self._obs_limbw)
        task = self._task_obs(state)
        return jnp.concatenate([self_obs] + self._flip_task_parts(task), -1)

    def observe_flipped_from(self, obs_full):
        """Mirror a COMPUTED observation in feature space: the mirror
        commutes with the heading-local projection, so the flipped self obs
        is a static signed permutation (observations.build_self_obs_flip)
        and the task obs mirrors feature-level — no second sensor/obs pass
        (that pass measured 0.55 s/epoch at 1600 envs)."""
        sd = self.cfg.self_obs_dim
        self_obs = obs_full[:, :sd][:, self._flip_self_idx] \
            * self._flip_self_sign
        task = obs_full[:, sd:sd + self.task_obs_dim]
        return jnp.concatenate([self_obs] + self._flip_task_parts(task), -1)

    def _flip_task_extra(self, extra):
        """Hook: mirror the variant-specific task-obs insert (hand targets
        swap L/R; default pass-through)."""
        return extra

    def _flip_task_parts(self, task):
        cfg = self.cfg
        S = cfg.num_traj_samples
        loc = task[:, :2 * S].reshape(-1, S, 2).at[..., 1].multiply(-1.0)
        parts = [loc.reshape(-1, 2 * S)]
        off = 2 * S
        if self._task_extra_dim:
            parts.append(self._flip_task_extra(
                task[:, off:off + self._task_extra_dim]))
            off += self._task_extra_dim
        if cfg.terrain_obs:
            # y-mirror of the sensor footprint. For the square grid the
            # mirror is a minor-axis reversal (free relayout); the fov
            # shapes need the index permutation (exact — grids are
            # y-symmetric by construction)
            P = cfg.num_sensor_points
            res = cfg.sensor_res
            square = cfg.sensor_shape == "square"
            if cfg.velocity_map:
                # 3 channels [h, vx, vy] in the heading frame: mirror the
                # grid points and negate the lateral velocity channel
                n_hm = 3 * P
                hm = task[:, off:off + n_hm].reshape(-1, P, 3)
                if square:
                    hm = hm.reshape(-1, res, res, 3)[:, :, ::-1] \
                           .reshape(-1, P, 3)
                else:
                    hm = hm[:, self.sensor_flip_perm]
                parts.append(hm.at[..., 2].multiply(-1.0).reshape(-1, n_hm))
            else:
                n_hm = P
                hm = task[:, off:off + n_hm]
                if square:
                    hm = hm.reshape(-1, res, res)[:, :, ::-1].reshape(-1, P)
                else:
                    hm = hm[:, self.sensor_flip_perm]
                parts.append(hm)
            off += n_hm
        if cfg.group_obs:
            # relative positions/velocities of nearby people in the heading
            # frame: mirror their lateral (y) components — every group
            # feature is an (x,y,z) triplet regardless of block layout
            # (reference _compute_flip_task_obs view(B,-1,3),
            # humanoid_pedestrain_terrain.py:481-484)
            grp = task[:, off:].reshape(task.shape[0], -1, 3)
            grp = grp.at[..., 1].multiply(-1.0)
            parts.append(grp.reshape(task.shape[0], -1))
        return parts

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, actions: jnp.ndarray):
        """actions (N, 69) in [-1,1] exp-map scale → PD targets
        (reference pre_physics_step, humanoid.py:1184-1209)."""
        cfg = self.cfg
        rng = state.rng
        if cfg.action_noise_std > 0:
            rng, k_an = jax.random.split(rng)
            actions = actions + cfg.action_noise_std * jax.random.normal(
                k_an, actions.shape)
        a = actions.reshape(-1, bm.NUM_JOINTS, 3)
        pd_target = a * self.pd_action_scale[None] * self.action_mask[None]

        physics = physics_step(self._dr_model(state), self.terrain,
                               state.physics, pd_target, cfg.engine,
                               self.tree)
        # random root pushes (perturbation fault injection)
        if cfg.push_interval > 0:
            rng, k_push = jax.random.split(rng)
            do_push = (state.progress % cfg.push_interval
                       == cfg.push_interval - 1)
            dv = cfg.push_vel * jax.random.normal(k_push,
                                                  (cfg.num_envs, 3))
            dv = dv.at[:, 2].multiply(0.2)
            u = physics.u.at[:, 0:3].add(
                jnp.where(do_push[:, None], dv, 0.0))
            physics = physics.replace(u=u)
        if cfg.projectile_interval > 0:
            rng, k_b, k_d = jax.random.split(rng, 3)
            hit = (state.progress % cfg.projectile_interval
                   == cfg.projectile_interval - 1)
            body = jax.random.randint(k_b, (cfg.num_envs,), 0, bm.NUM_BODIES)
            # mostly-horizontal random impulse direction
            d = jax.random.normal(k_d, (cfg.num_envs, 3))
            d = d.at[:, 2].multiply(0.3)
            d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
            imp = cfg.projectile_impulse * d                   # N·s
            mass_tot = self.params.mass.sum(-1, keepdims=True)  # (N,1)
            xb = jnp.take_along_axis(physics.body_x,
                                     body[:, None, None].repeat(3, -1),
                                     1)[:, 0]                  # hit point
            r = xb - physics.body_x[:, 0]                      # lever arm
            dv = imp / mass_tot
            # angular kick via a pelvis-level inertia scale (~point projectile)
            dw = jnp.cross(r, imp) / (mass_tot * 0.15)
            u = physics.u
            u = u.at[:, 0:3].add(jnp.where(hit[:, None], dv, 0.0))
            u = u.at[:, 3:6].add(jnp.where(hit[:, None], dw, 0.0))
            physics = physics.replace(u=u)
        state = state.replace(rng=rng)
        progress = state.progress + 1

        reward, reward_raw = self._reward(state, physics, progress, pd_target)
        times = progress.astype(jnp.float32) * cfg.dt
        tar = traj_gen.calc_pos(state.traj_verts, times, cfg.traj.episode_dur)
        root_xy = physics.body_x[:, 0, :2]

        # resets (reference compute_humanoid_reset,
        # humanoid_pedestrain_terrain.py:1468-1530)
        pos, _, _, _ = body_frame_state(self.model, physics)
        contact = jnp.linalg.norm(physics.contact_force, axis=-1)
        allowed = jnp.zeros((bm.NUM_BODIES,), bool).at[
            jnp.asarray(obs.CONTACT_BODY_IDS)].set(True)
        bad_contact = jnp.any(contact * (~allowed)[None]
                              > cfg.contact_force_threshold, -1)
        ground = height_at(self.terrain, pos[..., :2].reshape(-1, 2))
        ground = ground.reshape(pos.shape[0], -1)
        body_h = pos[..., 2] - ground
        low = body_h < cfg.termination_height
        low = low.at[:, jnp.asarray(obs.CONTACT_BODY_IDS)].set(False)
        fall_h = jnp.any(low, -1)
        has_fallen = bad_contact & fall_h & (progress > 1)
        tar_dist = jnp.sum((tar[:, :2] - root_xy) ** 2, -1)
        tar_fail = tar_dist > cfg.fail_dist ** 2
        terminated = (has_fallen | tar_fail) if cfg.enable_early_termination \
            else jnp.zeros_like(has_fallen)
        terminated = terminated & self._termination_allowed(state)
        # failure detection: a numerically diverged env must recycle — NaN
        # comparisons are all False, so without this it would never trip the
        # fall/fail checks and would poison every batch statistic forever
        bad = (~jnp.isfinite(physics.u).all(-1)
               | ~jnp.isfinite(physics.root_pos).all(-1)
               | ~jnp.isfinite(physics.joint_rot).all((-1, -2))
               | ~jnp.isfinite(physics.body_x).all((-1, -2))
               | (jnp.abs(physics.root_pos) > 1e4).any(-1))
        terminated = terminated | bad
        truncated = progress >= cfg.episode_length - 1
        done = terminated | truncated

        # AMP obs window update (reference _update_hist_amp_obs,
        # humanoid_amp.py:139-163)
        amp = self._amp_obs_single(physics)
        hist = jnp.concatenate([amp[:, None],
                                state.amp_obs_hist[:, :-1]], axis=1)

        new_state = state.replace(physics=physics, progress=progress,
                                  reset_buf=done, terminate_buf=terminated,
                                  amp_obs_hist=hist,
                                  dr_clock=state.dr_clock + 1)

        # masked auto-reset (per-env where-select of fresh states)
        new_state = self._auto_reset(new_state, done)

        obs_out = self.observe(new_state)
        if cfg.obs_noise_std > 0:
            obs_out = obs_out + cfg.obs_noise_std * jax.random.normal(
                jax.random.fold_in(new_state.rng, 3), obs_out.shape)
        # Sanitize every learning-facing output: a diverged env (recycled via
        # `bad` above) must not leak NaN/inf into GAE, advantage statistics,
        # or the disc pools — one poisoned sample would NaN the whole update.
        clean = lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
        out = StepOutput(
            obs=clean(obs_out),
            reward=clean(reward),
            done=done,
            terminated=terminated,
            # PRE-reset window: the transition the policy actually produced
            # (a done env's new_state hist is already the next episode's
            # tiled reset pose — wrong sample for disc reward/training)
            amp_obs=clean(hist.reshape(cfg.num_envs, -1)),
            reward_raw=clean(reward_raw),
        )
        return new_state, out

    def _termination_allowed(self, state: EnvState):
        """Hook for variants that gate early termination (getup recovery)."""
        return jnp.ones((self.cfg.num_envs,), bool)

    def _reward(self, state: EnvState, physics, progress, pd_target):
        """Reward hook (reference _compute_reward,
        humanoid_pedestrain_terrain.py:907-930): location + power penalty."""
        cfg = self.cfg
        times = progress.astype(jnp.float32) * cfg.dt
        tar = traj_gen.calc_pos(state.traj_verts, times, cfg.traj.episode_dur)
        root_xy = physics.body_x[:, 0, :2]
        err = jnp.sum((tar[:, :2] - root_xy) ** 2, -1)
        loc_reward = cfg.location_coefficient * jnp.exp(-2.0 * err)

        dof_pos, dof_vel = joint_state(self.model, physics)
        # power must price the torques the sim actually applied: under DR the
        # engine drives with the per-env-scaled gains, not the nominal ones
        p = self._dr_model(state).params
        tau = (p.kp[..., None] * (pd_target - dof_pos)
               - p.kd[..., None] * dof_vel)
        # actuator saturation, matching the engine's drive-torque clamp
        # (reference GAINS torque limits): |τ| per joint ≤ torque_limit
        nrm = jnp.linalg.norm(tau, axis=-1, keepdims=True)
        cap = p.torque_limit[..., None]
        tau = tau * (jnp.minimum(nrm, cap) / jnp.maximum(nrm, 1e-9))
        power = jnp.abs(tau * dof_vel).sum((-2, -1))
        pow_reward = -cfg.power_coefficient * power
        reward = loc_reward + (pow_reward if cfg.power_reward else 0.0)
        return reward, jnp.stack([loc_reward, pow_reward], -1)

    def _auto_reset(self, state: EnvState, done):
        cfg = self.cfg
        n = cfg.num_envs
        key, k1, k_dr = jax.random.split(state.rng, 3)
        physics_new, verts_new, inv_new, mids_new = self._reset_states(
            k1, n, motion_weights=state.motion_weights)
        wp, pose, vel = self._capture_locoval_inputs(physics_new, verts_new)

        def pick(a, b):
            d = done.reshape((n,) + (1,) * (a.ndim - 1))
            return jnp.where(d, a, b)

        # scheduled DR resample: resetting envs whose last randomization is
        # at least `frequency` steps old draw fresh property scales
        # (reference apply_randomizations frequency gate, base_task.py:556)
        dr_scales, dr_last = state.dr_scales, state.dr_last
        if cfg.dr.enabled:
            due = done & (state.dr_clock - dr_last >= cfg.dr.frequency)
            fresh = self._sample_dr_scales(k_dr, n, state.dr_clock)
            dr_scales = jnp.where(due[:, None], fresh, dr_scales)
            dr_last = jnp.where(due, state.dr_clock, dr_last)

        # hard-negative bookkeeping: every finishing episode counts one
        # sample of its motion; early terminations count one failure
        # (reference update_sampling_history / update_termination_history,
        # motion_lib_smpl.py:381-387)
        hn = {}
        if cfg.hard_negative:
            d = done.astype(jnp.float32)
            hn = dict(
                motion_sampled=state.motion_sampled.at[state.cur_mid].add(d),
                motion_term=state.motion_term.at[state.cur_mid].add(
                    d * state.terminate_buf.astype(jnp.float32)),
                cur_mid=pick(mids_new, state.cur_mid),
            )

        physics = jax.tree.map(pick, physics_new, state.physics)
        amp_new = self._amp_obs_single(physics_new)
        hist_new = jnp.tile(amp_new[:, None], (1, cfg.num_amp_obs_steps, 1))
        return state.replace(
            **hn,
            physics=physics,
            traj_verts=pick(verts_new, state.traj_verts),
            inverted=pick(inv_new, state.inverted),
            progress=pick(jnp.zeros((n,), jnp.int32), state.progress),
            rng=key,
            amp_obs_hist=pick(hist_new, state.amp_obs_hist),
            waypoint_traj=pick(wp, state.waypoint_traj),
            init_pose=pick(pose, state.init_pose),
            init_vel=pick(vel, state.init_vel),
            dr_scales=dr_scales,
            dr_last=dr_last,
        )

    def apply_hard_negative_update(self, state: EnvState) -> EnvState:
        """Refresh the live motion-sampling probabilities from the
        accumulated per-episode termination stats (reference
        update_sampling_weight, motion_lib_smpl.py:366-377). Pure and
        jit-safe; the trainer calls it once per epoch."""
        if not self.cfg.hard_negative:
            return state
        w, succ, sampled, term = ml.hard_negative_update(
            state.motion_succ, state.motion_sampled, state.motion_term,
            temp=self.cfg.hard_negative_temp)
        return state.replace(motion_weights=w, motion_succ=succ,
                             motion_sampled=sampled, motion_term=term)

    # ------------------------------------------------------------------
    # AMP demo fetch (reference fetch_amp_obs_demo, humanoid_amp.py:168-220)
    # ------------------------------------------------------------------

    def fetch_amp_obs_demo(self, key, num_samples: int, motion_weights=None):
        cfg = self.cfg
        S = cfg.num_amp_obs_steps
        k1, k2 = jax.random.split(key)
        mids = ml.sample_motions(self.motion_lib, k1, num_samples,
                                 weights=motion_weights)
        truncate = cfg.dt * (S - 1)
        t0 = ml.sample_time(self.motion_lib, k2, mids, truncate_time=truncate)
        t0 = t0 + truncate
        # steps back in time: newest first (matches the live window layout)
        offsets = -jnp.arange(S) * cfg.dt
        ts = (t0[:, None] + offsets[None]).reshape(-1)
        mids_rep = jnp.repeat(mids, S)
        ms = ml.get_motion_state(self.motion_lib, mids_rep, ts)
        betas16 = ms["betas"]
        a = obs.amp_obs(ms["root_pos"], ms["root_rot"], ms["root_vel"],
                        ms["root_ang_vel"], ms["dof_pos"], ms["dof_vel"],
                        ms["key_pos"],
                        betas=betas16 if self.cfg.has_shape_obs else None,
                        limb_weights=(jnp.tile(self.limb_weights[:1],
                                               (len(mids_rep), 1))
                                      if self.cfg.has_limb_weight_obs
                                      else None))
        return a.reshape(num_samples, -1)
