"""Policy / critic / discriminator / value networks (flax.linen).

Architectural parity with the reference rl_games builders:
  * AMPSeptValueNet ↔ AMPSeptValueBuilder network
    (amp_network_sept_builder.py:14-181 + amp_network_sept_value_builder.py:
    10-89): separate task MLP [512,256] embedding of [traj, heightmap] task
    obs, concatenated with self obs into actor [2048,1024]→μ (fixed σ,
    init −2.9, amp_humanoid_smpl_sept_task.yaml:20-26) and critic
    [2048,1024]→V; AMP discriminator [1024,512]→logit over the flattened
    AMP-obs window; task-value head [15,6]→1 over the traj obs (no sigmoid).
  * ValuePoseNet ↔ the LocoVal function (value_pose_net.py:10-159):
    heading rotation-normalization so the first segment points +x, optional
    pose/velocity inputs (toe/spine joints hidden), MLP in→in/2−1→in/4→1 with
    sigmoid; calc_embodied_motion_loss = MSE(pred, 1).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _symmetric_uniform(scale: float):
    """torch-style uniform_(-scale, scale) — flax's `uniform` is [0, scale)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def _make_mlp(units: Sequence[int], name: str, dtype=jnp.float32):
    return [nn.Dense(u, name=f"{name}_{i}", dtype=dtype)
            for i, u in enumerate(units)]


def _run_mlp(layers, x):
    for layer in layers:
        x = nn.relu(layer(x))
    return x


class AMPSeptValueNet(nn.Module):
    """All heads in one module; parameters partition cleanly for freezing."""

    num_actions: int
    self_obs_dim: int
    traj_obs_dim: int            # location obs (numTrajSamples·2)
    task_obs_dim: int            # traj + heightmap
    mlp_units: Tuple[int, ...] = (2048, 1024)
    task_units: Tuple[int, ...] = (512, 256)
    value_units: Tuple[int, ...] = (15, 6)
    disc_units: Tuple[int, ...] = (1024, 512)
    sigma_init: float = -2.9
    # crowd encoder over the trailing group obs: a shared per-person MLP
    # max-pooled over the top-k neighbors (reference _build_pointnet /
    # eval_task, amp_network_sept_builder.py:52-66, 167-181). 0 = off.
    people_obs_dim: int = 0
    pointnet_topk: int = 5
    pointnet_emb: int = 64
    # mixed precision: hidden MLP matmuls in bf16 (params stay f32, flax
    # dtype= casts activations; MXU runs bf16 at 2× f32 rate and operand
    # traffic halves). Heads (μ, σ, value, disc/value logits) stay f32 —
    # PPO ratios exp(logπ−logπ_old) and disc logits are precision-sensitive.
    hidden_bf16: bool = False

    @property
    def _hidden_dtype(self):
        return jnp.bfloat16 if self.hidden_bf16 else jnp.float32

    def setup(self):
        # explicit dtype: a weak-typed param would strengthen after the first
        # optimizer step and retrace the whole compiled epoch once
        self.log_sigma = self.param(
            "log_sigma", lambda k, s: jnp.full(s, self.sigma_init,
                                               jnp.float32),
            (self.num_actions,))
        dt = self._hidden_dtype
        self.task_mlp = _make_mlp(self.task_units, "task_mlp", dt)
        if self.people_obs_dim:
            self.point_net = [
                nn.Dense(32, name="point_net_0", dtype=dt),
                nn.Dense(64, name="point_net_1", dtype=dt),
                nn.Dense(self.pointnet_emb, name="point_net_2", dtype=dt),
            ]
        self.actor_mlp = _make_mlp(self.mlp_units, "actor_mlp", dt)
        self.critic_mlp = _make_mlp(self.mlp_units, "critic_mlp", dt)
        self.disc_mlp = _make_mlp(self.disc_units, "disc_mlp", dt)
        self.task_value_mlp = _make_mlp(self.value_units, "task_value_mlp")
        self.mu = nn.Dense(self.num_actions, name="mu",
                           kernel_init=nn.initializers.variance_scaling(
                               0.01, "fan_in", "truncated_normal"))
        self.value = nn.Dense(1, name="value")
        # DISC_LOGIT_INIT_SCALE=1.0 (amp_network_builder.py:11) — symmetric,
        # scaled by 1/sqrt(fan_in) so the initial logits don't saturate σ
        self.disc_logits = nn.Dense(
            1, name="disc_logits",
            kernel_init=_symmetric_uniform(1.0 / self.disc_units[-1] ** 0.5))
        self.value_logits = nn.Dense(
            1, name="value_logits",
            kernel_init=_symmetric_uniform(1.0 / self.value_units[-1] ** 0.5))

    def _split(self, obs):
        self_obs = obs[..., :self.self_obs_dim]
        task_obs = obs[..., self.self_obs_dim:
                       self.self_obs_dim + self.task_obs_dim]
        return self_obs, task_obs

    def task_embed(self, task_obs):
        if not self.people_obs_dim:
            return _run_mlp(self.task_mlp, task_obs)
        # split [traj+heightmap | people]: task MLP over the static task obs,
        # permutation-invariant max-pool over the per-person embeddings. The
        # reference un-normalizes the people slice first (its pointnet was
        # tuned on raw relative coords); here the pointnet consumes the same
        # normalized features as every other head — one affine map upstream
        # of a learned per-person MLP, absorbed by the first Dense.
        head = task_obs[..., :-self.people_obs_dim]
        people = task_obs[..., -self.people_obs_dim:]
        return jnp.concatenate([_run_mlp(self.task_mlp, head),
                                self._people_feat(people)], -1)

    def _people_feat(self, people):
        # group obs layout is reference-exact: the whole k-neighbor joint-
        # position block first, then the k root velocities (observations.
        # group_obs). Regroup into per-person rows before the pointnet.
        # Deviation (improvement): the reference's own view(B, topk, -1)
        # (amp_network_sept_builder.py:62) slices 33 consecutive floats per
        # "point", which straddles person boundaries in that layout; here
        # each point is exactly one person's [10 joints + root vel].
        k = self.pointnet_topk
        per = self.people_obs_dim // k
        pos = people[..., :self.people_obs_dim - 3 * k]
        vel = people[..., self.people_obs_dim - 3 * k:]
        p = jnp.concatenate(
            [pos.reshape(pos.shape[:-1] + (k, per - 3)),
             vel.reshape(vel.shape[:-1] + (k, 3))], -1)
        for i, layer in enumerate(self.point_net):
            p = layer(p)
            if i < len(self.point_net) - 1:
                p = nn.relu(p)
        return p.max(-2)

    def actor(self, obs):
        self_obs, task_obs = self._split(obs)
        emb = self.task_embed(task_obs).astype(self._hidden_dtype)
        h = _run_mlp(self.actor_mlp, jnp.concatenate([self_obs, emb], -1))
        mu = self.mu(h.astype(jnp.float32))
        sigma = jnp.exp(self.log_sigma) * jnp.ones_like(mu)
        return mu, sigma

    def critic(self, obs):
        self_obs, task_obs = self._split(obs)
        emb = self.task_embed(task_obs)
        h = _run_mlp(self.critic_mlp, jnp.concatenate([self_obs, emb], -1))
        return self.value(h.astype(jnp.float32))[..., 0]

    def disc(self, amp_obs):
        h = _run_mlp(self.disc_mlp, amp_obs)
        return self.disc_logits(h.astype(jnp.float32))[..., 0]

    def task_value(self, obs):
        """LocoVal head over the traj part of the task obs
        (amp_network_sept_value_builder.py:32-46)."""
        _, task_obs = self._split(obs)
        traj_obs = task_obs[..., :self.traj_obs_dim]
        h = _run_mlp(self.task_value_mlp, traj_obs)
        return self.value_logits(h)[..., 0]

    def __call__(self, obs, amp_obs):
        mu, sigma = self.actor(obs)
        v = self.critic(obs)
        d = self.disc(amp_obs)
        tv = self.task_value(obs)
        return mu, sigma, v, d, tv


class AMPSeptCNNNet(AMPSeptValueNet):
    """Heightmap variant: conv encoder over the (res×res×C) sensor image
    instead of flattening it into the task MLP (reference AMPSeptCNNBuilder,
    amp_network_sept_cnn_builder.py:17-164)."""

    sensor_res: int = 32
    sensor_channels: int = 1
    cnn_features: Tuple[int, ...] = (16, 32, 32)

    def setup(self):
        super().setup()
        self.convs = [nn.Conv(f, (3, 3), strides=(2, 2), name=f"cnn_{i}")
                      for i, f in enumerate(self.cnn_features)]
        self.cnn_proj = nn.Dense(self.task_units[-1], name="cnn_proj")

    def task_embed(self, task_obs):
        # layout: [traj | sensor image | group obs] (PedestrianTerrainEnv.
        # _task_obs ordering); the crowd slice goes through the pointnet
        point_feat = None
        if self.people_obs_dim:
            point_feat = self._people_feat(
                task_obs[..., -self.people_obs_dim:])
            task_obs = task_obs[..., :-self.people_obs_dim]
        traj = task_obs[..., :self.traj_obs_dim]
        hm = task_obs[..., self.traj_obs_dim:
                      self.traj_obs_dim
                      + self.sensor_res ** 2 * self.sensor_channels]
        rest = task_obs[..., self.traj_obs_dim
                        + self.sensor_res ** 2 * self.sensor_channels:]
        img = hm.reshape(hm.shape[:-1] + (self.sensor_res, self.sensor_res,
                                          self.sensor_channels))
        h = img
        for conv in self.convs:
            h = nn.relu(conv(h))
        h = h.reshape(h.shape[:-3] + (-1,))
        cnn_feat = nn.relu(self.cnn_proj(h))
        mlp_feat = _run_mlp(self.task_mlp, jnp.concatenate([traj, rest], -1))
        feats = [mlp_feat, cnn_feat]
        if point_feat is not None:
            feats.append(point_feat)
        return jnp.concatenate(feats, -1)


class ValuePoseNet(nn.Module):
    """The LocoVal function (reference value_pose_net.py:10-159)."""

    use_pose: bool = True
    use_vel: bool = True
    hide_toe: bool = True
    hide_spine: bool = True
    normalize: bool = True
    num_waypoints: int = 13      # 5 for VRU

    @property
    def traj_size(self):
        return self.num_waypoints * 2

    @nn.compact
    def __call__(self, waypoint_traj, init_pose=None, init_vel=None):
        """waypoint_traj (B, W, 2); init_pose (B, 24, 3); init_vel (B, 2).
        Returns (B,) plausibility value in [0, 1]."""
        if self.normalize:
            waypoint_traj, init_pose, init_vel = rotate_normalization(
                waypoint_traj, init_pose, init_vel)

        parts = [waypoint_traj.reshape(waypoint_traj.shape[0], -1)]
        in_dim = self.traj_size
        if self.use_pose:
            assert init_pose is not None
            pose = init_pose
            # hide toe joints 4/8 and spine chain 9/10/11
            # (reference forward_pose/forward_full zeroing, :120-150)
            if self.hide_toe:
                pose = pose.at[:, 4].set(0.0).at[:, 8].set(0.0)
            if self.hide_spine:
                pose = pose.at[:, 9].set(0.0).at[:, 10].set(0.0) \
                           .at[:, 11].set(0.0)
            parts.append(pose.reshape(pose.shape[0], -1))
            in_dim += 72
        if self.use_vel:
            assert init_vel is not None
            parts.append(init_vel)
            in_dim += 2
        x = jnp.concatenate(parts, -1)
        fc1 = in_dim // 2 - 1
        fc2 = fc1 // 2
        x = nn.relu(nn.Dense(fc1, name="fc1",
                             kernel_init=nn.initializers.xavier_uniform())(x))
        x = nn.relu(nn.Dense(fc2, name="fc2",
                             kernel_init=nn.initializers.xavier_uniform())(x))
        x = nn.Dense(1, name="fc3",
                     kernel_init=nn.initializers.xavier_uniform())(x)
        return nn.sigmoid(x)[..., 0]


def rotate_normalization(waypoint_traj, init_pose=None, init_vel=None):
    """Rotate so the first trajectory segment points along +x
    (reference _rotate_normalization, value_pose_net.py:73-103; the reference
    multiplies row-vectors by R(angle) on the right, i.e. rotates by −angle)."""
    eps = 1e-10
    x1 = waypoint_traj[:, 1, 0]
    y1 = waypoint_traj[:, 1, 1]
    near_zero = jnp.abs(x1) < eps
    x1 = jnp.where(near_zero, eps, x1)
    ang = jnp.arctan2(y1, x1)
    c, s = jnp.cos(ang), jnp.sin(ang)
    # row-vector × [[c,−s],[s,c]] == rotation by −ang of column vectors
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    traj = jnp.einsum("bwj,bji->bwi", waypoint_traj[..., :2], rot)
    if init_pose is not None:
        xy = jnp.einsum("bkj,bji->bki", init_pose[..., :2], rot)
        init_pose = jnp.concatenate([xy, init_pose[..., 2:]], -1)
    if init_vel is not None:
        init_vel = jnp.einsum("bj,bji->bi", init_vel[..., :2], rot)
    return traj, init_pose, init_vel


def embodied_motion_loss(value_fn_apply, params, pred_traj, init_pose=None,
                         init_vel=None):
    """The EmLoco loss: push predicted-trajectory plausibility toward 1
    (reference calc_embodied_motion_loss, value_pose_net.py:151-159)."""
    v = value_fn_apply(params, pred_traj, init_pose, init_vel)
    return jnp.mean((v - 1.0) ** 2)
