"""PPO + AMP agent — the reference's training loop as one compiled program.

Semantics follow CommonAgent/AMPAgent
(/root/reference/pacer/pacer/learning/common_agent.py:35-757 and
amp_continuous.py:24-803) with hyperparameters from
amp_humanoid_smpl_sept_task.yaml:75-130, but the architecture is TPU-first:

  * The 32-step rollout is a `lax.scan` over the compiled env step — the
    reference's Python `for n in range(horizon)` loop (amp_continuous.py:
    106-165) pays a host sync per step; here an entire epoch (rollout + GAE +
    6 PPO mini-epochs + discriminator + buffers) is ONE jitted function.
  * The demo/replay machinery (reference replay_buffer.py:4-84 and
    amp_continuous.py:621-649) is a fixed-size ring buffer carried in the
    train state; demos are re-sampled from the motion library on device.
  * Combined reward 0.5·task + 0.5·disc with disc reward
    −log(1−σ(D))·scale (amp_continuous.py:659-692).
  * Discriminator loss: BCE + logit-reg + R1 gradient penalty on demo obs +
    weight decay (amp_continuous.py:536-598), via `jax.grad` through the
    disc input.
  * Motion-symmetry loss on flipped obs/actions (amp_continuous.py:517-534).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..envs import observations as obs_mod
from ..envs.pedestrian_terrain import PedestrianTerrainEnv
from .networks import AMPSeptCNNNet, AMPSeptValueNet
from .running_norm import RunningNorm


class AMPConfig(struct.PyTreeNode):
    horizon: int = struct.field(pytree_node=False, default=32)
    # reference yaml default minibatch_size=2560 of 1600·32=51200 → 20
    # (amp_humanoid_smpl_sept_task.yaml:103; the reference's own 1600-env
    # "dl41" run used 25600 → 2 minibatches — set via config when wanted)
    num_minibatches: int = struct.field(pytree_node=False, default=20)
    mini_epochs: int = struct.field(pytree_node=False, default=6)
    gamma: float = struct.field(pytree_node=False, default=0.99)
    tau: float = struct.field(pytree_node=False, default=0.95)
    lr: float = struct.field(pytree_node=False, default=2e-5)
    e_clip: float = struct.field(pytree_node=False, default=0.2)
    grad_norm: float = struct.field(pytree_node=False, default=50.0)
    actor_coef: float = struct.field(pytree_node=False, default=1.0)
    critic_coef: float = struct.field(pytree_node=False, default=5.0)
    bounds_coef: float = struct.field(pytree_node=False, default=10.0)
    disc_coef: float = struct.field(pytree_node=False, default=5.0)
    tv_coef: float = struct.field(pytree_node=False, default=5.0)
    sym_coef: float = struct.field(pytree_node=False, default=1.0)
    motion_sym_loss: bool = struct.field(pytree_node=False, default=True)
    disc_logit_reg: float = struct.field(pytree_node=False, default=0.01)
    disc_grad_penalty: float = struct.field(pytree_node=False, default=5.0)
    disc_weight_decay: float = struct.field(pytree_node=False, default=1e-4)
    disc_reward_scale: float = struct.field(pytree_node=False, default=2.0)
    task_reward_w: float = struct.field(pytree_node=False, default=0.5)
    disc_reward_w: float = struct.field(pytree_node=False, default=0.5)
    # reference buffer envelope (amp_humanoid_smpl_sept_task.yaml:110-115):
    # amp_replay_buffer_size 200k, amp_batch_size 1280 (dl41 run: 12800).
    # The reference inserts into replay with keep_prob=0.01; this ring
    # buffer inserts a random rollout subset instead (same recency profile
    # at steady state, no host-side RNG).
    amp_replay_size: int = struct.field(pytree_node=False, default=200_000)
    amp_batch_size: int = struct.field(pytree_node=False, default=1280)
    # whole-joint dropout on discriminator inputs (reference amp_dropout,
    # amp_models.py:20-90): independent masks for agent/replay/demo batches;
    # on by default (amp_humanoid_smpl_sept_task.yaml:126 amp_dropout: True)
    amp_dropout: bool = struct.field(pytree_node=False, default=True)
    amp_dropout_rate: float = struct.field(pytree_node=False, default=0.3)
    # bf16 hidden matmuls in actor/critic/disc (heads stay f32); the PPO
    # update is the MXU-bound half of the epoch at scale
    hidden_bf16: bool = struct.field(pytree_node=False, default=False)
    # network builder: "sept" (flat task MLP, reference
    # amp_network_sept_value_builder.py) or "sept_cnn" (conv encoder over
    # the sensor image, reference amp_network_sept_cnn_builder.py:17-164)
    network: str = struct.field(pytree_node=False, default="sept")
    normalize_input: bool = struct.field(pytree_node=False, default=True)
    normalize_value: bool = struct.field(pytree_node=False, default=True)
    normalize_advantage: bool = struct.field(pytree_node=False, default=True)
    # LocoVal reward normalization bounds (common_agent.py:154-155)
    max_cum_reward: float = struct.field(pytree_node=False, default=100.0)
    min_cum_reward: float = struct.field(pytree_node=False, default=-10.0)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    obs_norm: RunningNorm
    amp_norm: RunningNorm
    value_norm: RunningNorm
    env_state: Any
    replay_amp: jnp.ndarray          # (R, amp_dim)
    replay_ptr: jnp.ndarray
    replay_filled: jnp.ndarray
    key: jnp.ndarray
    epoch: jnp.ndarray
    # reward-combine weights as TRACED scalars: the getup curriculum flips
    # them per epoch (reference pre_epoch, amp_continuous.py:212-220:
    # disc-only during the fall phase, 0.5/0.5 after) — static cfg fields
    # would be baked into the first-compiled epoch
    task_reward_w: jnp.ndarray = None    # () f32
    disc_reward_w: jnp.ndarray = None    # () f32


class AMPAgent:
    """Holds env + nets + optimizer (static); all methods pure/jittable."""

    def __init__(self, env: PedestrianTerrainEnv, cfg: AMPConfig = AMPConfig()):
        self.env = env
        self.cfg = cfg
        ecfg = env.cfg
        self.amp_dim = ecfg.num_amp_obs_steps * ecfg.amp_obs_per_step
        net_kwargs = dict(
            num_actions=ecfg.num_actions,
            self_obs_dim=ecfg.self_obs_dim,
            traj_obs_dim=ecfg.num_traj_samples * 2,
            task_obs_dim=env.task_obs_dim,
            # crowd pointnet over the trailing group obs when present
            people_obs_dim=5 * 11 * 3 if ecfg.group_obs else 0,
            hidden_bf16=cfg.hidden_bf16,
        )
        if cfg.network == "sept_cnn":
            if ecfg.sensor_shape != "square" or not ecfg.terrain_obs:
                raise ValueError(
                    "sept_cnn needs the square res² sensor image "
                    f"(sensor_shape={ecfg.sensor_shape!r}, "
                    f"terrain_obs={ecfg.terrain_obs})")
            self.net = AMPSeptCNNNet(
                sensor_res=ecfg.sensor_res,
                sensor_channels=3 if ecfg.velocity_map else 1,
                **net_kwargs)
        elif cfg.network == "sept":
            self.net = AMPSeptValueNet(**net_kwargs)
        else:
            raise ValueError(f"unknown network {cfg.network!r}")
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_norm),
            optax.adam(cfg.lr),
        )

    # ------------------------------------------------------------------

    def init(self, key) -> TrainState:
        k1, k2, k3 = jax.random.split(key, 3)
        ecfg = self.env.cfg
        obs0 = jnp.zeros((1, self.env.obs_dim))
        amp0 = jnp.zeros((1, self.amp_dim))
        params = self.net.init(k1, obs0, amp0)
        env_state = self.env.reset(k2)
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            obs_norm=RunningNorm.create(self.env.obs_dim),
            amp_norm=RunningNorm.create(self.amp_dim),
            value_norm=RunningNorm.create(1),
            env_state=env_state,
            replay_amp=jnp.zeros((self.cfg.amp_replay_size, self.amp_dim)),
            replay_ptr=jnp.zeros((), jnp.int32),
            replay_filled=jnp.zeros((), jnp.int32),
            key=k3,
            epoch=jnp.zeros((), jnp.int32),
            task_reward_w=jnp.float32(self.cfg.task_reward_w),
            disc_reward_w=jnp.float32(self.cfg.disc_reward_w),
        )

    # ------------------------------------------------------------------
    # rollout
    # ------------------------------------------------------------------

    def _policy(self, params, obs_norm, obs, key):
        o = obs_norm.normalize(obs) if self.cfg.normalize_input else obs
        mu, sigma = self.net.apply(params, o, method=self.net.actor)
        a = mu + sigma * jax.random.normal(key, mu.shape)
        logp = self._logp(mu, sigma, a)
        return a, mu, sigma, logp, o

    @staticmethod
    def _logp(mu, sigma, a):
        return (-0.5 * (((a - mu) / sigma) ** 2)
                - jnp.log(sigma)
                - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)

    def _disc_reward(self, params, amp_norm, amp_obs):
        a = amp_norm.normalize(amp_obs)
        logit = self.net.apply(params, a, method=self.net.disc)
        prob = jax.nn.sigmoid(logit)
        return -jnp.log(jnp.maximum(1 - prob, 1e-4)) * self.cfg.disc_reward_scale

    def query_value_gradient(self, ts: TrainState, env_state, new_traj):
        """Critic value of the current state under a hypothetical future
        trajectory (N,S,3), and its gradient wrt that trajectory — the
        fully-functional version of the reference hook
        (humanoid_pedestrain_terrain.py:353-374 + amp_players.py:18, both
        left TODO/commented-out there): here the critic is differentiable
        end-to-end through the spliced location obs."""
        def value_sum(traj):
            o = self.env.observe_with_traj(env_state, traj)
            o_n = (ts.obs_norm.normalize(o) if self.cfg.normalize_input
                   else o)
            v = self.net.apply(ts.params, o_n, method=self.net.critic)
            return v.sum(), v
        grads, values = jax.grad(value_sum, has_aux=True)(new_traj)
        return values, grads

    def compute_gae(self, ts, batch, last_obs):
        """GAE over the scanned batch (reference discount_values,
        common_agent.py:573-587). ALL done steps bootstrap 0 — the env
        auto-resets inside step, so the next state belongs to a fresh
        episode and its value must not leak across the boundary (the
        reference masks `nextvalues` by dones the same way)."""
        cfg = self.cfg
        # combined reward
        disc_r = self._disc_reward(ts.params, ts.amp_norm, batch["amp_obs"])
        reward = (ts.task_reward_w * batch["reward"]
                  + ts.disc_reward_w * disc_r)

        o_n = ts.obs_norm.normalize(last_obs) if cfg.normalize_input else last_obs
        last_value = self.net.apply(ts.params, o_n, method=self.net.critic)
        if cfg.normalize_value:
            values = ts.value_norm.denormalize(batch["value"][..., None])[..., 0]
            last_value = ts.value_norm.denormalize(last_value[..., None])[..., 0]
        else:
            values = batch["value"]

        def gae_step(carry, x):
            adv_next, v_next = carry
            r, v, done = x
            nondone = 1.0 - done.astype(jnp.float32)
            delta = r + cfg.gamma * v_next * nondone - v
            adv = delta + cfg.gamma * cfg.tau * nondone * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            gae_step,
            (jnp.zeros_like(last_value), last_value),
            (reward, values, batch["done"]),
            reverse=True,
        )
        returns = advs + values
        return advs, returns, reward, disc_r

    # ------------------------------------------------------------------
    # losses
    # ------------------------------------------------------------------

    def _update_minibatch(self, params, opt_state, mb, demo_amp, replay_amp,
                          key):
        cfg = self.cfg
        half = replay_amp.shape[0]
        amp_rollout = mb["amp_n"][:half]

        if cfg.amp_dropout:
            # independent whole-joint masks for the three disc batches
            # (reference num_masks=3, amp_models.py:29-33); masks are
            # constants w.r.t. the gradient, applied to normalized features
            ecfg = self.env.cfg
            ks = jax.random.split(key, 3)
            mask = lambda k, x: x * obs_mod.amp_dropout_mask(
                k, x.shape[0], ecfg.num_amp_obs_steps, ecfg.amp_obs_per_step,
                cfg.amp_dropout_rate)
            amp_rollout = mask(ks[0], amp_rollout)
            replay_amp = mask(ks[1], replay_amp)
            demo_amp = mask(ks[2], demo_amp)

        def loss_fn(p):
            mu, sigma = self.net.apply(p, mb["obs_n"], method=self.net.actor)
            logp = self._logp(mu, sigma, mb["action"])
            # overflow guard: a tail state can move the policy far enough
            # within one epoch's mini-updates that exp(Δlogp) exceeds f32
            # range (inf·0 → NaN params); exp(16) ≈ 9e6 keeps the clipped
            # surrogate's gradients intact (clip range is ±e_clip ≈ 0.2)
            ratio = jnp.exp(jnp.clip(logp - mb["logp"], -16.0, 16.0))
            surr1 = ratio * mb["adv"]
            surr2 = jnp.clip(ratio, 1 - cfg.e_clip, 1 + cfg.e_clip) * mb["adv"]
            a_loss = -jnp.minimum(surr1, surr2).mean()

            v = self.net.apply(p, mb["obs_n"], method=self.net.critic)
            c_loss = 0.5 * jnp.mean((v - mb["ret_n"]) ** 2)

            b_loss = jnp.mean(
                jnp.sum(jnp.clip(mu - 1.1, 0, None) ** 2
                        + jnp.clip(mu + 1.1, None, 0) ** 2, -1))

            # discriminator: agent (rollout ∪ replay, half each — reference
            # amp_continuous.py:621-649) vs demo
            def disc_logit(x):
                return self.net.apply(p, x, method=self.net.disc)

            agent_amp = jnp.concatenate([amp_rollout, replay_amp], 0)
            agent_logit = disc_logit(agent_amp)
            demo_logit = disc_logit(demo_amp)
            d_loss = 0.5 * (
                jnp.mean(jax.nn.softplus(agent_logit))       # BCE label 0
                + jnp.mean(jax.nn.softplus(-demo_logit)))    # BCE label 1
            # squared weights of the disc logit layer (amp_continuous.py:553)
            logit_reg = jnp.sum(p["params"]["disc_logits"]["kernel"] ** 2)
            grad = jax.grad(lambda x: disc_logit(x).sum())(demo_amp)
            grad_pen = jnp.mean(jnp.sum(grad ** 2, -1))
            # all disc weights incl. the logit kernel (reference
            # get_disc_weights sums mlp + logit layers)
            w_decay = sum(
                jnp.sum(p["params"][k]["kernel"] ** 2)
                for k in p["params"]
                if k.startswith("disc_mlp")) + logit_reg
            disc_total = (d_loss + cfg.disc_logit_reg * logit_reg
                          + cfg.disc_grad_penalty * grad_pen
                          + cfg.disc_weight_decay * w_decay)

            # auxiliary task-value head toward normalized returns
            tv = self.net.apply(p, mb["obs_n"], method=self.net.task_value)
            tv_loss = jnp.mean((tv - mb["ret_01"]) ** 2)

            total = (cfg.actor_coef * a_loss + cfg.critic_coef * c_loss
                     + cfg.bounds_coef * b_loss + cfg.disc_coef * disc_total
                     + cfg.tv_coef * tv_loss)

            if cfg.motion_sym_loss:
                mu_f, _ = self.net.apply(p, mb["flip_obs_n"],
                                         method=self.net.actor)
                sym = jnp.mean(jnp.sum(
                    (mu - obs_mod.flip_actions(mu_f)) ** 2, -1))
                total = total + cfg.sym_coef * sym

            metrics = dict(a_loss=a_loss, c_loss=c_loss, b_loss=b_loss,
                           d_loss=d_loss, grad_pen=grad_pen, tv_loss=tv_loss)
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        # Nonfinite-update guard: one pathological minibatch (physics tail
        # event in the getup/self-contact regime) must not permanently NaN
        # the params — global-norm clipping propagates NaN instead of
        # rejecting it. Skip the update (params AND optimizer state) when any
        # grad is nonfinite and count it, so a diverging run degrades into a
        # visible `nonfinite_grad` rate instead of a dead policy
        # (pipeline_r4c3: params NaNed by epoch 10, loc_reward flat at the
        # reset baseline for the remaining 290 epochs).
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g))
             for g in jax.tree_util.tree_leaves(grads)]))
        updates, new_opt = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda n, o: jnp.where(finite, n, o) \
            if isinstance(n, jnp.ndarray) else n
        params = jax.tree_util.tree_map(keep, new_params, params)
        opt_state = jax.tree_util.tree_map(keep, new_opt, opt_state)
        metrics["total"] = loss
        # a skipped minibatch must not NaN the epoch's averaged loss metrics
        # either — mask them out and let nonfinite_grad carry the signal
        metrics = {k: jnp.where(finite, v, 0.0) for k, v in metrics.items()}
        metrics["nonfinite_grad"] = 1.0 - finite.astype(jnp.float32)
        return params, opt_state, metrics

    def update_getup_reward_schedule(self, ts: TrainState, epoch: int,
                                     update_epoch: int) -> TrainState:
        """Getup reward-weight curriculum (reference pre_epoch,
        amp_continuous.py:212-220): disc-only reward while the policy learns
        to get up from the fall bank, the configured task/disc mix after.
        Weights are traced TrainState scalars, so the flip reaches the
        already-compiled epoch without retracing."""
        early = epoch <= update_epoch
        return ts.replace(
            task_reward_w=jnp.float32(
                0.0 if early else self.cfg.task_reward_w),
            disc_reward_w=jnp.float32(
                1.0 if early else self.cfg.disc_reward_w))

    # ------------------------------------------------------------------
    # epoch
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def train_epoch(self, ts: TrainState):
        cfg = self.cfg
        ecfg = self.env.cfg
        N = ecfg.num_envs
        T = cfg.horizon

        # Observations thread through the scan carry: the policy consumes
        # out.obs from the previous step (so obs-noise DR actually reaches
        # training) and each sensor sweep is computed exactly once. Flipped
        # obs for the symmetry loss still need their own sensor pass
        # (heightmaps can't be flipped feature-level).
        def step_fn(carry, _):
            env_state, obs, key = carry
            key, k_act = jax.random.split(key)
            # feature-space mirror of the already-computed obs — a second
            # state-based obs pass (sensor sweep included) cost 0.55 s/epoch
            flip_obs = (self.env.observe_flipped_from(obs)
                        if cfg.motion_sym_loss else obs)
            a, mu, sigma, logp, o_n = self._policy(ts.params, ts.obs_norm,
                                                   obs, k_act)
            value = self.net.apply(ts.params, o_n, method=self.net.critic)
            new_env_state, out = self.env.step(env_state, a)
            data = dict(obs=obs, flip_obs=flip_obs, action=a, logp=logp,
                        value=value, reward=out.reward, done=out.done,
                        terminated=out.terminated, amp_obs=out.amp_obs,
                        reward_raw=out.reward_raw)
            return (new_env_state, out.obs, key), data

        key, k_roll, k_demo, k_perm, k_replay = jax.random.split(ts.key, 5)
        # obs0 is the one learning-facing tensor that does NOT pass through
        # StepOutput's sanitizer (it is computed straight from the carried
        # env_state) — a diverged-but-unrecycled env here would poison the
        # first policy call's grads
        obs0 = jnp.nan_to_num(self.env.observe(ts.env_state),
                              nan=0.0, posinf=0.0, neginf=0.0)
        (env_state, last_obs, _), batch = jax.lax.scan(
            step_fn, (ts.env_state, obs0, k_roll), None, length=T)
        # hard-negative motion sampling: refresh the live per-motion
        # sampling probabilities from this epoch's episode outcomes
        # (reference update_sampling_weight, motion_lib_smpl.py:366-387;
        # no-op unless env cfg.hard_negative)
        env_state = self.env.apply_hard_negative_update(env_state)
        ts = ts.replace(env_state=env_state, key=key)

        advs, returns, comb_reward, disc_r = self.compute_gae(ts, batch,
                                                              last_obs)

        # normalization updates (obs/amp/value)
        flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        obs_f = flat(batch["obs"])
        amp_f = flat(batch["amp_obs"])
        if cfg.normalize_input:
            ts = ts.replace(obs_norm=ts.obs_norm.update(obs_f))
        ts = ts.replace(amp_norm=ts.amp_norm.update(amp_f))
        ret_f = flat(returns)
        if cfg.normalize_value:
            ts = ts.replace(value_norm=ts.value_norm.update(ret_f[:, None]))
            ret_n = ts.value_norm.normalize(ret_f[:, None], clip=1e6)[:, 0]
        else:
            ret_n = ret_f

        adv_f = flat(advs)
        if cfg.normalize_advantage:
            adv_f = (adv_f - adv_f.mean()) / (adv_f.std() + 1e-8)

        # returns mapped to [0,1] for the task-value head (LocoVal bounds)
        ret01 = jnp.clip((ret_f - cfg.min_cum_reward)
                         / (cfg.max_cum_reward - cfg.min_cum_reward), 0, 1)

        # replay buffer update (ring; reference amp_continuous.py:621-649).
        # When the rollout exceeds the insert budget, a random subset goes in
        # (taking the first rows would bias the buffer toward early steps).
        R = cfg.amp_replay_size
        key, k_ins, k_sel = jax.random.split(key, 3)
        ts = ts.replace(key=key)
        n_new = min(T * N, R)
        src = (jax.random.choice(k_ins, T * N, (n_new,), replace=False)
               if T * N > R else jnp.arange(n_new))
        idx = (ts.replay_ptr + jnp.arange(n_new)) % R
        replay = ts.replay_amp.at[idx].set(amp_f[src])
        ts = ts.replace(
            replay_amp=replay,
            replay_ptr=(ts.replay_ptr + n_new) % R,
            replay_filled=jnp.minimum(ts.replay_filled + n_new, R),
        )

        # replay half of the discriminator's agent batch (falls back to
        # rollout samples until the buffer has history)
        half = max(1, cfg.amp_batch_size // 2)
        total_r = cfg.num_minibatches * half
        ridx = jax.random.randint(k_sel, (total_r,), 0,
                                  jnp.maximum(ts.replay_filled, 1))
        replay_rows = jnp.where(ts.replay_filled > 0,
                                ts.replay_amp[ridx],
                                amp_f[ridx % (T * N)])

        # assemble normalized minibatch pools
        obs_n = ts.obs_norm.normalize(obs_f) if cfg.normalize_input else obs_f
        flip_n = (ts.obs_norm.normalize(flat(batch["flip_obs"]))
                  if cfg.normalize_input else flat(batch["flip_obs"]))
        amp_pool_agent = ts.amp_norm.normalize(amp_f)

        data = dict(obs_n=obs_n, flip_obs_n=flip_n,
                    action=flat(batch["action"]), logp=flat(batch["logp"]),
                    adv=adv_f, ret_n=ret_n, ret_01=ret01, amp_n=amp_pool_agent)

        batch_size = T * N
        mb_size = batch_size // cfg.num_minibatches

        # demos follow the same live sampling distribution as the resets
        # (the reference's fetch_amp_obs_demo shares _sampling_prob)
        demo_raw = self.env.fetch_amp_obs_demo(
            k_demo, cfg.num_minibatches * cfg.amp_batch_size,
            motion_weights=env_state.motion_weights)
        demo_n = ts.amp_norm.normalize(demo_raw).reshape(
            cfg.num_minibatches, cfg.amp_batch_size, -1)
        replay_n = ts.amp_norm.normalize(replay_rows).reshape(
            cfg.num_minibatches, half, -1)

        def mini_epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, batch_size)

            def mb_step(carry2, i):
                params, opt_state = carry2
                sel = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
                mb = {k2: v[sel] for k2, v in data.items()}
                j = i % cfg.num_minibatches
                params, opt_state, metrics = self._update_minibatch(
                    params, opt_state, mb, demo_n[j], replay_n[j],
                    jax.random.fold_in(k, i))
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mb_step, (params, opt_state),
                jnp.arange(cfg.num_minibatches))
            return (params, opt_state), metrics

        keys = jax.random.split(k_perm, cfg.mini_epochs)
        (params, opt_state), metrics = jax.lax.scan(
            mini_epoch, (ts.params, ts.opt_state), keys)
        ts = ts.replace(params=params, opt_state=opt_state,
                        epoch=ts.epoch + 1)

        metrics = jax.tree.map(lambda x: x.mean(), metrics)
        metrics.update(
            task_reward=batch["reward"].mean(),
            disc_reward=disc_r.mean(),
            combined_reward=comb_reward.mean(),
            episode_done_frac=batch["done"].mean(),
            loc_reward=batch["reward_raw"][..., 0].mean(),
            power_reward=batch["reward_raw"][..., 1].mean(),
        )
        return ts, metrics
