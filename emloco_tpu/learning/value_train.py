"""LocoVal function training — regress plausibility values from rollouts.

Semantics of the reference's AMPValueAgent
(/root/reference/pacer/pacer/learning/amp_continuous_value.py:23-454) and the
finetune plumbing in CommonAgent (common_agent.py:69-108, 154-155):

  * roll out a FROZEN pretrained policy;
  * accumulate the per-env discounted combined reward
    γᵗ·(w_task·task + w_disc·disc) (amp_continuous_value.py:93-117);
  * heading-inverted (negative-sample) envs get reward ×(−0.3)
    (:63-64, inversion_penalty_scale);
  * latch the return at episode end OR step_to_pred=144 (:106-109);
  * regress ValuePoseNet(waypoints[:13], init_pose, init_vel) to the
    normalized return (G − min)/(max − min), min=−10 max=100, MSE, AdamW with
    cosine warmup schedule (:123-146; scheduler.py:5-60).

The whole epoch (rollout + latching + value update) is one jitted function.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .amp_agent import AMPAgent, TrainState
from .networks import ValuePoseNet


class ValueTrainConfig(struct.PyTreeNode):
    horizon: int = struct.field(pytree_node=False, default=32)
    gamma: float = struct.field(pytree_node=False, default=0.99)
    step_to_pred: int = struct.field(pytree_node=False, default=144)
    inversion_penalty: float = struct.field(pytree_node=False, default=0.3)
    # fraction of real-bank trajectories flipped 180° as hard negatives
    # during valuenet training (the reference trains the valuenet with
    # --heading_inversion, which inverts half, traj_generator.py:195-200)
    heading_inversion_prob: float = struct.field(pytree_node=False,
                                                 default=0.5)
    max_cum: float = struct.field(pytree_node=False, default=100.0)
    min_cum: float = struct.field(pytree_node=False, default=-10.0)
    lr: float = struct.field(pytree_node=False, default=1e-3)
    warmup_steps: int = struct.field(pytree_node=False, default=100)
    total_steps: int = struct.field(pytree_node=False, default=25000)
    weight_decay: float = struct.field(pytree_node=False, default=1e-4)


class ValueTrainState(struct.PyTreeNode):
    policy: TrainState               # frozen (never updated here)
    vnet_params: Any
    vnet_opt: Any
    cum_reward: jnp.ndarray          # (N,) discounted accumulator
    disc_factor: jnp.ndarray         # (N,) current γ^t
    already_latched: jnp.ndarray     # (N,) bool
    key: jnp.ndarray
    epoch: jnp.ndarray


class LocoValTrainer:
    def __init__(self, agent: AMPAgent, vnet: ValuePoseNet,
                 cfg: ValueTrainConfig = ValueTrainConfig()):
        self.agent = agent
        self.env = agent.env
        self.vnet = vnet
        self.cfg = cfg
        schedule = optax.warmup_cosine_decay_schedule(
            cfg.lr * 0.1, cfg.lr, cfg.warmup_steps, cfg.total_steps,
            cfg.lr * 0.01)
        self.tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)

    def init(self, policy_ts: TrainState, key) -> ValueTrainState:
        n = self.env.cfg.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        wp = jnp.zeros((1, self.vnet.num_waypoints, 2))
        pose = jnp.zeros((1, 24, 3))
        vel = jnp.zeros((1, 2))
        params = self.vnet.init(k1, wp, pose, vel)
        # fresh episodes: a mid-episode env inherited from policy training
        # would latch a truncated return (cum missing its earlier rewards)
        # as the very first regression target of every env
        policy_ts = policy_ts.replace(env_state=self.env.reset(k3))
        return ValueTrainState(
            policy=policy_ts,
            vnet_params=params,
            vnet_opt=self.tx.init(params),
            cum_reward=jnp.zeros((n,)),
            disc_factor=jnp.ones((n,)),
            already_latched=jnp.zeros((n,), bool),
            key=k2,
            epoch=jnp.zeros((), jnp.int32),
        )

    def _collect(self, ts: ValueTrainState):
        """Frozen-policy rollout with return latching — shared by training
        and (read-only) evaluation."""
        cfg = self.cfg
        agent = self.agent
        pol = ts.policy

        def step_fn(carry, _):
            env_state, cum, factor, already, key = carry
            key, k_act = jax.random.split(key)
            obs = self.env.observe(env_state)
            a, *_ = agent._policy(pol.params, pol.obs_norm, obs, k_act)
            # capture pre-step LocoVal inputs (episode identity)
            wp = env_state.waypoint_traj
            pose = env_state.init_pose
            vel = env_state.init_vel
            inverted = env_state.inverted
            prog = env_state.progress
            new_env_state, out = self.env.step(env_state, a)

            disc_r = agent._disc_reward(pol.params, pol.amp_norm, out.amp_obs)
            r = (agent.cfg.task_reward_w * out.reward
                 + agent.cfg.disc_reward_w * disc_r)
            r = jnp.where(inverted, -cfg.inversion_penalty * r, r)
            cum = cum + factor * r

            hit_pred = (prog + 1) >= cfg.step_to_pred
            latch = (out.done | hit_pred) & (~already)
            target = jnp.clip((cum - cfg.min_cum)
                              / (cfg.max_cum - cfg.min_cum), 0.0, 1.0)

            sample = dict(wp=wp[:, :self.vnet.num_waypoints], pose=pose,
                          vel=vel, target=target,
                          valid=latch.astype(jnp.float32),
                          inv=inverted.astype(jnp.float32))

            already = (already | latch) & (~out.done)
            cum = jnp.where(out.done, 0.0, cum)
            factor = jnp.where(out.done, 1.0, factor * cfg.gamma)
            return (new_env_state, cum, factor, already, key), sample

        key, k_roll = jax.random.split(ts.key)
        carry0 = (pol.env_state, ts.cum_reward, ts.disc_factor,
                  ts.already_latched, k_roll)
        (env_state, cum, factor, already, _), samples = jax.lax.scan(
            step_fn, carry0, None, length=cfg.horizon)

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        samples = {k: flat(v) for k, v in samples.items()}
        ts = ts.replace(
            policy=pol.replace(env_state=env_state),
            cum_reward=cum,
            disc_factor=factor,
            already_latched=already,
            key=key,
        )
        return ts, samples

    @functools.partial(jax.jit, static_argnums=0)
    def train_epoch(self, ts: ValueTrainState):
        ts, s = self._collect(ts)
        wp, pose, vel = s["wp"], s["pose"], s["vel"]
        target, valid = s["target"], s["valid"]

        def loss_fn(p):
            pred = self.vnet.apply(p, wp, pose, vel)
            se = (pred - target) ** 2 * valid
            return se.sum() / jnp.maximum(valid.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(ts.vnet_params)
        updates, vnet_opt = self.tx.update(grads, ts.vnet_opt, ts.vnet_params)
        vnet_params = optax.apply_updates(ts.vnet_params, updates)

        ts = ts.replace(vnet_params=vnet_params, vnet_opt=vnet_opt,
                        epoch=ts.epoch + 1)
        inv = s["inv"]
        metrics = dict(vnet_loss=loss, num_latched=valid.sum(),
                       mean_target=(target * valid).sum()
                       / jnp.maximum(valid.sum(), 1.0),
                       # hard-negative visibility: what fraction of latched
                       # episodes were heading-inverted, and how depressed
                       # their latched targets are vs the positives
                       inverted_frac=(inv * valid).sum()
                       / jnp.maximum(valid.sum(), 1.0),
                       inverted_target=(target * valid * inv).sum()
                       / jnp.maximum((valid * inv).sum(), 1.0))
        return ts, metrics

    @functools.partial(jax.jit, static_argnums=0)
    def eval_epoch(self, ts: ValueTrainState):
        """Read-only rollout epoch: (pred, realized target, valid) triplets at
        latch events. No vnet update (evaluation must not train)."""
        ts, s = self._collect(ts)
        pred = self.vnet.apply(ts.vnet_params, s["wp"], s["pose"], s["vel"])
        return ts, (pred, s["target"], s["valid"])

    def collect_predictions(self, ts: ValueTrainState, num_epochs: int = 4):
        """Valid (prediction, realized target) pairs over num_epochs
        read-only rollout epochs, concatenated. Returns (ts, preds, targets)
        as host numpy — the single collection loop behind evaluate() and the
        qualitative eval artifacts (players.save_eval_artifacts)."""
        import numpy as np
        preds, targets = [], []
        for _ in range(num_epochs):
            ts, (p, t, v) = self.eval_epoch(ts)
            m = np.asarray(v) > 0
            preds.append(np.asarray(p)[m])
            targets.append(np.asarray(t)[m])
        return ts, np.concatenate(preds), np.concatenate(targets)

    @staticmethod
    def prediction_stats(preds, targets):
        """(mse, correlation) of valuenet predictions vs realized returns."""
        import numpy as np
        if len(preds) == 0:
            return float("nan"), 0.0
        mse = float(((preds - targets) ** 2).mean())
        corr = (float(np.corrcoef(preds, targets)[0, 1])
                if preds.std() > 1e-6 and targets.std() > 1e-6 else 0.0)
        return mse, corr

    def evaluate(self, ts: ValueTrainState, num_epochs: int = 4):
        """Value-prediction quality over LATCHED episodes only: prediction
        from the episode's (waypoints, init pose, init vel) vs the realized
        normalized return at done/step_to_pred (reference
        AMPPlayerContinuousValue.run, amp_value_players.py:37-275).
        Returns (ts, mse, correlation)."""
        ts, p, t = self.collect_predictions(ts, num_epochs)
        mse, corr = self.prediction_stats(p, t)
        return ts, mse, corr
