"""Predictor training with the EmLoco loss.

Semantics of the reference train_jta.py (:192-418) / train_jrdb.py:
  * WTA multi-head loss (MSE_LOSS_MULTI) or single-head MSE_LOSS
  * + Σ_heads valuenet.calc_embodied_motion_loss(origin ++ pred_traj,
    init_pose, init_vel) · valueloss_weight, with the LocoVal net FROZEN
    (train_jta.py:197-206, 288-308)
  * optional --valueloss_only mode (:282-283, 351-357)
  * Adam + step lr decay (:129-141), grad clip 1.0, best-ADE checkpointing

One jitted train step; the epoch loop is host-side over data batches (data
loading is the host's job; everything else stays on device).
"""
from __future__ import annotations

import functools
import pickle
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from . import data as data_mod
from . import metrics as M
from .model import TransMotion, TransMotionConfig
from ..learning.networks import ValuePoseNet


class PredictTrainConfig(struct.PyTreeNode):
    lr: float = struct.field(pytree_node=False, default=1e-4)
    lr_decay: float = struct.field(pytree_node=False, default=0.1)
    lr_decay_epochs: int = struct.field(pytree_node=False, default=20)
    grad_clip: float = struct.field(pytree_node=False, default=1.0)
    valueloss_weight: float = struct.field(pytree_node=False, default=0.3)
    valueloss_only: bool = struct.field(pytree_node=False, default=False)
    use_value_loss: bool = struct.field(pytree_node=False, default=False)
    # noisy-traj augmentation (reference train_jta.py:115-117 --add_noise):
    # gaussian jitter on the OBSERVED trajectory tokens only, teaching the
    # predictor to denoise perception jitter; ground truth stays clean
    traj_noise_std: float = struct.field(pytree_node=False, default=0.0)
    # JTA poses are exported z-up-flipped and un-flipped at consumption
    # (train_jta.py:266 `primary_init_pose[..., 2] *= -1`); the JRDB path
    # feeds poses as-is (train_jrdb.py:187 ships that line commented out)
    pose_z_flip: bool = struct.field(pytree_node=False, default=True)


class PredictTrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    vnet_params: Any       # frozen LocoVal net (None if unused)
    key: jnp.ndarray
    step: jnp.ndarray


class PredictorTrainer:
    def __init__(self, model_cfg: TransMotionConfig = TransMotionConfig(),
                 cfg: PredictTrainConfig = PredictTrainConfig(),
                 vnet: Optional[ValuePoseNet] = None):
        if getattr(model_cfg, "arch", "transmotion") == "lstm":
            from .lstm import LSTMPredictor
            self.model = LSTMPredictor(model_cfg)
        else:
            self.model = TransMotion(model_cfg)
        self.mcfg = model_cfg
        self.cfg = cfg
        self.vnet = vnet
        schedule = optax.exponential_decay(
            cfg.lr, cfg.lr_decay_epochs, cfg.lr_decay, staircase=True)
        self.tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                              optax.adam(schedule))

    def init(self, key, example_batch, vnet_params=None) -> PredictTrainState:
        obs, mask = example_batch[0], example_batch[1]
        k1, k2 = jax.random.split(key)
        # jit the flax init: eager init dispatches every op separately,
        # which on the remote-TPU backend is one RPC round-trip per op
        params = jax.jit(self.model.init)(
            {"params": k1, "mask": k1, "dropout": k1},
            jnp.asarray(obs), jnp.asarray(mask))
        return PredictTrainState(
            params=params,
            opt_state=self.tx.init(params),
            vnet_params=vnet_params,
            key=k2,
            step=jnp.zeros((), jnp.int32),
        )

    def _value_loss(self, vnet_params, pred_modes, init_pose, init_vel):
        """EmLoco loss, averaged over heads (train_jta.py:288-308).

        All nmode heads fold into the batch axis for ONE vnet apply — the
        round-1 per-head Python loop traced 20 separate MLP applies (plus
        their gradients) into the train step and dominated its XLA compile
        time."""
        B, Fp, Mm, _ = pred_modes.shape
        flat = jnp.moveaxis(pred_modes, 2, 1).reshape(B * Mm, Fp, 2)
        traj = data_mod.prepend_origin(flat)                 # (B·M,Fp+1,2)
        pose = (None if init_pose is None
                else jnp.repeat(init_pose, Mm, axis=0))
        vel = (None if init_vel is None
               else jnp.repeat(init_vel, Mm, axis=0))
        v = self.vnet.apply(vnet_params, traj, pose, vel)
        return jnp.mean((v - 1.0) ** 2)

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, ts: PredictTrainState, obs, mask, gt_future,
                   init_pose=None, init_vel=None):
        """init_pose/init_vel ride in from the SceneBatch: the reference
        reads the init pose from the RAW joints before normalization
        (train_jta.py:264-266) — after reference-exact normalization the
        last-obs pose tokens are identically zero, so they can't be read
        back out of `obs`. The z-flip happens here (train_jta.py:266)."""
        cfg = self.cfg
        key, k_mask, k_drop, k_noise = jax.random.split(ts.key, 4)

        if cfg.traj_noise_std > 0.0:
            jitter = cfg.traj_noise_std * jax.random.normal(
                k_noise, obs[..., 0:1, :2].shape, obs.dtype)
            obs = obs.at[..., 0:1, :2].add(jitter)

        if init_pose is not None and cfg.pose_z_flip:
            init_pose = init_pose * jnp.array([1.0, 1.0, -1.0])

        def loss_fn(p):
            out = self.model.apply(
                p, obs, mask, train=True,
                rngs={"mask": k_mask, "dropout": k_drop})   # (B,F,M,2)
            pred = out[:, data_mod.OBS_FRAMES:]             # (B,Fp,M,2)
            if self.mcfg.multi_modal:
                traj_loss = M.mse_loss_multi(pred, gt_future)
            else:
                traj_loss = M.mse_loss(pred[:, :, 0], gt_future)
            total = 0.0 if cfg.valueloss_only else traj_loss
            vloss = 0.0
            if self.vnet is not None and (cfg.use_value_loss
                                          or cfg.valueloss_only):
                vloss = self._value_loss(ts.vnet_params, pred, init_pose,
                                         init_vel)
                total = total + cfg.valueloss_weight * vloss
            return total, dict(traj_loss=traj_loss, value_loss=vloss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params)
        updates, opt_state = self.tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        ts = ts.replace(params=params, opt_state=opt_state, key=key,
                        step=ts.step + 1)
        aux["total"] = loss
        return ts, aux

    @functools.partial(jax.jit, static_argnums=0)
    def predict(self, params, obs, mask, limit_obs=0):
        # limit_obs is traced (one compiled program serves the whole
        # observation-length sweep); ≤0 means "all observed frames"
        out = self.model.apply(params, obs, mask, train=False,
                               limit_obs=limit_obs)
        return out[:, data_mod.OBS_FRAMES:]                 # (B,Fp,M,2)

    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _fit_epoch(self, ts, obs_s, mask_s, gt_s, pose_s, vel_s):
        """One epoch as a lax.scan over stacked batches (K, B, …) — ONE
        dispatch + ONE host sync per epoch. The reference's DataLoader loop
        (train_jta.py:224-384) — and our previous fit — paid a dispatch AND
        a blocking loss read per batch; over a remote-TPU link that is
        seconds of latency per epoch."""
        def body(ts, b):
            ts, aux = self.train_step(ts, *b)
            return ts, aux["traj_loss"]

        ts, losses = jax.lax.scan(
            body, ts, (obs_s, mask_s, gt_s, pose_s, vel_s))
        return ts, losses.mean()

    def fit(self, ts, dataset, epochs: int, batches_per_epoch: int,
            batch_size: int, log_every: int = 10, eval_dataset=None,
            mesh=None):
        """Epoch loop (reference train_jta.py main loop :224-384); each
        epoch's batches are stacked and scanned in one compiled call.

        With `mesh`, batches shard along their batch axis over the device
        mesh — the TPU-native replacement for the reference's torch
        DataParallel (train_jta.py:392); XLA inserts the gradient
        allreduce."""
        import contextlib

        place = lambda b: jnp.asarray(b)                    # noqa: E731
        ctx = contextlib.nullcontext()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = mesh.axis_names[0]
            sh = NamedSharding(mesh, P(None, axis))         # (K, B, …)
            place = lambda b: jax.device_put(jnp.asarray(b), sh)  # noqa: E731
            ctx = mesh
            ts = jax.device_put(ts, NamedSharding(mesh, P()))
        history = []
        best_ade = float("inf")
        best_params = ts.params
        for ep in range(epochs):
            bs = list(dataset.batches(batch_size, batches_per_epoch))
            stacks = [place(np.stack([b[i] for b in bs])) for i in range(5)]
            with ctx:
                ts, mean_loss = self._fit_epoch(ts, *stacks)
            entry = dict(epoch=ep, traj_loss=float(mean_loss))
            if eval_dataset is not None:
                evals = self.evaluate(ts.params, eval_dataset, batch_size,
                                      max(1, batches_per_epoch // 4))
                entry.update(evals)
                if evals["ade_min"] < best_ade:
                    best_ade = evals["ade_min"]
                    best_params = ts.params
            history.append(entry)
            # stream progress: multi-hour chip phases must be observable
            # before fit() returns (the jsonl logger only writes at the end)
            print({k: round(v, 4) if isinstance(v, float) else v
                   for k, v in entry.items()}, flush=True)
        return ts, history, best_params

    def evaluate(self, params, dataset, batch_size, num_batches):
        accs = []
        for obs, mask, gt, *_ in dataset.batches(batch_size, num_batches):
            pred = self.predict(params, obs, mask)
            r = M.ade_fde(pred, gt)
            accs.append({k: float(v) for k, v in r.items()
                         if not k.endswith("per_mode")})
        return {k: float(np.mean([a[k] for a in accs])) for k in accs[0]}

    # ------------------------------------------------------------------

    @staticmethod
    def save_checkpoint(path, ts: PredictTrainState, cfg_dict=None):
        """Checkpoint dict {model, optimizer, step, config} (reference
        train_jta.py:167-175)."""
        with open(path, "wb") as f:
            pickle.dump({
                "params": jax.tree.map(np.asarray, ts.params),
                "opt_state": jax.tree.map(np.asarray, ts.opt_state),
                "step": int(ts.step),
                "config": cfg_dict or {},
            }, f)

    @staticmethod
    def load_checkpoint(path):
        with open(path, "rb") as f:
            return pickle.load(f)
