"""LSTM baseline: shapes, trainability, EmLoco-loss compatibility.

Reference counterpart: social-transmotion LSTM baseline configs
(configs/*lstm.yaml) trained through the same train/eval harness.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.prediction.data import SyntheticScenes
from emloco_tpu.prediction.model import TransMotionConfig
from emloco_tpu.prediction.train import PredictorTrainer, PredictTrainConfig


def _trainer(**kw):
    mcfg = TransMotionConfig(arch="lstm", nhid=32, nmode=3, **kw)
    return PredictorTrainer(mcfg, PredictTrainConfig(lr=1e-3))


def test_lstm_predict_shapes():
    trainer = _trainer()
    ds = SyntheticScenes(num_people=2, seed=0)
    obs, mask, gt, *_ = next(ds.batches(4, 1))
    ts = trainer.init(jax.random.PRNGKey(0), (obs, mask, gt))
    pred = trainer.predict(ts.params, obs, mask)
    assert pred.shape == (4, 12, 3, 2)
    assert np.isfinite(np.asarray(pred)).all()
    # zero-init output head → initial prediction is constant-position
    np.testing.assert_allclose(pred[:, 0], pred[:, -1], atol=1e-5)


def test_lstm_trains():
    trainer = _trainer()
    ds = SyntheticScenes(num_people=2, seed=0)
    batch = ds.batch(8)
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    losses = []
    for b in ds.batches(8, 12):
        ts, aux = trainer.train_step(ts, *b)
        losses.append(float(aux["traj_loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_lstm_with_value_loss():
    from emloco_tpu.learning.networks import ValuePoseNet

    vnet = ValuePoseNet(use_pose=True, use_vel=True)
    vp = vnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 13, 2)),
                   jnp.zeros((1, 24, 3)), jnp.zeros((1, 2)))
    mcfg = TransMotionConfig(arch="lstm", nhid=32, nmode=3)
    trainer = PredictorTrainer(
        mcfg, PredictTrainConfig(lr=1e-3, use_value_loss=True,
                                 valueloss_weight=0.1), vnet=vnet)
    ds = SyntheticScenes(num_people=2, seed=0)
    batch = ds.batch(4)
    ts = trainer.init(jax.random.PRNGKey(0), batch, vnet_params=vp)
    obs, mask, gt, *_ = batch
    ts, aux = trainer.train_step(ts, *batch)
    assert "value_loss" in aux and np.isfinite(float(aux["value_loss"]))
