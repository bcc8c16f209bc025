import jax
import jax.numpy as jnp
import numpy as np

from emloco_tpu.learning.networks import ValuePoseNet
from emloco_tpu.prediction import TransMotion, TransMotionConfig
from emloco_tpu.prediction import data as data_mod
from emloco_tpu.prediction import metrics as M
from emloco_tpu.prediction.evaluate import evaluate_with_filter
from emloco_tpu.prediction.train import (
    PredictTrainConfig,
    PredictorTrainer,
)

TINY = TransMotionConfig(nhid=32, dim_ff=64, nlayers_local=1,
                         nlayers_global=1, nmode=3)


def test_synthetic_scenes_shapes():
    ds = data_mod.SyntheticScenes(num_people=3, seed=0)
    obs, mask, gt, *_ = ds.batch(2)
    assert obs.shape == (2, 9, 3, 49, 4)
    assert mask.shape == (2, 3)
    assert gt.shape == (2, 12, 2)
    # normalization: primary agent's last obs position is the origin
    np.testing.assert_allclose(np.asarray(obs[:, 8, 0, 0, :2]), 0.0,
                               atol=1e-5)
    # poses are kinematically sane: root-relative z spans roughly a body
    z = np.asarray(obs[..., 3:27, 2])
    assert z.max() < 1.5 and z.min() > -1.5


def test_model_forward_shapes():
    ds = data_mod.SyntheticScenes(num_people=2, seed=0)
    obs, mask, gt, *_ = ds.batch(2)
    model = TransMotion(TINY)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "mask": key, "dropout": key},
                        obs, mask)
    out = model.apply(params, obs, mask, train=False)
    assert out.shape == (2, 21, 3, 2)
    assert np.all(np.isfinite(np.asarray(out)))
    # train mode with rngs
    out_t = model.apply(params, obs, mask, train=True,
                        rngs={"mask": key, "dropout": key})
    assert out_t.shape == (2, 21, 3, 2)


def test_metrics():
    B, Fp, Mm = 4, 12, 3
    key = jax.random.PRNGKey(0)
    gt = jax.random.normal(key, (B, Fp, 2))
    pred = jnp.tile(gt[:, :, None], (1, 1, Mm, 1))
    # perfect prediction in one mode → min metrics 0
    r = M.ade_fde(pred, gt)
    assert float(r["ade_min"]) < 1e-6
    assert float(M.mse_loss_multi(pred, gt)) < 1e-4
    # WTA: corrupt all but one mode; min stays 0
    pred2 = pred.at[:, :, 1:].add(10.0)
    assert float(M.mse_loss_multi(pred2, gt)) < 1e-4
    r2 = M.ade_fde(pred2, gt)
    assert float(r2["ade_min"]) < 1e-6
    assert float(r2["ade_worst"]) > 5.0


def test_locoval_filter():
    vals = jnp.array([[0.9, 0.1, 0.8], [0.1, 0.2, 0.3]])
    pred = jnp.zeros((2, 12, 3, 2))
    keep = M.locoval_filter(pred, vals, 0.7)
    np.testing.assert_array_equal(np.asarray(keep),
                                  [[True, False, True],
                                   [False, False, True]])  # argmax fallback


def test_train_step_reduces_loss():
    ds = data_mod.SyntheticScenes(num_people=2, seed=0)
    trainer = PredictorTrainer(TINY, PredictTrainConfig(lr=1e-3))
    batch = ds.batch(4)
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    obs, mask, gt, *_ = batch
    losses = []
    for _ in range(12):
        ts, aux = trainer.train_step(ts, *batch)
        losses.append(float(aux["traj_loss"]))
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_train_with_emloco_loss():
    ds = data_mod.SyntheticScenes(num_people=2, seed=0)
    vnet = ValuePoseNet(use_pose=True, use_vel=True)
    key = jax.random.PRNGKey(0)
    vp = vnet.init(key, jnp.zeros((1, 13, 2)), jnp.zeros((1, 24, 3)),
                   jnp.zeros((1, 2)))
    trainer = PredictorTrainer(
        TINY, PredictTrainConfig(lr=1e-3, use_value_loss=True,
                                 valueloss_weight=0.5), vnet=vnet)
    batch = ds.batch(2)
    ts = trainer.init(key, batch, vnet_params=vp)
    obs, mask, gt, *_ = batch
    ts, aux = trainer.train_step(ts, *batch)
    assert np.isfinite(float(aux["value_loss"]))
    assert float(aux["value_loss"]) > 0


def test_value_loss_fold_matches_per_head_loop():
    """The mode-folded single vnet apply must equal the reference's per-head
    loop (train_jta.py:288-308): mean over heads of mean-squared (v-1)."""
    vnet = ValuePoseNet(use_pose=True, use_vel=True)
    key = jax.random.PRNGKey(3)
    vp = vnet.init(key, jnp.zeros((1, 13, 2)), jnp.zeros((1, 24, 3)),
                   jnp.zeros((1, 2)))
    trainer = PredictorTrainer(TINY, PredictTrainConfig(), vnet=vnet)
    B, Fp, Mm = 3, 12, 4
    ks = jax.random.split(key, 3)
    pred = jax.random.normal(ks[0], (B, Fp, Mm, 2))
    pose = jax.random.normal(ks[1], (B, 24, 3)) * 0.3
    vel = jax.random.normal(ks[2], (B, 2))
    folded = float(trainer._value_loss(vp, pred, pose, vel))
    per_head = []
    for m in range(Mm):
        traj = data_mod.prepend_origin(pred[:, :, m])
        v = vnet.apply(vp, traj, pose, vel)
        per_head.append(float(jnp.mean((v - 1.0) ** 2)))
    np.testing.assert_allclose(folded, np.mean(per_head), rtol=1e-5)


def test_evaluate_with_filter():
    ds = data_mod.SyntheticScenes(num_people=2, seed=1)
    vnet = ValuePoseNet(use_pose=True, use_vel=True)
    key = jax.random.PRNGKey(0)
    vp = vnet.init(key, jnp.zeros((1, 13, 2)), jnp.zeros((1, 24, 3)),
                   jnp.zeros((1, 2)))
    trainer = PredictorTrainer(TINY)
    batch = ds.batch(2)
    ts = trainer.init(key, batch)
    out = evaluate_with_filter(trainer, ts.params, ds, 2, 2,
                               vnet=vnet, vnet_params=vp)
    for k in ("ade_min", "fde_min", "ade_filtered_min", "ade_value_pick",
              "ade_random_pick", "gt_value_mean", "chi2_speed"):
        assert k in out and np.isfinite(out[k]), k


def test_eqmotion_equivariance_and_training():
    from emloco_tpu.prediction.eqmotion import (
        EqMotionConfig, EqMotionTrainer, synthetic_eth_batch)

    cfg = EqMotionConfig(hidden_nf=16, hid_channel=8, n_layers=2, nmode=3)
    trainer = EqMotionTrainer(cfg, lr=1e-3)
    key = jax.random.PRNGKey(0)
    past, future = synthetic_eth_batch(key, batch=4, agents=3)
    ts, _ = trainer.init(key, past)
    pred = trainer.predict(ts.params, past)
    assert pred.shape == (4, 3, 3, 12, 2)

    # rotation equivariance: R·f(x) == f(R·x)
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    R = jnp.asarray(np.array([[c, -s], [s, c]], np.float32))
    pred_rot = trainer.predict(ts.params, jnp.einsum("ij,batj->bati", R, past))
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("ij,bamtj->bamti", R, pred)),
        np.asarray(pred_rot), atol=2e-3)
    # translation equivariance
    shift = jnp.array([3.0, -2.0])
    pred_sh = trainer.predict(ts.params, past + shift)
    np.testing.assert_allclose(np.asarray(pred + shift), np.asarray(pred_sh),
                               atol=2e-3)

    # training reduces WTA loss
    losses = []
    for i in range(10):
        ts, aux = trainer.train_step(ts, None, past, future)
        losses.append(float(aux["wta"]))
    assert losses[-1] < losses[0]


def test_eqmotion_with_locoval():
    from emloco_tpu.prediction.eqmotion import (
        EqMotionConfig, EqMotionTrainer, synthetic_eth_batch)

    cfg = EqMotionConfig(hidden_nf=16, hid_channel=8, n_layers=1, nmode=2)
    vnet = ValuePoseNet(use_pose=False, use_vel=True)
    key = jax.random.PRNGKey(0)
    vp = vnet.init(key, jnp.zeros((1, 13, 2)), None, jnp.zeros((1, 2)))
    trainer = EqMotionTrainer(cfg, lr=1e-3, vnet=vnet, valueloss_w=0.5)
    past, future = synthetic_eth_batch(key, batch=2, agents=2)
    ts, vp = trainer.init(key, past, vnet_params=vp)
    ts, aux = trainer.train_step(ts, vp, past, future)
    assert np.isfinite(float(aux["value_loss"]))
    assert float(aux["value_loss"]) > 0
    # test-time LocoVal filter metrics (reference main_eth_diverse.py:189)
    out = trainer.evaluate(ts.params, past, future, vnet_params=vp,
                           threshold=0.0)
    assert "ade_filtered_min" in out and np.isfinite(out["ade_filtered_min"])
    assert 0.0 <= out["mean_value"] <= 1.0
    # threshold 0 keeps every mode → filtered-min == min over modes
    np.testing.assert_allclose(out["ade_filtered_min"], out["ade_min"],
                               rtol=1e-5)


def test_synthetic_pose_raw_convention_is_z_down():
    """Raw JTA exports carry z-DOWN poses (the reference flips z at
    consumption, train_jta.py:266). The synthetic generator's FK frame is
    z-up, so scene()/batch() must negate z — otherwise the consumption flip
    hands the sim-trained valuenet upside-down skeletons (measured: GT
    trajectories scored 0.346 vs 0.384 flipped/unflipped on the r12 eval).
    A standing human's furthest-from-root joints are the FEET (~0.9 m below
    root) — in the physical z-up frame the largest |z| is negative."""
    from emloco_tpu.prediction.data import SyntheticScenes

    ds = SyntheticScenes(num_people=2, seed=0)
    raw = ds.scene()["pose3d"]                            # (T, N, 24, 3)
    zs = raw[..., 2].reshape(-1)
    # raw frame: feet point UP (z-down convention)
    assert zs.max() > abs(zs.min()), (zs.min(), zs.max())
    canonical = zs * -1.0
    assert abs(canonical.min()) > canonical.max()
    # batch() raw tokens carry the same convention as scene()
    batch = ds.batch(4)
    pz = np.asarray(batch.init_pose)[..., 2].reshape(-1)
    assert pz.max() > abs(pz.min())


def test_eqmotion_wta_gated_value_loss():
    """--value-loss-mode=wta applies the value loss only to the WTA-winning
    head: the gated loss equals the winning head's per-mode value loss, and
    non-winning heads receive zero value gradient (the r2 degeneration
    mechanism; reference main_eth_diverse.py:304-316 averages all modes)."""
    import pytest

    from emloco_tpu.prediction.eqmotion import (
        EqMotionConfig, EqMotionTrainer, synthetic_eth_batch)

    cfg = EqMotionConfig(hidden_nf=16, hid_channel=8, n_layers=1, nmode=3)
    vnet = ValuePoseNet(use_pose=False, use_vel=True)
    key = jax.random.PRNGKey(0)
    vp = vnet.init(key, jnp.zeros((1, 13, 2)), None, jnp.zeros((1, 2)))
    past, future = synthetic_eth_batch(key, batch=2, agents=2)

    tr_all = EqMotionTrainer(cfg, lr=1e-3, vnet=vnet, valueloss_w=0.5,
                             value_loss_mode="all")
    tr_wta = EqMotionTrainer(cfg, lr=1e-3, vnet=vnet, valueloss_w=0.5,
                             value_loss_mode="wta")
    ts, vp = tr_all.init(key, past, vnet_params=vp)

    _, aux_all = tr_all.train_step(ts, vp, past, future)
    ts_w, aux_wta = tr_wta.train_step(ts, vp, past, future)
    for aux in (aux_all, aux_wta):
        assert np.isfinite(float(aux["value_loss"]))
    # same params, same data term — only the value-loss reduction differs
    np.testing.assert_allclose(float(aux_all["wta"]), float(aux_wta["wta"]),
                               rtol=1e-5)
    assert float(aux_wta["value_loss"]) != float(aux_all["value_loss"])

    with pytest.raises(ValueError):
        EqMotionTrainer(cfg, vnet=vnet, valueloss_w=0.5,
                        value_loss_mode="nope")


def test_limit_obs_sweep():
    """--all_frames sweep masks observed frames consistently across cue
    tensors (evaluate_jta.py:617-621; regression: padded-F cue shapes)."""
    import jax
    from emloco_tpu.prediction.data import SyntheticScenes
    from emloco_tpu.prediction.evaluate import observation_length_sweep
    from emloco_tpu.prediction.model import TransMotionConfig
    from emloco_tpu.prediction.train import PredictorTrainer

    mcfg = TransMotionConfig(nhid=32, dim_ff=64, nlayers_local=1,
                             nlayers_global=1, nmode=2)
    trainer = PredictorTrainer(mcfg)
    ds = SyntheticScenes(num_people=2, seed=0)
    ts = trainer.init(jax.random.PRNGKey(0), ds.batch(4))
    out = observation_length_sweep(trainer, ts.params, ds, 4, 1,
                                   lengths=(1, 5, 9))
    assert set(out) == {1, 5, 9}
    assert all(np.isfinite(v) for v in out.values())


def test_eqmotion_nbody_domain():
    """EqMotion on the 3-D n-body spring domain (EqMotion/n_body_system):
    trains, and the equivariant core commutes with 3-D rotations."""
    import jax
    import jax.numpy as jnp
    from emloco_tpu.prediction import eqmotion as E

    key = jax.random.PRNGKey(0)
    past, future = E.synthetic_nbody_batch(key, batch=8, bodies=4)
    assert past.shape == (8, 4, 10, 3) and future.shape == (8, 4, 10, 3)

    cfg = E.nbody_config(nmode=1)
    trainer = E.EqMotionTrainer(cfg, lr=1e-3)
    ts, _ = trainer.init(jax.random.PRNGKey(1), past)
    losses = []
    for i in range(20):
        k = jax.random.fold_in(key, i)
        p, f = E.synthetic_nbody_batch(k, batch=8, bodies=4)
        ts, aux = trainer.train_step(ts, None, p, f)
        losses.append(float(aux["wta"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    # E(3) equivariance: predict(R x) == R predict(x)
    th = 0.7
    R = jnp.asarray(np.array(
        [[np.cos(th), -np.sin(th), 0],
         [np.sin(th), np.cos(th), 0],
         [0, 0, 1.0]], np.float32))
    pred = trainer.predict(ts.params, past)
    pred_rot = trainer.predict(ts.params, past @ R.T)
    np.testing.assert_allclose(np.asarray(pred @ R.T),
                               np.asarray(pred_rot), atol=2e-3)


def test_ndjson_scenes_dataset(tmp_path):
    """Real-data path: trajnet++ ndjson → windowed, padded, masked batches
    (reference dataset_jta.py:86-152 + collate_batch :11-25)."""
    import json
    import jax
    from emloco_tpu.prediction.data import (NdjsonScenes, OBS_FRAMES, TOTAL)

    path = str(tmp_path / "scenes.ndjson")
    rows = []
    # two scenes of TOTAL frames; scene 0 has a near + a far neighbour
    for sid, x0 in ((0, 0.0), (1, 100.0)):
        rows.append({"scene": {"id": sid, "p": sid * 10, "s": sid * 100,
                               "e": sid * 100 + TOTAL - 1}})
        for f in range(TOTAL):
            fr = sid * 100 + f
            rows.append({"track": {"f": fr, "p": sid * 10,
                                   "x": x0 + 0.4 * f, "y": 0.0}})
            rows.append({"track": {"f": fr, "p": sid * 10 + 1,
                                   "x": x0 + 0.4 * f, "y": 2.0}})   # near
            rows.append({"track": {"f": fr, "p": sid * 10 + 2,
                                   "x": x0 + 0.4 * f, "y": 50.0}})  # far
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ds = NdjsonScenes(path, max_people=4)
    assert len(ds) == 2
    batch = ds.batch(3)
    obs, mask, gt, *_ = batch
    assert obs.shape[:2] == (3, OBS_FRAMES)
    assert gt.shape == (3, TOTAL - OBS_FRAMES, 2)
    m = np.asarray(mask)
    assert m[:, 0].all()
    assert m.sum(-1).max() == 2          # far neighbour dropped
    # primary agent normalized to origin at the last obs frame
    np.testing.assert_allclose(np.asarray(obs)[:, OBS_FRAMES - 1, 0, 0, :2],
                               0.0, atol=1e-5)
    # future is a straight +x walk at 0.4 m/frame
    np.testing.assert_allclose(np.asarray(gt)[:, 0, 0], 0.4, atol=1e-4)

    # trains through the standard trainer
    from emloco_tpu.prediction.model import TransMotionConfig
    from emloco_tpu.prediction.train import PredictorTrainer
    trainer = PredictorTrainer(TransMotionConfig(
        nhid=32, dim_ff=64, nlayers_local=1, nlayers_global=1, nmode=2))
    ts = trainer.init(jax.random.PRNGKey(0), ds.batch(3))
    ts, aux = trainer.train_step(ts, *batch)
    assert np.isfinite(float(aux["traj_loss"]))


def test_all_cues_ndjson_fixture_and_training(tmp_path):
    """All-visual-cues ndjson path (reference Reader_jta_all_visual_cues,
    reader.py:144-266): parse the committed JTA-format fixture, check the
    write→read round trip, reference-exact normalization, and that the
    standard trainer + LocoVal filter run on it."""
    import os
    from emloco_tpu.prediction.data import (
        NDJSON_POSE_JOINTS, NdjsonScenes, OBS_FRAMES,
        read_ndjson_scenes_all_cues, write_ndjson_all_cues)

    fixture = os.path.join(os.path.dirname(__file__), "data",
                           "jta_all_cues_fixture.ndjson")
    scenes = read_ndjson_scenes_all_cues(fixture)
    assert len(scenes) == 4
    sc = scenes[0]
    assert sc["traj"].shape[0] == 21
    assert sc["pose3d"].shape[-2:] == (NDJSON_POSE_JOINTS, 3)
    assert sc["box3d"].shape[-1] == 4 and sc["box2d"].shape[-1] == 4
    assert np.isfinite(sc["pose3d"]).all()

    # write → read round trip preserves every cue
    p2 = str(tmp_path / "rt.ndjson")
    write_ndjson_all_cues(p2, scenes)
    back = read_ndjson_scenes_all_cues(p2)
    for a, b in zip(scenes, back):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], atol=2e-3, err_msg=k)

    nd = NdjsonScenes(fixture, max_people=4)
    batch = nd.batch(3)
    obs = np.asarray(batch.obs)
    # reference normalization (dataset_jta.py:38-45): cue tokens are deltas
    # against their own last observed frame -> exactly zero at frame 8
    np.testing.assert_allclose(obs[:, OBS_FRAMES - 1, :, 1:], 0.0, atol=1e-6)
    assert np.abs(obs[:, 0, 0, 3:27, :3]).max() > 1e-3   # earlier: nonzero
    # primary traj normalized to the origin at the last obs frame
    np.testing.assert_allclose(obs[:, OBS_FRAMES - 1, 0, 0, :2], 0.0,
                               atol=1e-5)
    # the RAW init pose rides along (reference reads it pre-normalization)
    assert np.abs(np.asarray(batch.init_pose)).max() > 0.3

    trainer = PredictorTrainer(TINY)
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    ts, aux = trainer.train_step(ts, *batch)
    assert np.isfinite(float(aux["traj_loss"]))
    vnet = ValuePoseNet(use_pose=True, use_vel=True)
    vp = vnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 13, 2)),
                   jnp.zeros((1, 24, 3)), jnp.zeros((1, 2)))
    out = evaluate_with_filter(trainer, ts.params, nd, 3, 2,
                               vnet=vnet, vnet_params=vp)
    for k in ("ade_min", "fde_min", "ade_filtered_min", "ade_value_pick"):
        assert np.isfinite(out[k]), k


def test_eqmotion_h36m_domain():
    """EqMotion human-motion domain (EqMotion/h36m): joints as equivariant
    nodes; trains on FK'd gait windows."""
    import jax
    from emloco_tpu.prediction import eqmotion as E

    key = jax.random.PRNGKey(0)
    past, future = E.synthetic_h36m_batch(key, batch=4)
    assert past.shape == (4, 24, 10, 3) and future.shape == (4, 24, 10, 3)
    assert np.isfinite(np.asarray(past)).all()

    cfg = E.h36m_config(nmode=1)
    cfg = type(cfg)(**{**cfg.__dict__, "hidden_nf": 32, "hid_channel": 16,
                       "n_layers": 2})
    trainer = E.EqMotionTrainer(cfg, lr=1e-3)
    ts, _ = trainer.init(jax.random.PRNGKey(1), past)
    losses = []
    for i in range(12):
        p, f = E.synthetic_h36m_batch(jax.random.fold_in(key, i), batch=4)
        ts, aux = trainer.train_step(ts, None, p, f)
        losses.append(float(aux["wta"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_fit_scanned_epochs():
    """fit() scans each epoch's stacked batches in ONE compiled call (one
    dispatch + one sync per epoch instead of per batch — this is what makes
    predictor training viable over a remote-TPU link)."""
    ds = data_mod.SyntheticScenes(num_people=2, seed=0)
    eval_ds = data_mod.SyntheticScenes(num_people=2, seed=1)
    trainer = PredictorTrainer(TINY, PredictTrainConfig(lr=1e-3))
    ts = trainer.init(jax.random.PRNGKey(0), ds.batch(4))
    ts, history, best = trainer.fit(ts, ds, epochs=3, batches_per_epoch=4,
                                    batch_size=4, eval_dataset=eval_ds)
    assert len(history) == 3
    assert all(np.isfinite(h["traj_loss"]) for h in history)
    assert "ade_min" in history[0]
    assert int(ts.step) == 12


def test_traj_noise_augmentation():
    """traj_noise_std jitters only the observed trajectory tokens
    (reference --add_noise, train_jta.py:115-117): with noise on, the same
    batch + rng state yields a different loss than the clean run, training
    still converges, and predictions at eval time are untouched (predict()
    has no noise path)."""
    ds = data_mod.SyntheticScenes(num_people=2, seed=0)
    batch = ds.batch(4)
    clean = PredictorTrainer(TINY, PredictTrainConfig(lr=1e-3))
    noisy = PredictorTrainer(TINY, PredictTrainConfig(lr=1e-3,
                                                      traj_noise_std=0.1))
    ts_c = clean.init(jax.random.PRNGKey(0), batch)
    ts_n = noisy.init(jax.random.PRNGKey(0), batch)
    _, aux_c = clean.train_step(ts_c, *batch)
    ts_n2, aux_n = noisy.train_step(ts_n, *batch)
    assert float(aux_c["traj_loss"]) != float(aux_n["traj_loss"])
    losses = []
    for _ in range(12):
        ts_n2, aux = noisy.train_step(ts_n2, *batch)
        losses.append(float(aux["traj_loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_filter_threshold_sweep():
    """Threshold calibration (one forward pass, host sweep): at threshold 0
    every mode is kept so filtered-min == oracle min; raising the threshold
    can only shrink the kept set (monotone kept_frac) and the filtered-min
    ADE is always >= the oracle min; each row must match an
    evaluate_with_filter run at the same threshold."""
    from emloco_tpu.prediction.evaluate import (evaluate_with_filter,
                                                filter_threshold_sweep)

    trainer = PredictorTrainer(TINY, PredictTrainConfig(lr=1e-3))
    ts = trainer.init(jax.random.PRNGKey(0),
                      data_mod.SyntheticScenes(num_people=2, seed=7).batch(4))
    vnet = ValuePoseNet(use_pose=True, use_vel=True)
    vp = vnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 13, 2)),
                   jnp.zeros((1, 24, 3)), jnp.zeros((1, 2)))
    ths = (0.0, 0.5, 0.9)
    # identically-seeded datasets: the generator's rng advances per batch, so
    # the sweep and the reference eval must each get a fresh stream
    sweep = filter_threshold_sweep(
        trainer, ts.params, data_mod.SyntheticScenes(num_people=2, seed=0),
        4, 2, vnet=vnet, vnet_params=vp, thresholds=ths)
    kept = [sweep[t]["kept_frac"] for t in ths]
    assert kept[0] == 1.0
    assert kept[0] >= kept[1] >= kept[2] > 0.0
    ref = evaluate_with_filter(
        trainer, ts.params, data_mod.SyntheticScenes(num_people=2, seed=0),
        4, 2, vnet=vnet, vnet_params=vp, threshold=0.5)
    np.testing.assert_allclose(sweep[0.5]["ade_filtered_min"],
                               ref["ade_filtered_min"], rtol=1e-5)
    np.testing.assert_allclose(sweep[0.0]["ade_filtered_min"],
                               ref["ade_min"], rtol=1e-5)
    for t in ths:
        assert sweep[t]["ade_filtered_min"] >= ref["ade_min"] - 1e-6


def test_ethucy_reader_and_training():
    """ETH-UCY raw-txt ingestion (reference eth_dataset consumption,
    main_eth_diverse.py:160): windows keep only peds present in every frame
    of the 8+12 window, ego sits at agent 0, missing neighbour slots become
    far-away static dummies, and the EqMotion trainer learns on the result."""
    import os

    from emloco_tpu.prediction.eqmotion import (
        EqMotionConfig, EqMotionTrainer, ethucy_batches, ethucy_windows,
        read_ethucy_txt)

    path = os.path.join(os.path.dirname(__file__), "data",
                        "ethucy_fixture.txt")
    frames, table = read_ethucy_txt(path)
    assert len(frames) > 20 and np.all(np.diff(frames) == 10.0)
    past, future = ethucy_windows(path, num_agents=4)
    S = past.shape[0]
    assert past.shape == (S, 4, 8, 2) and future.shape == (S, 4, 12, 2)
    # ego track is continuous: past[-1] -> future[0] step bounded by max speed
    gap = np.linalg.norm(future[:, 0, 0] - past[:, 0, -1], axis=-1)
    assert (gap < 1.5).all()
    # every ego track exists verbatim in the raw table somewhere
    w0 = np.asarray([table[f][int(k)] for f in frames[:8]
                     for k in ()], np.float32)  # noqa: F841 (doc anchor)
    # dummies are far away and static
    d = np.linalg.norm(past[:, 1:] - past[:, 0:1], axis=-1).max(-1)  # (S,3)
    real_or_far = (d < 50.0) | (d > 500.0)
    assert real_or_far.all()
    far = d > 500.0
    if far.any():
        dummy_motion = np.linalg.norm(
            np.diff(past[:, 1:], axis=2), axis=-1).max(-1)
        assert dummy_motion[far].max() < 1e-5
    # training converges on the fixture
    cfg = EqMotionConfig(hidden_nf=16, hid_channel=8, n_layers=1, nmode=2)
    trainer = EqMotionTrainer(cfg, lr=2e-3)
    ts, _ = trainer.init(jax.random.PRNGKey(0), jnp.asarray(past[:8]))
    first = last = None
    for ep in range(6):
        for pb, fb in ethucy_batches(past, future, 8, jax.random.PRNGKey(ep)):
            ts, aux = trainer.train_step(ts, None, pb, fb)
            if first is None:
                first = float(aux["wta"])
            last = float(aux["wta"])
    assert np.isfinite(last) and last < first


def test_ethucy_windows_multi_file():
    """Comma-separated scene lists build windows PER FILE (the leave-one-out
    protocol trains on several scenes whose frame ids collide; reference
    main_eth_diverse.py concatenates per-scene datasets, never raw rows):
    the multi-file result is exactly the per-file results stacked."""
    import os

    from emloco_tpu.prediction.eqmotion import ethucy_windows

    path = os.path.join(os.path.dirname(__file__), "data",
                        "ethucy_fixture.txt")
    p1, f1 = ethucy_windows(path, num_agents=4)
    p2, f2 = ethucy_windows(f"{path},{path}", num_agents=4)
    assert p2.shape[0] == 2 * p1.shape[0]
    np.testing.assert_array_equal(p2, np.concatenate([p1, p1]))
    np.testing.assert_array_equal(f2, np.concatenate([f1, f1]))


def test_jrdb_2d_only_export_path(tmp_path):
    """2D-cue-only exports (reference Reader_jrdb_2dbox variant,
    trajnetplusplustools/reader.py:10-143 / jrdb_2dbox.yaml — the JRDB
    all-visual-cues run additionally carries 3D pose, see
    scripts/make_jrdb_export.py). A 2D-only ndjson must round-trip with its
    3D cue slots NaN-absent, batch with the 3D token slots exactly zero
    (modality masking treats zeros as absent), and train under the committed
    configs/jrdb_predictor.yaml."""
    import os
    from emloco_tpu.prediction.data import (
        NDJSON_POSE_JOINTS, NdjsonScenes, OBS_FRAMES, TOTAL,
        read_ndjson_scenes_all_cues, write_ndjson_all_cues)
    from emloco_tpu.utils.config import load_config

    rng = np.random.RandomState(0)
    scenes = []
    for _ in range(3):
        T, N = TOTAL, 3
        base = rng.randn(1, N, 2) * 1.0
        vel = rng.randn(1, N, 2) * 0.1
        traj = (base + vel * np.arange(T)[:, None, None]).astype(np.float32)
        scenes.append(dict(
            traj=traj,
            box2d=rng.rand(T, N, 4).astype(np.float32),
            pose2d=rng.rand(T, N, NDJSON_POSE_JOINTS, 2).astype(np.float32),
        ))

    p = str(tmp_path / "jrdb.ndjson")
    write_ndjson_all_cues(p, scenes)
    back = read_ndjson_scenes_all_cues(p)
    assert len(back) == 3
    # absent 3D streams stay NaN-absent through the round trip; 2D survive
    assert np.isnan(back[0]["pose3d"]).all()
    assert np.isnan(back[0]["box3d"]).all()
    np.testing.assert_allclose(back[0]["pose2d"], scenes[0]["pose2d"],
                               atol=2e-3)
    np.testing.assert_allclose(back[0]["traj"], scenes[0]["traj"], atol=2e-3)

    nd = NdjsonScenes(p, max_people=3)
    batch = nd.batch(4)
    obs = np.asarray(batch.obs)
    # token layout [traj, 3dbb, 2dbb, 3dpose*24, 2dpose*22]: the 3D slots
    # are exactly zero, the 2D slots carry signal (deltas vs frame 8)
    np.testing.assert_allclose(obs[:, :, :, 1, :], 0.0, atol=0)
    np.testing.assert_allclose(obs[:, :, :, 3:27, :], 0.0, atol=0)
    assert np.abs(obs[:, 0, :, 2, :]).max() > 1e-3
    assert np.abs(obs[:, 0, :, 27:49, :2]).max() > 1e-3
    np.testing.assert_allclose(obs[:, OBS_FRAMES - 1, :, 1:], 0.0, atol=1e-6)

    # the committed JRDB config drives the standard trainer on this data
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "jrdb_predictor.yaml"),
                      ["model.nhid=32", "model.dim_ff=64",
                       "model.nlayers_local=1", "model.nlayers_global=1",
                       "model.nmode=2", "predict.use_value_loss=false"])
    trainer = PredictorTrainer(cfg.model, cfg.predict)
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    ts, aux = trainer.train_step(ts, *batch)
    assert np.isfinite(float(aux["traj_loss"]))
    out = evaluate_with_filter(trainer, ts.params, nd, 4, 2)
    for k in ("ade_min", "fde_min"):
        assert np.isfinite(out[k]), k


def test_eqmotion_md17_domain():
    """EqMotion molecular domain (EqMotion/md17, dataset_md17.py:10-56):
    atoms as equivariant nodes over a fixed bond topology; the synthetic
    harmonic-bond dynamics stay finite/bounded and training reduces WTA."""
    import jax
    from emloco_tpu.prediction import eqmotion as E

    key = jax.random.PRNGKey(0)
    past, future = E.synthetic_md17_batch(key, batch=4, atoms=9,
                                          past=12, future=12)
    assert past.shape == (4, 9, 12, 3) and future.shape == (4, 9, 12, 3)
    assert np.isfinite(np.asarray(past)).all()
    # bonds hold: chain distances stay near rest length through the future
    d = np.linalg.norm(np.asarray(future)[:, 1:] - np.asarray(future)[:, :-1],
                       axis=-1)
    assert d.max() < 4.0 and d.min() > 0.2

    cfg = E.md17_config(past=12, future=12, nmode=1)
    cfg = type(cfg)(**{**cfg.__dict__, "hidden_nf": 32, "hid_channel": 16,
                       "n_layers": 2})
    trainer = E.EqMotionTrainer(cfg, lr=2e-3)
    ts, _ = trainer.init(jax.random.PRNGKey(1), past)
    losses = []
    for i in range(12):
        p, f = E.synthetic_md17_batch(jax.random.fold_in(key, i), batch=4,
                                      atoms=9, past=12, future=12)
        ts, aux = trainer.train_step(ts, None, p, f)
        losses.append(float(aux["wta"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_eqmotion_md17_real_structure():
    """MD17 with the REAL aspirin bond topology (reference
    md17/preprocess.py:59 heavy-atom adjacency; dataset_md17.py:23 loads it
    as edge_attr): the embed satisfies the bond graph, the harmonic
    dynamics hold bonded distances near rest length, and training learns."""
    import jax
    from emloco_tpu.prediction import eqmotion as E

    adj = E.load_md17_structure("aspirin")
    if adj is None:
        import pytest
        pytest.skip("reference MD17 structure not mounted")
    assert adj.shape == (13, 13) and (adj == adj.T).all()
    eq = E._embed_structure(adj)
    ii, jj = np.nonzero(np.triu(adj, 1))
    bond_d = np.linalg.norm(eq[ii] - eq[jj], axis=-1)
    assert abs(bond_d.mean() - 1.4) < 0.3                 # bonds near rest
    nb = (adj < 0.5) & ~np.eye(13, dtype=bool)
    d_all = np.linalg.norm(eq[:, None] - eq[None], axis=-1)
    assert d_all[nb].min() > 0.9                          # no atom overlap

    key = jax.random.PRNGKey(0)
    past, future = E.synthetic_md17_batch(key, batch=4, past=12, future=12,
                                          structure=adj)
    assert past.shape == (4, 13, 12, 3)
    fut = np.asarray(future)
    bd = np.linalg.norm(fut[:, ii][..., -1, :] - fut[:, jj][..., -1, :],
                        axis=-1)
    assert np.isfinite(fut).all() and bd.max() < 4.0 and bd.min() > 0.2

    cfg = E.md17_config(past=12, future=12, nmode=1)
    cfg = type(cfg)(**{**cfg.__dict__, "hidden_nf": 32, "hid_channel": 16,
                       "n_layers": 2})
    trainer = E.EqMotionTrainer(cfg, lr=2e-3)
    ts, _ = trainer.init(jax.random.PRNGKey(1), past)
    losses = []
    for i in range(12):
        p, f = E.synthetic_md17_batch(jax.random.fold_in(key, i), batch=4,
                                      past=12, future=12, structure=adj)
        ts, aux = trainer.train_step(ts, None, p, f)
        losses.append(float(aux["wta"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_eqmotion_vis_dict_adapter(tmp_path):
    """vis_dict adapter (reference ETH-UCY-Trajectory-Visualizer tool):
    EqMotion batches plot through the shared comparison/diff-histogram
    machinery, values included when a vnet is attached; evaluate() metrics
    are unchanged by the refactored mode_values helper."""
    from emloco_tpu.prediction import visualize as V
    from emloco_tpu.prediction.eqmotion import (
        EqMotionConfig, EqMotionTrainer, synthetic_eth_batch)

    cfg = EqMotionConfig(hidden_nf=16, hid_channel=8, n_layers=1, nmode=2)
    vnet = ValuePoseNet(use_pose=False, use_vel=True)
    key = jax.random.PRNGKey(0)
    vp = vnet.init(key, jnp.zeros((1, 13, 2)), None, jnp.zeros((1, 2)))
    trainer = EqMotionTrainer(cfg, lr=1e-3, vnet=vnet, valueloss_w=0.5)
    past, future = synthetic_eth_batch(key, batch=3, agents=2)
    ts, vp = trainer.init(key, past, vnet_params=vp)

    vis = trainer.vis_dict(ts.params, past, future, vnet_params=vp)
    assert vis["obs"].shape == (3, past.shape[2], 2)
    assert vis["gt"].shape == (3, future.shape[2], 2)
    assert vis["pred"].shape == (3, future.shape[2], 2, 2)   # (B,Tf,M,2)
    assert vis["values"].shape == (3, 2)
    assert np.isfinite(vis["pred"]).all()

    out = str(tmp_path / "eq_cmp.png")
    V.plot_prediction_comparison({"eqmotion": vis}, [0, 1], out,
                                 value_threshold=0.5)
    import os
    assert os.path.getsize(out) > 1000
    ade, fde = V.per_sample_min_metrics(vis)
    ev = trainer.evaluate(ts.params, past, future, vnet_params=vp,
                          threshold=0.0)
    np.testing.assert_allclose(ade.mean(), ev["ade_min"], rtol=1e-5)


def test_eqmotion_full_h36m_trains():
    """The faithful EqMotion port (prediction/eqmotion_full.py — measured
    logits parity in test_reference_parity) also TRAINS on the h36m-style
    joints-as-nodes domain: loss decreases and predictions are equivariant
    under global rotation (the architecture's design invariant)."""
    import jax
    import jax.numpy as jnp

    from emloco_tpu.prediction import eqmotion as E
    from emloco_tpu.prediction.eqmotion_full import (EqMotionFull,
                                                     EqMotionFullConfig,
                                                     EqMotionFullTrainer)

    key = jax.random.PRNGKey(0)
    past, future = E.synthetic_h36m_batch(key, batch=4, past=6, future=5)
    cfg = EqMotionFullConfig(past=6, future=5, nf=24, channels=12,
                             n_layers=2, n_agent=past.shape[1])
    tr = EqMotionFullTrainer(cfg, lr=1e-3)
    params, opt = tr.init(key, past)
    step = jax.jit(tr.train_step)
    losses = []
    for i in range(12):
        p, f = E.synthetic_h36m_batch(jax.random.fold_in(key, i), batch=4,
                                      past=6, future=5)
        params, opt, loss = step(params, opt, p, f)
        losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])

    # SO(3) equivariance: rotating the inputs rotates the prediction
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    R = jnp.asarray(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32))
    pred, _ = tr.predict(params, past)
    pred_r, _ = tr.predict(params, jnp.einsum("ij,bntj->bnti", R, past))
    np.testing.assert_allclose(np.asarray(pred_r),
                               np.asarray(jnp.einsum("ij,bntj->bnti", R,
                                                     pred)),
                               atol=2e-4)


def test_eqmotion_full_eth_interface():
    """The faithful port wired to the ETH-UCY 20-mode interface
    (eqmotion_full.EqMotionFullEth; reference main_eth_diverse.py:292
    `model(nodes, loc, vel, num_valid)` → (B,N,modes,Tf,2)): trains under
    the compact trainer's WTA loss, is exactly invariant to pad-dummy
    placement (the num_valid masking), and rotation-equivariant."""
    import jax
    import jax.numpy as jnp

    from emloco_tpu.prediction.eqmotion import (EqMotionConfig,
                                                EqMotionTrainer,
                                                synthetic_eth_batch)
    from emloco_tpu.prediction.eqmotion_full import (EqMotionFullEth,
                                                     eth_full_config)

    key = jax.random.PRNGKey(0)
    past, future = synthetic_eth_batch(key, batch=8)
    model = EqMotionFullEth(eth_full_config(nmode=5, channels=16))
    tr = EqMotionTrainer(EqMotionConfig(nmode=5), model=model, lr=1e-3)
    ts, _ = tr.init(key, past)
    assert tr.predict(ts.params, past).shape == (8, 4, 5, 12, 2)

    losses = []
    for i in range(10):
        p, f = synthetic_eth_batch(jax.random.fold_in(key, i), batch=8)
        ts, aux = tr.train_step(ts, None, p, f)
        losses.append(float(aux["wta"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])

    # num_valid masking: moving a static far-away pad dummy does not change
    # the ego prediction at all (the mask excludes it from every mean and
    # neighbor aggregation)
    p2 = np.asarray(past).copy()
    p2[:, -1] = p2[:, 0, -1:] + 1000.0
    pred_a = np.asarray(tr.predict(ts.params, jnp.asarray(p2)))
    p3 = p2.copy()
    p3[:, -1] = p3[:, 0, -1:] + 2000.0
    pred_b = np.asarray(tr.predict(ts.params, jnp.asarray(p3)))
    np.testing.assert_array_equal(pred_a[:, 0], pred_b[:, 0])

    # E(2) equivariance (relative tolerance: f32 roundoff scales with the
    # coordinate/channel magnitudes; the f64 architecture error is ~1e-11)
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    R = jnp.asarray(np.array([[c, -s], [s, c]], np.float32))
    pred = tr.predict(ts.params, past)
    pred_r = tr.predict(ts.params, past @ R.T)
    ref = np.asarray(pred @ R.T)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(pred_r), ref,
                               atol=3e-4 * max(scale, 1.0))
