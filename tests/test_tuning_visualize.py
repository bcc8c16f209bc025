"""Sweep harness + prediction visualization tests.

Reference counterparts: hyper_tuning_jta.py / hyper_tuning_monitor.py (sweep),
visualize_pred.py / draw_histogram.py / evaluate_jta.py:432-493 (plots).
"""
import os

import numpy as np

from emloco_tpu.prediction import tuning, visualize


def test_param_sampling_bounds():
    rng = np.random.RandomState(0)
    p = tuning.Param("lr", "loguniform", 1e-5, 1e-3)
    for _ in range(50):
        v = p.sample(rng)
        assert 1e-5 <= v <= 1e-3
    c = tuning.Param("n", "choice", choices=(4, 6, 8))
    assert all(c.sample(rng) in (4, 6, 8) for _ in range(10))


def test_run_sweep_logs_and_resumes(tmp_path):
    log_path = str(tmp_path / "trials.jsonl")
    calls = []

    def objective(params, i):
        calls.append(i)
        if i == 1:
            raise RuntimeError("diverged")          # must not kill the sweep
        return params["predict.lr"] * 1e4

    s = tuning.run_sweep(objective, num_trials=4, log_path=log_path, seed=1)
    assert s["num_trials"] == 3                      # errored trial excluded
    assert calls == [0, 1, 2, 3]
    log = tuning.SweepLog(log_path)
    assert len(log.trials()) == 4
    assert any("error" in t for t in log.trials())
    best = log.best()
    assert best["val_ade"] == s["best"]

    # resume: 4 already done, ask for 6 → only trials 4, 5 run
    calls.clear()
    tuning.run_sweep(objective, num_trials=6, log_path=log_path, seed=1)
    assert calls == [4, 5]
    assert len(log.trials()) == 6


def _fake_vis(num_scenes=3, modes=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "obs": rng.randn(num_scenes, 9, 2).cumsum(1),
        "gt": rng.randn(num_scenes, 12, 2).cumsum(1),
        "pred": rng.randn(num_scenes, 12, modes, 2).cumsum(1),
        "values": rng.rand(num_scenes, modes),
    }


def test_vis_dict_roundtrip(tmp_path):
    vis = _fake_vis()
    p = str(tmp_path / "vis.pkl")
    visualize.save_vis_dict(p, vis)
    v2 = visualize.load_vis_dict(p)
    np.testing.assert_allclose(v2["pred"], vis["pred"])


def test_comparison_plot_written(tmp_path):
    out = str(tmp_path / "cmp.png")
    visualize.plot_prediction_comparison(
        {"modelA": _fake_vis(seed=1), "modelB": _fake_vis(seed=2)},
        scene_indices=[0, 2], out_path=out, value_threshold=0.5)
    assert os.path.getsize(out) > 1000


def test_value_ade_bars_binning(tmp_path):
    rng = np.random.RandomState(0)
    values = rng.rand(500)
    ades = 2.0 - values + 0.1 * rng.randn(500)   # higher value → lower ADE
    out = visualize.plot_value_ade_bars(values, ades,
                                        str(tmp_path / "bars.png"))
    assert out["counts"].sum() == 500
    # monotone-ish: first bin mean ADE > last bin mean ADE
    assert out["mean_ade"][0] > out["mean_ade"][-1]


def test_histogram_and_des_plots(tmp_path):
    p1 = visualize.plot_value_histogram(
        {"pred": np.random.rand(100), "gt": np.random.rand(50)},
        str(tmp_path / "h.png"))
    p2 = visualize.plot_des_per_step(
        {"m": np.linspace(0.1, 1.2, 12)}, str(tmp_path / "des.png"))
    assert os.path.getsize(p1) > 500 and os.path.getsize(p2) > 500


def test_collect_vis_data_shapes():
    import jax
    from emloco_tpu.prediction.data import SyntheticScenes
    from emloco_tpu.prediction.model import TransMotionConfig
    from emloco_tpu.prediction.train import PredictorTrainer

    mcfg = TransMotionConfig(nhid=32, dim_ff=64, nlayers_local=1,
                             nlayers_global=1, nmode=3)
    trainer = PredictorTrainer(mcfg)
    ds = SyntheticScenes(num_people=2, seed=0)
    batch = ds.batch(4)
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    vis = visualize.collect_vis_data(trainer, ts.params, ds, batch_size=4,
                                     num_batches=1)
    assert vis["obs"].shape == (4, 9, 2)
    assert vis["gt"].shape == (4, 12, 2)
    assert vis["pred"].shape[0] == 4 and vis["pred"].shape[2] == 3


def test_policy_eval_artifacts(tmp_path):
    """eval-policy observability bundle (reference amp_value_players.py:
    129-275 scatter/histograms + base_task.py:799-844 reward-overlay video):
    artifacts written and finite."""
    import jax
    from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
    from emloco_tpu.kinematics import motion_lib as ml
    from emloco_tpu.learning.amp_agent import AMPAgent, AMPConfig
    from emloco_tpu.learning.networks import ValuePoseNet
    from emloco_tpu.learning.players import save_eval_artifacts
    from emloco_tpu.learning.value_train import LocoValTrainer, \
        ValueTrainConfig
    from emloco_tpu.physics import flat_terrain

    cfg = EnvConfig(num_envs=4, sensor_res=8, episode_length=12,
                    num_amp_obs_steps=3)
    env = PedestrianTerrainEnv(cfg, flat_terrain(extent=20.0, cell=0.1),
                               ml.synthetic_walk_motions(speeds=(1.0,),
                                                         duration=1.5))
    agent = AMPAgent(env, AMPConfig(horizon=4, num_minibatches=2,
                                    mini_epochs=1, amp_batch_size=8,
                                    amp_replay_size=32))
    ts = agent.init(jax.random.PRNGKey(0))
    vnet = ValuePoseNet(use_pose=True, use_vel=True)
    trainer = LocoValTrainer(agent, vnet,
                             ValueTrainConfig(horizon=14, step_to_pred=8))
    vts = trainer.init(ts, jax.random.PRNGKey(1))
    vts, arts = save_eval_artifacts(trainer, vts, str(tmp_path),
                                    name="test", num_epochs=2, gif_steps=6)
    import os
    assert os.path.exists(arts["gif"])
    assert "scatter" in arts and os.path.exists(arts["scatter"])
    assert os.path.exists(arts["hist"])
    assert np.isfinite(arts["mse"])


def test_metric_diff_histograms(tmp_path):
    """Per-sample improvement histograms (reference draw_histogram.py):
    ADE/FDE diffs are computed per sample against every baseline, and a
    model compared to itself improves exactly 0% of samples."""
    base = _fake_vis(num_scenes=24, seed=1)
    # a strictly better model: every head predicts exactly the gt
    ours = dict(base, pred=np.repeat(base["gt"][:, :, None, :], 4, axis=2))
    out = visualize.plot_metric_diff_histograms(
        {"baseline": base, "ours": ours}, "ours",
        str(tmp_path / "diff.png"))
    assert os.path.getsize(out) > 1000

    ade_b, fde_b = visualize.per_sample_min_metrics(base)
    ade_o, fde_o = visualize.per_sample_min_metrics(ours)
    assert ade_b.shape == (24,) and fde_b.shape == (24,)
    assert np.allclose(ade_o, 0) and np.allclose(fde_o, 0)
    assert (ade_b - ade_o > 0).all()

    import pytest
    with pytest.raises(ValueError):
        visualize.plot_metric_diff_histograms({"only": base}, "only",
                                              str(tmp_path / "x.png"))


def test_3d_pose_trajectory_plots(tmp_path):
    """3-D per-sample visualizer (reference Visualizer_3D.plot_3d,
    evaluate_jta.py:39-138): emits sample{i}_ade{...}.png with the initial
    SMPL skeleton + past/GT/multi-head trajectories; tolerates vis dicts
    without init_pose (older pkls) and different sample counts."""
    rng = np.random.default_rng(0)
    vis = _fake_vis(num_scenes=3, seed=2)
    vis["init_pose"] = rng.normal(size=(3, 24, 3)).astype(np.float32) * 0.3
    paths = visualize.save_3d_plots(vis, str(tmp_path / "vis3d"),
                                    num_samples=2)
    assert len(paths) == 2
    for p in paths:
        assert os.path.getsize(p) > 1000
        assert "_ade" in os.path.basename(p)
    # no init_pose → still renders (skeleton skipped)
    vis2 = {k: v for k, v in vis.items() if k != "init_pose"}
    out = visualize.plot_3d_sample(vis2, 0, str(tmp_path / "nopose.png"))
    assert os.path.getsize(out) > 1000
