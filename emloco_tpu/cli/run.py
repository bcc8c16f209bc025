"""CLI entry point — the reference's run.py / train_jta.py / evaluate_jta.py
surface collapsed into subcommands:

    python -m emloco_tpu.cli.run train-policy   [--config c.yaml] [k=v ...]
    python -m emloco_tpu.cli.run train-valuenet --policy ckpt [...]
    python -m emloco_tpu.cli.run eval-policy    --policy ckpt [...]
    python -m emloco_tpu.cli.run train-predictor [--valuenet ckpt] [...]
    python -m emloco_tpu.cli.run eval-predictor --predictor ckpt [...]
    python -m emloco_tpu.cli.run optimize-traj  --valuenet ckpt [...]

(reference entry points: pacer/pacer/run.py:251-395, social-transmotion/
train_jta.py:446-507, evaluate_jta.py:509-625, plausibl/test_value_mlp.py.)
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

import jax
import numpy as np

# Persistent compilation cache: big programs (the full predictor train step)
# can take tens of minutes to compile; cache compiled executables across
# process invocations so retries / later pipeline phases don't pay again.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/emloco_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:  # older jax without the knobs — harmless
    pass


def _build_world(cfg):
    import jax.numpy as jnp

    from ..envs import PedestrianTerrainEnv
    from ..envs import traj_gen
    from ..kinematics import motion_lib as ml
    from ..physics import (flat_terrain, generate_mixed_terrain,
                           mesh_terrain_from_file)

    tcfg = dict(cfg.terrain)
    ttype = tcfg.pop("type", "mixed")
    if ttype == "flat":
        terrain = flat_terrain(**tcfg)
    elif ttype == "mesh":
        # real-scan ground (reference MeshTerrain / HumanoidPedestrian task)
        terrain = mesh_terrain_from_file(tcfg.pop("mesh_path"), **tcfg)
    else:
        terrain = generate_mixed_terrain(**tcfg)
    if cfg.motions:
        lib = ml.load_reference_pkl(cfg.motions)
    else:
        lib = ml.synthetic_walk_motions()
    if cfg.real_traj_pkl:
        import joblib
        bank = jnp.asarray(np.stack(list(
            joblib.load(cfg.real_traj_pkl).values()))[..., :2])
    else:
        bank = traj_gen.synthetic_real_bank()
    key = jax.random.PRNGKey(cfg.seed)
    betas = jax.random.normal(key, (cfg.env.num_envs, 16)) * 0.3
    # vert-fit mesh colliders: explicit smpl_npz, or — when the engine runs
    # mesh contacts (getup/self-contact configs) — the committed SMPL
    # fixture, so those regimes get per-beta collision spheres fit to the
    # skinned verts (reference smpl_local_robot.py:83-146) instead of
    # capsule-axis defaults
    params = None
    npz = getattr(cfg, "smpl_npz", None)
    if npz is None and cfg.env.engine.mesh_contacts:
        cand = os.path.join(os.path.dirname(__file__), "..", "..",
                            "tests", "data", "smpl_fixture.npz")
        npz = cand if os.path.exists(cand) else None
    if npz:
        from ..kinematics import body_model as bm
        params = bm.from_smpl_npz(npz, betas)
    task = getattr(cfg, "task", "terrain")
    if task == "getup":
        from ..envs.getup import PedestrianTerrainGetupEnv
        env_cls = PedestrianTerrainGetupEnv
    elif task == "hand":
        from ..envs.hand_task import PedestrianTerrainHandEnv
        env_cls = PedestrianTerrainHandEnv
    else:
        env_cls = PedestrianTerrainEnv
    env = env_cls(cfg.env, terrain, lib, betas=betas, real_traj_bank=bank,
                  params=params)
    return env


def cmd_train_policy(cfg, args):
    import jax.numpy as jnp

    from ..learning.amp_agent import AMPAgent
    from ..utils.checkpoint import save_pytree
    from ..utils.logging import MetricsLogger

    env = _build_world(cfg)
    agent = AMPAgent(env, cfg.amp)
    ts = agent.init(jax.random.PRNGKey(cfg.seed))
    start_ep = 0
    if args.resume:
        from ..utils.checkpoint import load_pytree
        tree, meta = load_pytree(args.resume)
        ts = ts.replace(params=tree["params"], obs_norm=tree["obs_norm"],
                        amp_norm=tree["amp_norm"])
        # resume fidelity: older checkpoints carried params+norms only; newer
        # ones also carry value_norm, optimizer moments, and the absolute
        # epoch so curricula keyed on absolute epoch (getup) stay on schedule
        if "value_norm" in tree:
            ts = ts.replace(value_norm=tree["value_norm"])
        if "opt_state" in tree:
            ts = ts.replace(opt_state=tree["opt_state"])
        ep_meta = int(meta.get("epoch", -1))
        if ep_meta < 0:
            # old-format checkpoints carried no epoch metadata; fall back to
            # the filename so resumed runs keep absolute epoch numbering
            # (otherwise a resume restarts at 0 and overwrites earlier ckpts)
            m = re.search(r"_(\d+)\.ckpt$", args.resume)
            ep_meta = int(m.group(1)) if m else -1
        start_ep = ep_meta + 1
        ts = ts.replace(epoch=jnp.asarray(start_ep, jnp.int32))
    mesh_ctx = None
    if args.mesh > 1:
        # env-axis data parallelism over an N-chip mesh (the reference's
        # Horovod multi-GPU path, run.py:57-72 — here: shard + let XLA emit
        # the ICI collectives)
        from ..parallel.mesh import make_mesh, shard_env_axis
        mesh_ctx = make_mesh(args.mesh)
        ts = shard_env_axis(ts, mesh_ctx, cfg.env.num_envs)
    logger = MetricsLogger(cfg.out_dir, "policy")
    if args.profile:
        # one-epoch device trace (perfetto/tensorboard); reference only has
        # wall-clock segment timers (amp_continuous.py:224-306)
        from ..utils.profiling import trace
        ts, _ = agent.train_epoch(ts)              # compile outside the trace
        with trace(os.path.join(cfg.out_dir, "trace")) as d:
            ts, _ = agent.train_epoch(ts)
            jax.block_until_ready(ts.key)
        print(f"profile trace written to {d}")
    t0 = time.perf_counter()
    steps_per_epoch = cfg.amp.horizon * cfg.env.num_envs
    last_ep = start_ep + cfg.epochs - 1
    for ep in range(start_ep, start_ep + cfg.epochs):
        if hasattr(env, "update_getup_schedule"):
            # getup curriculum (reference update_getup_schedule hook called
            # per epoch from the agent, amp_continuous.py:203-220): fall-bank
            # reset probabilities + disc-only reward during the fall phase;
            # ep is the ABSOLUTE epoch so resumed runs stay on schedule
            ts = ts.replace(env_state=env.update_getup_schedule(
                ts.env_state, ep, cfg.env.getup_update_epoch))
            ts = agent.update_getup_reward_schedule(
                ts, ep, cfg.env.getup_update_epoch)
        if mesh_ctx is not None:
            with mesh_ctx:
                ts, metrics = agent.train_epoch(ts)
        else:
            ts, metrics = agent.train_epoch(ts)
        if ep % 10 == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["step_fps"] = steps_per_epoch * (ep - start_ep + 1) / (
                time.perf_counter() - t0)
            logger.log(ep, metrics)
        if ep and ep % cfg.save_every == 0 or ep == last_ep:
            save_pytree(os.path.join(cfg.out_dir, f"policy_{ep:08d}.ckpt"),
                        dict(params=ts.params, obs_norm=ts.obs_norm,
                             amp_norm=ts.amp_norm, value_norm=ts.value_norm,
                             opt_state=ts.opt_state),
                        metadata=dict(epoch=ep))
    logger.close()


def cmd_train_valuenet(cfg, args):
    import dataclasses as _dc

    from ..learning.amp_agent import AMPAgent
    from ..learning.networks import ValuePoseNet
    from ..learning.value_train import LocoValTrainer
    from ..utils.checkpoint import load_pytree, save_valuenet
    from ..utils.logging import MetricsLogger

    # hard negatives: valuenet training inverts a fraction of real-bank
    # trajectories (reference --heading_inversion, rewards then scaled
    # ×(−inversion_penalty) at latch time, amp_continuous_value.py:63-64)
    traj = cfg.env.traj.replace(
        heading_inversion_prob=cfg.value.heading_inversion_prob)
    cfg = _dc.replace(cfg, env=cfg.env.replace(traj=traj))
    env = _build_world(cfg)
    agent = AMPAgent(env, cfg.amp)
    ts = agent.init(jax.random.PRNGKey(cfg.seed))
    if args.policy:
        tree, _ = load_pytree(args.policy)
        ts = ts.replace(params=tree["params"], obs_norm=tree["obs_norm"],
                        amp_norm=tree["amp_norm"])
    vnet = ValuePoseNet(use_pose=not args.nopose, use_vel=not args.novel,
                        num_waypoints=5 if args.vru else 13)
    trainer = LocoValTrainer(agent, vnet, cfg.value)
    vts = trainer.init(ts, jax.random.PRNGKey(cfg.seed + 1))
    start_ep = 0
    if args.resume:
        vp, _ = load_pytree(args.resume)
        vts = vts.replace(vnet_params=vp)
        m = re.search(r"_(\d+)\.ckpt$", args.resume)
        if m:
            # keep absolute epoch numbering across resumes so the chain
            # scripts' remaining-epoch arithmetic and name-sorted "latest
            # checkpoint" selection stay correct
            start_ep = int(m.group(1)) + 1
    logger = MetricsLogger(cfg.out_dir, "valuenet")
    last_ep = start_ep + cfg.epochs - 1
    for ep in range(start_ep, start_ep + cfg.epochs):
        vts, metrics = trainer.train_epoch(vts)
        if ep % 10 == 0:
            logger.log(ep, {k: float(v) for k, v in metrics.items()})
        if ep and ep % cfg.save_every == 0 or ep == last_ep:
            save_valuenet(
                os.path.join(cfg.out_dir, f"valuenet_{ep:08d}.ckpt"),
                vts.vnet_params,
                dict(use_pose=not args.nopose, use_vel=not args.novel))
    logger.close()


def cmd_eval_policy(cfg, args):
    """Policy/value evaluation; with --grid runs the reference's 4-condition
    ablation (eval_policy.sh / _nopose / _trajonly / _novel: real vs random
    trajectories × with/without initial-heading alignment)."""
    import dataclasses as _dc

    from ..learning.amp_agent import AMPAgent
    from ..learning.networks import ValuePoseNet
    from ..learning.value_train import LocoValTrainer
    from ..utils.checkpoint import load_pytree

    conditions = [("default", {})]
    if args.grid:
        conditions = [
            ("real+heading", dict(hybrid_init_prob=0.0, init_heading=True)),
            ("real-noheading", dict(hybrid_init_prob=0.0,
                                    init_heading=False)),
            ("random+heading", dict(hybrid_init_prob=1.0, init_heading=True)),
            ("random-noheading", dict(hybrid_init_prob=1.0,
                                      init_heading=False)),
        ]

    for name, overrides in conditions:
        c = cfg
        if overrides:
            traj = cfg.env.traj.replace(**overrides)
            c = _dc.replace(cfg, env=cfg.env.replace(traj=traj))
        env = _build_world(c)
        agent = AMPAgent(env, c.amp)
        ts = agent.init(jax.random.PRNGKey(c.seed))
        if args.policy:
            tree, _ = load_pytree(args.policy)
            ts = ts.replace(params=tree["params"], obs_norm=tree["obs_norm"],
                            amp_norm=tree["amp_norm"])
        vnet = ValuePoseNet(use_pose=not args.nopose, use_vel=not args.novel)
        trainer = LocoValTrainer(agent, vnet, c.value)
        vts = trainer.init(ts, jax.random.PRNGKey(c.seed + 1))
        if args.valuenet:
            vp, _ = load_pytree(args.valuenet)
            vts = vts.replace(vnet_params=vp)
        vts, preds, targets = trainer.collect_predictions(
            vts, num_epochs=args.games)
        mse, corr = trainer.prediction_stats(preds, targets)
        note = "" if len(preds) else \
            "  (no episodes latched — longer --games or shorter episodes)"
        print(f"[{name}] value prediction: mse={mse:.4f} corr={corr:.3f}"
              f"{note}")
        if args.plots:
            # qualitative observability parity: value-vs-return scatter +
            # histograms + a rollout GIF with per-step reward overlays
            # (reference amp_value_players.py:129-275, base_task.py:799-844)
            # — plotted from the SAME rollouts as the printed mse/corr
            from ..learning.players import save_eval_artifacts
            vts, arts = save_eval_artifacts(trainer, vts, cfg.out_dir,
                                            name=name,
                                            preds=preds, targets=targets)
            for k, v in arts.items():
                print(f"[{name}] {k}: {v}")


def _pred_dataset(cfg, seed_offset=0):
    """Predictor dataset: real ndjson scenes when configured, else synthetic
    (reference load_data_jta_all_visual_cues vs our SyntheticScenes)."""
    from ..prediction.data import NdjsonScenes, SyntheticScenes

    path = cfg.ndjson_val if (seed_offset and cfg.ndjson_val) else cfg.ndjson
    if path:
        return NdjsonScenes(path, seed=cfg.seed + seed_offset)
    return SyntheticScenes(num_people=4, seed=cfg.seed + seed_offset)


def cmd_train_predictor(cfg, args):
    from ..learning.networks import ValuePoseNet
    from ..prediction.data import SyntheticScenes
    from ..prediction.train import PredictorTrainer
    from ..utils.checkpoint import load_pytree
    from ..utils.logging import MetricsLogger

    vnet = None
    vp = None
    if args.valuenet:
        vnet = ValuePoseNet(use_pose=True, use_vel=True)
        vp, _ = load_pytree(args.valuenet)
    import time
    t0 = time.time()
    trainer = PredictorTrainer(cfg.model, cfg.predict, vnet=vnet)
    ds = _pred_dataset(cfg)
    eval_ds = _pred_dataset(cfg, seed_offset=1)
    nw = lambda d: len(d) if hasattr(d, "__len__") else -1  # noqa: E731
    print(f"[train-predictor] datasets ready ({nw(ds)}/{nw(eval_ds)} "
          f"windows, {time.time() - t0:.0f}s)", flush=True)
    batch = ds.batch(args.batch_size)
    ts = trainer.init(jax.random.PRNGKey(cfg.seed), batch, vnet_params=vp)
    print(f"[train-predictor] params initialized "
          f"({time.time() - t0:.0f}s)", flush=True)
    if args.resume:
        # reference train_jta.py --resume (:430-440)
        blob = trainer.load_checkpoint(args.resume)
        ts = ts.replace(params=blob["params"])
    logger = MetricsLogger(cfg.out_dir, "predictor")
    mesh = None
    if args.mesh > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh, axis="batch")
    ts, history, best = trainer.fit(
        ts, ds, epochs=cfg.epochs, batches_per_epoch=args.batches,
        batch_size=args.batch_size, eval_dataset=eval_ds, mesh=mesh)
    for h in history:
        logger.log(h.pop("epoch"), h)
    trainer.save_checkpoint(
        os.path.join(cfg.out_dir, "predictor_best.ckpt"),
        ts.replace(params=best))
    logger.close()


def cmd_train_eqmotion(cfg, args):
    """EqMotion ETH-UCY baseline with the LocoVal loss and test-time filter
    (reference main_eth_diverse.py:145-230): train on raw ETH-UCY txt
    annotations (`ethucy=path`, `ethucy_val=path`) or synthetic scenes,
    report WTA + per-mode value loss per epoch, then ADE/FDE + filter
    metrics on the held-out data."""
    import jax.numpy as jnp

    from ..learning.networks import ValuePoseNet
    from ..prediction.eqmotion import (EqMotionTrainer, ethucy_batches,
                                       ethucy_windows, synthetic_eth_batch)
    from ..utils.checkpoint import load_pytree, save_pytree
    from ..utils.logging import MetricsLogger

    vnet, vp = None, None
    if args.valuenet:
        vnet = ValuePoseNet(use_pose=False, use_vel=True)  # :172-177
        vp, _ = load_pytree(args.valuenet)
    model = None
    if args.arch == "full":
        from ..prediction.eqmotion_full import (EqMotionFullEth,
                                                eth_full_config)
        model = EqMotionFullEth(eth_full_config(
            past=cfg.eqmotion.past_length, future=cfg.eqmotion.future_length,
            nmode=cfg.eqmotion.nmode, channels=args.channels))
    key = jax.random.PRNGKey(cfg.seed)
    if cfg.ethucy:
        tr_past, tr_future = ethucy_windows(cfg.ethucy)
        ev_past, ev_future = ethucy_windows(cfg.ethucy_val or cfg.ethucy)
        print(f"[train-eqmotion] {tr_past.shape[0]} train / "
              f"{ev_past.shape[0]} eval windows", flush=True)
        example = jnp.asarray(tr_past[:args.batch_size])
    else:
        tr_past = tr_future = None
        example, _ = synthetic_eth_batch(key, batch=args.batch_size)
    lr = 5e-4                                  # main_eth_diverse.py --lr
    if args.apply_decay:
        # the reference's staircase anneal: ×lr_gamma(0.8) every
        # epoch_decay(2) epochs (main_eth_diverse.py:40-42,215-217)
        import optax
        steps_per_epoch = (max(1, tr_past.shape[0] // args.batch_size)
                           if tr_past is not None else args.batches)
        lr = optax.exponential_decay(5e-4, 2 * steps_per_epoch, 0.8,
                                     staircase=True)
    trainer = EqMotionTrainer(cfg.eqmotion, lr=lr, vnet=vnet,
                              valueloss_w=args.valueloss_w if vnet else 0.0,
                              value_loss_mode=args.value_loss_mode,
                              model=model)
    ts, vp = trainer.init(key, example, vnet_params=vp)
    logger = MetricsLogger(cfg.out_dir, "eqmotion")
    for ep in range(cfg.epochs):
        key, k_ep = jax.random.split(key)
        aux = {}
        if tr_past is not None:
            for past, future in ethucy_batches(tr_past, tr_future,
                                               args.batch_size, k_ep):
                ts, aux = trainer.train_step(ts, vp, past, future)
        else:
            for b in range(args.batches):
                past, future = synthetic_eth_batch(
                    jax.random.fold_in(k_ep, b), batch=args.batch_size)
                ts, aux = trainer.train_step(ts, vp, past, future)
        m = {k: float(v) for k, v in aux.items()}
        logger.log(ep, m)
        if ep % 10 == 0 or ep == cfg.epochs - 1:
            print(f"epoch {ep}: " + "  ".join(f"{k}={v:.4f}"
                                              for k, v in m.items()),
                  flush=True)
    if cfg.ethucy:
        ev = trainer.evaluate(ts.params, jnp.asarray(ev_past),
                              jnp.asarray(ev_future), vnet_params=vp,
                              threshold=args.threshold)
    else:
        # fold_in requires a non-negative int (uint32 path data)
        past, future = synthetic_eth_batch(
            jax.random.fold_in(key, 0x7FFFFFFF), batch=256)
        ev = trainer.evaluate(ts.params, past, future, vnet_params=vp,
                              threshold=args.threshold)
    for k, v in sorted(ev.items()):
        print(f"{k}: {v:.4f}")
    save_pytree(os.path.join(cfg.out_dir, "eqmotion.ckpt"),
                {"params": ts.params},
                metadata={"cfg": str(cfg.eqmotion)})
    logger.close()


def cmd_eval_predictor(cfg, args):
    from ..learning.networks import ValuePoseNet
    from ..prediction.data import SyntheticScenes
    from ..prediction.evaluate import evaluate_with_filter
    from ..prediction.train import PredictorTrainer
    from ..utils.checkpoint import load_pytree

    trainer = PredictorTrainer(cfg.model, cfg.predict)
    ds = _pred_dataset(cfg, seed_offset=2)
    blob = trainer.load_checkpoint(args.predictor)
    vnet, vp = None, None
    if args.valuenet:
        vnet = ValuePoseNet(use_pose=True, use_vel=True)
        vp, _ = load_pytree(args.valuenet)
    zf = cfg.predict.pose_z_flip
    out = evaluate_with_filter(trainer, blob["params"], ds, args.batch_size,
                               args.batches, vnet=vnet, vnet_params=vp,
                               threshold=args.threshold, pose_z_flip=zf)
    for k, v in sorted(out.items()):
        print(f"{k}: {v:.4f}")
    if args.sweep_thresholds and vnet is not None:
        from ..prediction.evaluate import filter_threshold_sweep
        sweep = filter_threshold_sweep(trainer, blob["params"], ds,
                                       args.batch_size, args.batches,
                                       vnet=vnet, vnet_params=vp,
                                       pose_z_flip=zf)
        for t, row in sweep.items():
            print(f"threshold={t:.2f}: " + "  ".join(
                f"{k}={v:.4f}" for k, v in row.items()))
    if args.all_frames:
        # observation-length sweep (reference evaluate_jta.py --all_frames)
        from ..prediction.evaluate import observation_length_sweep
        sweep = observation_length_sweep(trainer, blob["params"], ds,
                                         args.batch_size, args.batches)
        for L, ade in sweep.items():
            print(f"obs_frames={L}: ade_min={ade:.4f}")
    if args.plots and vnet is not None:
        from ..prediction import visualize as V
        vis = V.collect_vis_data(trainer, blob["params"], ds,
                                 args.batch_size, args.batches,
                                 vnet=vnet, vnet_params=vp, pose_z_flip=zf)
        V.save_vis_dict(os.path.join(cfg.out_dir, "vis_dict.pkl"), vis)
        n = min(3, vis["pred"].shape[0])
        print(V.plot_prediction_comparison(
            {"model": vis}, list(range(n)),
            os.path.join(cfg.out_dir, "pred_comparison.png"),
            value_threshold=0.7))
        import numpy as _np
        ades = _np.linalg.norm(
            vis["pred"] - vis["gt"][:, :, None], axis=-1).mean(1)  # (S,M)
        V.plot_value_ade_bars(vis["values"], ades,
                              os.path.join(cfg.out_dir, "value_ade.png"))
        print(V.plot_value_histogram(
            {"pred": vis["values"]},
            os.path.join(cfg.out_dir, "value_hist.png")))
        # per-sample 3-D pose+trajectory plots (reference Visualizer_3D,
        # evaluate_jta.py:39-138)
        for p in V.save_3d_plots(vis, os.path.join(cfg.out_dir, "vis3d"),
                                 num_samples=min(4, n)):
            print(p)


def cmd_tune_predictor(cfg, args):
    """Random-search hyper-sweep for the predictor (reference
    hyper_tuning_jta.py / hyper_tuning_monitor.py)."""
    from ..learning.networks import ValuePoseNet
    from ..prediction.data import SyntheticScenes
    from ..prediction.tuning import predictor_objective, run_sweep
    from ..utils.checkpoint import load_pytree

    vnet, vp = None, None
    if args.valuenet:
        vnet = ValuePoseNet(use_pose=True, use_vel=True)
        vp, _ = load_pytree(args.valuenet)
    ds = _pred_dataset(cfg)
    eval_ds = _pred_dataset(cfg, seed_offset=1)
    objective = predictor_objective(
        {"model": cfg.model, "predict": cfg.predict}, ds, eval_ds,
        epochs=max(1, cfg.epochs), batch_size=args.batch_size,
        batches_per_epoch=args.batches, vnet=vnet, vnet_params=vp,
        seed=cfg.seed)
    summary = run_sweep(objective, num_trials=args.trials,
                        log_path=os.path.join(cfg.out_dir, "trials.jsonl"),
                        seed=cfg.seed)
    for k, v in summary.items():
        print(f"{k}: {v}")


def cmd_visualize_pred(cfg, args):
    """Multi-model comparison plots from saved vis_dict pkls (reference
    visualize_pred.py)."""
    from ..prediction import visualize as V

    def _key(p):
        # eval-predictor always writes vis_dict.pkl, so the basename alone
        # collides when comparing two runs' canonical artifacts — include
        # the parent dir on collision instead of silently dropping a model
        return os.path.splitext(os.path.basename(p))[0]

    vis = {}
    for p in args.vis_dicts:
        k = _key(p)
        if k in vis:
            k = f"{os.path.basename(os.path.dirname(p)) or '.'}/{k}"
        if k in vis:
            raise ValueError(f"duplicate vis_dict key {k!r}: pass files "
                             "from distinct directories or rename them")
        vis[k] = V.load_vis_dict(p)
    n = min(v["pred"].shape[0] for v in vis.values())
    out = os.path.join(cfg.out_dir, "pred_comparison.png")
    V.plot_prediction_comparison(vis, list(range(min(args.games, n))), out,
                                 value_threshold=0.7)
    print(out)
    for name, v in vis.items():
        if "values" in v:
            hout = os.path.join(cfg.out_dir, f"values_{name}.png")
            V.plot_value_histogram({name: v["values"]}, hout)
            print(hout)
    if len(vis) > 1:
        # per-sample improvement histograms vs every baseline (reference
        # draw_histogram.py; the LAST vis_dict argument is "ours")
        ours = list(vis)[-1]
        print(f"treating {ours!r} (last argument) as 'ours' for the "
              "improvement histograms")
        dout = os.path.join(cfg.out_dir, "metric_diff_hist.png")
        V.plot_metric_diff_histograms(vis, ours, dout)
        print(dout)


def cmd_optimize_traj(cfg, args):
    from ..analysis import optimize_trajectory, sample_candidate_trajs
    from ..learning.networks import ValuePoseNet
    from ..utils.checkpoint import load_pytree

    vp, meta = load_pytree(args.valuenet)
    vcfg = (meta or {}).get("config") or {}
    use_pose = bool(vcfg.get("use_pose", False))
    use_vel = bool(vcfg.get("use_vel", False))
    vnet = ValuePoseNet(use_pose=use_pose, use_vel=use_vel)
    key = jax.random.PRNGKey(cfg.seed)
    trajs = sample_candidate_trajs(key, args.batch_size)
    init_pose = np.zeros((args.batch_size, 24, 3), np.float32) \
        if use_pose else None
    init_vel = np.asarray(trajs[:, 1] - trajs[:, 0]) / 0.4 \
        if use_vel else None
    if args.gif:
        from ..analysis import animate_optimization
        out, hist, snaps = optimize_trajectory(
            vnet, vp, trajs, init_pose=init_pose, init_vel=init_vel,
            steps=args.steps, record_trajs=True)
        gif = animate_optimization(
            snaps, hist, os.path.join(cfg.out_dir, "traj_opt.gif"))
        print(gif)
    else:
        out, hist = optimize_trajectory(vnet, vp, trajs, init_pose=init_pose,
                                        init_vel=init_vel, steps=args.steps)
    print(f"value before: {float(np.asarray(hist[0]).mean()):.4f} "
          f"after: {float(np.asarray(hist[-1]).mean()):.4f}")


def cmd_serve_viewer(cfg, args):
    """Live interactive viewer over HTTP (reference Isaac Gym viewer loop +
    server mode, base_task.py:135-211, 351-430 — pause/reset/push/follow/
    env-switch as POST /control commands, frames at GET /frame.png)."""
    from ..envs.viewer_server import ViewerServer, ViewerSession
    from ..learning.amp_agent import AMPAgent
    from ..utils.checkpoint import load_pytree

    env = _build_world(cfg)
    agent = AMPAgent(env, cfg.amp)
    ts = agent.init(jax.random.PRNGKey(cfg.seed))
    if args.policy:
        tree, _ = load_pytree(args.policy)
        ts = ts.replace(params=tree["params"], obs_norm=tree["obs_norm"],
                        amp_norm=tree["amp_norm"])
    session = ViewerSession(agent, ts)
    server = ViewerServer(session, port=args.port, fps=args.fps).start()
    print(f"viewer at http://127.0.0.1:{server.port}/ (ctrl-c to stop)",
          flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


def main(argv=None):
    from ..utils.config import load_config

    p = argparse.ArgumentParser(prog="emloco_tpu")
    p.add_argument("command", choices=[
        "train-policy", "train-valuenet", "eval-policy", "train-predictor",
        "eval-predictor", "optimize-traj", "tune-predictor",
        "visualize-pred", "train-eqmotion", "serve-viewer"])
    p.add_argument("--config", default=None)
    p.add_argument("--policy", default=None)
    p.add_argument("--valuenet", default=None)
    p.add_argument("--predictor", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--nopose", action="store_true")
    p.add_argument("--novel", action="store_true")
    p.add_argument("--vru", action="store_true")
    p.add_argument("--games", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--grid", action="store_true")
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--vis-dicts", nargs="*", default=[])
    p.add_argument("--gif", action="store_true")
    p.add_argument("--mesh", type=int, default=1,
                   help="shard the env axis over N devices (data parallel)")
    p.add_argument("--profile", action="store_true",
                   help="train-policy: dump a one-epoch device trace")
    p.add_argument("--all-frames", action="store_true",
                   help="eval-predictor: sweep observed-frame counts 1..9")
    p.add_argument("--valueloss-w", type=float, default=0.1,
                   help="train-eqmotion: EmLoco value-loss weight "
                        "(reference main_eth_diverse.py per-mode loss; too "
                        "high and non-winning heads chase pure value)")
    p.add_argument("--value-loss-mode", choices=["all", "wta"],
                   default="all",
                   help="train-eqmotion: apply the value loss to all modes "
                        "(reference) or only the WTA-winning head")
    p.add_argument("--arch", choices=["compact", "full"], default="compact",
                   help="train-eqmotion: compact re-derivation or the "
                        "architecture-exact port (eqmotion_full) on the "
                        "eth 20-mode interface (main_eth_diverse.py:292)")
    p.add_argument("--channels", type=int, default=64,
                   help="train-eqmotion --arch full: equivariant channel "
                        "count (main_eth_diverse.py:119-122: 128 for "
                        "zara1, else 64)")
    p.add_argument("--apply-decay", action="store_true",
                   help="train-eqmotion: the reference's staircase lr "
                        "anneal, x0.8 every 2 epochs "
                        "(main_eth_diverse.py --apply_decay)")
    p.add_argument("--threshold", type=float, default=0.7,
                   help="eval-predictor: LocoVal filter threshold "
                        "(reference evaluate_jta.py:526)")
    p.add_argument("--sweep-thresholds", action="store_true",
                   help="eval-predictor: calibrate the filter threshold "
                        "(one forward pass, host-side sweep)")
    p.add_argument("--plots", action="store_true",
                   help="eval-predictor: save comparison/value plots; "
                        "eval-policy: value scatter/histograms + rollout "
                        "GIF with reward overlays")
    p.add_argument("--port", type=int, default=8703,
                   help="serve-viewer: HTTP port (0 = ephemeral)")
    p.add_argument("--fps", type=float, default=10.0,
                   help="serve-viewer: sim-chunk pacing")
    p.add_argument("overrides", nargs="*",
                   help="dotted config overrides, e.g. env.num_envs=1024")
    # argparse stops collecting positionals once an optional appears between
    # them; accept key=value overrides anywhere on the line
    args, unknown = p.parse_known_args(argv)
    bad = [u for u in unknown if "=" not in u or u.startswith("-")]
    if bad:
        p.error(f"unrecognized arguments: {' '.join(bad)}")
    args.overrides = list(args.overrides) + unknown

    cfg = load_config(args.config, args.overrides)
    os.makedirs(cfg.out_dir, exist_ok=True)
    {
        "train-policy": cmd_train_policy,
        "train-valuenet": cmd_train_valuenet,
        "eval-policy": cmd_eval_policy,
        "train-predictor": cmd_train_predictor,
        "eval-predictor": cmd_eval_predictor,
        "optimize-traj": cmd_optimize_traj,
        "tune-predictor": cmd_tune_predictor,
        "visualize-pred": cmd_visualize_pred,
        "train-eqmotion": cmd_train_eqmotion,
        "serve-viewer": cmd_serve_viewer,
    }[args.command](cfg, args)


if __name__ == "__main__":
    main()
