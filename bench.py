"""Throughput benchmark: humanoid env steps/sec at 4096 envs on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline context (BASELINE.md): the north star is ≥1M env-steps/s on a v5p-8
(8 chips) ⇒ 125k steps/s/chip; vs_baseline = steps_per_sec / 125_000.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache — shields the bench from slow remote compiles
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/emloco_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def _wait_for_backend(attempts: int = 4, delay_s: float = 120.0):
    """The axon TPU tunnel drops transiently (CLAUDE.md: 'transient TPU
    backend error can kill long chip jobs'); retry backend init a few times
    before letting the bench die so a blip doesn't blank the round's
    numbers."""
    for i in range(attempts):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if i == attempts - 1:
                raise
            print(json.dumps({"warn": f"backend init failed "
                              f"(attempt {i + 1}/{attempts}): {e}"}))
            time.sleep(delay_s)


def _timed(fn, *args):
    """Compile + warm, then time one call (trust large scanned programs over
    microbenchmarks through the tunnel — CLAUDE.md)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def breakdown():
    """Device-time attribution (physics / sensor / full step / PPO update)
    via ablation timings at bench scale, an XLA-cost-analysis MFU estimate
    for the compiled training epoch, and sensor-variant step rates.
    Prints one JSON line per row; rows land in RESULTS.md."""
    _wait_for_backend()
    num_envs = int(os.environ.get("BENCH_ENVS", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 32))

    import jax.numpy as jnp

    from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
    from emloco_tpu.kinematics import motion_lib as ml
    from emloco_tpu.learning.amp_agent import AMPAgent, AMPConfig
    from emloco_tpu.physics import generate_mixed_terrain
    from emloco_tpu.physics.reduced import step as physics_step

    terrain = generate_mixed_terrain(map_length=8.0, num_tiles=2,
                                     difficulty=0.5)
    lib = ml.synthetic_walk_motions(speeds=(1.0, 1.5), duration=2.0)
    rows = []

    def env_step_rate(tag, cfg):
        env = PedestrianTerrainEnv(cfg, terrain, lib)
        state = env.reset(jax.random.PRNGKey(0))
        actions = jax.random.uniform(
            jax.random.PRNGKey(1), (cfg.num_envs, cfg.num_actions),
            minval=-0.3, maxval=0.3)

        @jax.jit
        def roll(s):
            def body(c, _):
                c, out = env.step(c, actions)
                return c, out.reward.sum()
            return jax.lax.scan(body, s, None, length=steps)

        dt = _timed(roll, state)
        rows.append(dict(metric=tag, value=round(cfg.num_envs * steps / dt, 1),
                         unit="env_steps/s"))
        return env, state

    base_cfg = EnvConfig(num_envs=num_envs, sensor_res=32,
                         episode_length=168, num_amp_obs_steps=15)
    env, state = env_step_rate("full env step", base_cfg)

    # physics only (fixed PD targets, no obs/reward/reset)
    import emloco_tpu.kinematics.body_model as bm
    tgt = jnp.zeros((num_envs, bm.NUM_JOINTS, 3))

    @jax.jit
    def phys_roll(ph):
        def body(p, _):
            return physics_step(env.model, env.terrain, p, tgt,
                                base_cfg.engine, env.tree), ()
        return jax.lax.scan(body, ph, None, length=steps)[0]

    dt_phys = _timed(phys_roll, state.physics)
    rows.append(dict(metric="physics only", value=round(
        num_envs * steps / dt_phys, 1), unit="env_steps/s"))

    # obs/reward/reset share by subtraction (full − physics-only). A
    # standalone obs-only scan measures an unrepresentative program (nothing
    # to overlap the gather latency with), and its rate came out BELOW the
    # full step's — parts must not exceed the whole in a breakdown.
    dt_full = num_envs * steps / rows[0]["value"]
    dt_rest = max(dt_full - dt_phys, 1e-9)
    rows.append(dict(
        metric="obs/reward/reset share (full minus physics)",
        value=round(100.0 * dt_rest / dt_full, 1), unit="% of step"))

    # sensor variants (velocity map, self-contact) at the same scale
    env_step_rate("velocity-map sensor variant",
                  base_cfg.replace(velocity_map=True))
    env_step_rate("self-contact enabled",
                  base_cfg.replace(engine=base_cfg.engine.replace(
                      self_contact=True)))
    env_step_rate("mesh-collider variant",
                  base_cfg.replace(engine=base_cfg.engine.replace(
                      mesh_contacts=True)))

    # PPO training epoch at reference scale: wall time + XLA flop count
    tr_envs = int(os.environ.get("BENCH_TRAIN_ENVS", 1600))
    tcfg = EnvConfig(num_envs=tr_envs, sensor_res=32, episode_length=168,
                     num_amp_obs_steps=15)
    tenv = PedestrianTerrainEnv(tcfg, terrain, lib)
    agent = AMPAgent(tenv, AMPConfig(horizon=32, num_minibatches=20,
                                     mini_epochs=6, amp_batch_size=512))
    ts = agent.init(jax.random.PRNGKey(0))
    dt_ep = _timed(lambda t: agent.train_epoch(t)[0], ts)
    steps_per_epoch = 32 * tr_envs
    rows.append(dict(metric=f"train epoch at {tr_envs} envs", value=round(
        steps_per_epoch / dt_ep, 1), unit="env_steps/s incl. update"))

    # mixed-precision variant: bf16 hidden matmuls in actor/critic/disc
    # (f32 params/heads) — the MXU-bound half of the epoch at scale
    agent16 = AMPAgent(tenv, AMPConfig(horizon=32, num_minibatches=20,
                                       mini_epochs=6, amp_batch_size=512,
                                       hidden_bf16=True))
    ts16 = agent16.init(jax.random.PRNGKey(0))
    dt16 = _timed(lambda t: agent16.train_epoch(t)[0], ts16)
    rows.append(dict(metric=f"train epoch at {tr_envs} envs (hidden_bf16)",
                     value=round(steps_per_epoch / dt16, 1),
                     unit="env_steps/s incl. update"))

    # MFU: XLA-counted flops for the whole fused epoch / measured wall /
    # v5e bf16 peak (197 TFLOP/s; f32 matmuls run the MXU at half rate, so
    # this is a conservative denominator)
    try:
        lowered = jax.jit(lambda t: agent.train_epoch(t)[0]).lower(ts)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        peak = 197e12
        rows.append(dict(metric="train epoch MFU (vs v5e bf16 peak)",
                         value=round(flops / dt_ep / peak, 4), unit="",
                         flops_per_epoch=flops, epoch_seconds=round(dt_ep, 3)))
    except Exception as e:  # cost analysis unsupported through the tunnel
        rows.append(dict(metric="train epoch MFU", value=None,
                         error=f"cost_analysis unavailable: {e}"))

    for r in rows:
        print(json.dumps(r))


def main():
    _wait_for_backend()
    num_envs = int(__import__("os").environ.get("BENCH_ENVS", 4096))
    steps = int(__import__("os").environ.get("BENCH_STEPS", 32))

    from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
    from emloco_tpu.kinematics import motion_lib as ml
    from emloco_tpu.physics import generate_mixed_terrain

    terrain = generate_mixed_terrain(map_length=8.0, num_tiles=2,
                                     difficulty=0.5)
    lib = ml.synthetic_walk_motions(speeds=(1.0, 1.5), duration=2.0)
    cfg = EnvConfig(num_envs=num_envs, sensor_res=32, episode_length=168,
                    num_amp_obs_steps=15)
    env = PedestrianTerrainEnv(cfg, terrain, lib)

    key = jax.random.PRNGKey(0)
    state = env.reset(key)
    actions = jax.random.uniform(key, (num_envs, cfg.num_actions),
                                 minval=-0.3, maxval=0.3)

    @jax.jit
    def rollout(state):
        def body(s, _):
            s, out = env.step(s, actions)
            return s, out.reward.sum()
        return jax.lax.scan(body, state, None, length=steps)

    # compile + warmup
    state2, r = rollout(state)
    jax.block_until_ready(r)

    # median of 3 timed repeats: single-shot runs through the tunnel drift
    # ±3% between identical invocations (514.6k vs 528.4k on the same code,
    # VERDICT r4 weak #5) — the median pins round-over-round deltas
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state2, r = rollout(state2)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    steps_per_sec = num_envs * steps / dt
    print(json.dumps({
        "metric": f"humanoid env steps/sec/chip at {num_envs} envs",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_sec / 125_000.0, 4),
    }))


if __name__ == "__main__":
    import sys
    if "--breakdown" in sys.argv:
        breakdown()
    else:
        main()
