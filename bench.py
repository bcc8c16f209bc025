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


def main():
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

    t0 = time.perf_counter()
    state3, r = rollout(state2)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps_per_sec = num_envs * steps / dt
    print(json.dumps({
        "metric": f"humanoid env steps/sec/chip at {num_envs} envs",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_sec / 125_000.0, 4),
    }))


if __name__ == "__main__":
    main()
