"""Full env-step timing across (envs x terrain-table x sensor-gather
variant) — isolating the round-5 trace finding: the 1,024-point sensor
height gather (terrain.py:107) ran as a ~16.6 ms/step scalar-path "custom
fusion" inside the 1,600-env TRAIN config (num_tiles=8, 659^2 table) while
the 4,096-env BENCH config (num_tiles=2) gets a vectorized kernel
(~1.5 ms at 4,096 envs, r4 trace). Standalone microprobes of the same
gather are uniformly slow (scripts/sensor_gather_probe.py: 43 ms at 4,096
envs) — kernel choice depends on the surrounding program, so this probe
times the REAL PedestrianTerrainEnv.step in a scan, like bench.py.

Variants monkeypatch the sensor lookup in envs.observations:
  ix2d   baseline min2_tex[x0, y0]
  flat   jnp.take(min2_tex.ravel(), x0*W + y0)

Run on chip: python scripts/env_step_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/emloco_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from emloco_tpu.envs import EnvConfig, PedestrianTerrainEnv
from emloco_tpu.envs import observations as obs_mod
from emloco_tpu.kinematics import motion_lib as ml
from emloco_tpu.physics import generate_mixed_terrain
from emloco_tpu.physics import terrain as terr_mod

STEPS = 32


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def flat_min2(hf, x, y):
    gx, gy = terr_mod._grid_coords_xy(hf, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    W = hf.min2_tex.shape[1]
    return jnp.take(hf.min2_tex.ravel(), x0 * W + y0)


VARIANTS = {
    "base": terr_mod.height_at_min2_xy,
    "cflat": terr_mod.height_at_min2_xy,
}

_ORIG_CORNERS = terr_mod._corners


def flat_corners(hf, x0, y0):
    if hf.corner_tex is None:
        return _ORIG_CORNERS(hf, x0, y0)
    W = hf.corner_tex.shape[1]
    t = jnp.take(hf.corner_tex.reshape(-1, 4), x0 * W + y0, axis=0)
    return t[..., 0], t[..., 1], t[..., 2], t[..., 3]


def run(envs, tiles):
    terrain = generate_mixed_terrain(map_length=8.0, num_tiles=tiles,
                                     difficulty=0.5)
    side = terrain.min2_tex.shape[0]
    lib = ml.synthetic_walk_motions(speeds=(1.0, 1.5), duration=2.0)
    cfg = EnvConfig(num_envs=envs, sensor_res=32, episode_length=168,
                    num_amp_obs_steps=15)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    state = env.reset(jax.random.PRNGKey(0))
    actions = jax.random.uniform(jax.random.PRNGKey(1),
                                 (envs, cfg.num_actions),
                                 minval=-0.3, maxval=0.3)
    for name, fn in VARIANTS.items():
        if name.startswith("cflat"):
            obs_mod.height_at_min2_xy = terr_mod.height_at_min2_xy
            terr_mod._corners = flat_corners
        else:
            obs_mod.height_at_min2_xy = fn
            terr_mod._corners = _ORIG_CORNERS

        @jax.jit
        def roll(s):
            def body(c, _):
                c, out = env.step(c, actions)
                return c, out.reward.sum()
            return jax.lax.scan(body, s, None, length=STEPS)

        dt = timed(roll, state)
        print(json.dumps(dict(envs=envs, tiles=tiles, side=int(side),
                              variant=name,
                              ms_per_step=round(dt / STEPS * 1e3, 3),
                              env_steps_per_s=round(envs * STEPS / dt, 1))),
              flush=True)
    obs_mod.height_at_min2_xy = terr_mod.height_at_min2_xy


if __name__ == "__main__":
    for envs, tiles in ((4096, 2), (4096, 8)):
        run(envs, tiles)
