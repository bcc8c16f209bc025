"""Train-epoch timing across sensor-gather variants (round-5, VERDICT
item 3). The 16.6 ms/step scalar-path gather (trace fusion.2503,
terrain.py:107) appears ONLY inside the compiled train epoch — the bare
env.step scan runs the same gather vectorized (scripts/env_step_probe.py:
3.37 ms full step at 1,600 envs on the same 659^2 table). So variants
must be timed in the epoch program itself.

Variants:
  ix2d     baseline min2_tex[x0, y0]
  flat     jnp.take(ravel, x0*W+y0)
  bf16tab  bf16 min2/corner textures (halves table bytes)

Run on chip: python scripts/epoch_gather_probe.py
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
from emloco_tpu.learning.amp_agent import AMPAgent, AMPConfig
from emloco_tpu.physics import generate_mixed_terrain
from emloco_tpu.physics import terrain as terr_mod

ENVS = int(os.environ.get("BENCH_ENVS", 1600))


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def flat_min2(hf, x, y):
    gx, gy = terr_mod._grid_coords_xy(hf, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    W = hf.min2_tex.shape[1]
    return jnp.take(hf.min2_tex.ravel(), x0 * W + y0)


def barrier_min2(hf, x, y):
    return jax.lax.optimization_barrier(flat_min2(hf, x, y))


def sep_min2(hf, x, y):
    """Gather in a flattened 1-D index space with the OUTPUT immediately
    reshaped to (rows, 128) lanes before the barrier — bait for the
    vectorized row-gather."""
    gx, gy = terr_mod._grid_coords_xy(hf, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    W = hf.min2_tex.shape[1]
    idx = (x0 * W + y0).reshape(-1)
    h = jnp.take(hf.min2_tex.ravel(), idx)
    h = jax.lax.optimization_barrier(h.reshape(-1, 128))
    return h.reshape(x0.shape)


def tbarrier_min2(hf, x, y):
    """Barrier on the TABLE operand per call: blocks treating it as a
    prefetchable loop invariant (tests whether MSA promotion is the
    residual cost of the corner-path gather)."""
    gx, gy = terr_mod._grid_coords_xy(hf, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    W = hf.corner_tex.shape[1]
    tex = jax.lax.optimization_barrier(hf.corner_tex)
    t = jnp.take(tex.reshape(-1, 4), x0 * W + y0, axis=0)
    return jnp.minimum(t[..., 0], t[..., 3])


_PADTAB = {}


def padtab_min2(hf, x, y):
    """Corner table padded along W to 2048 (~21.6 MB at 659 rows): above
    any plausible VMEM-promotion budget."""
    gx, gy = terr_mod._grid_coords_xy(hf, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    key = id(hf.corner_tex)
    if key not in _PADTAB:
        H, W = hf.corner_tex.shape[:2]
        Wp = 2048
        pad = jnp.zeros((H, Wp, 4), hf.corner_tex.dtype)
        _PADTAB[key] = pad.at[:, :W].set(hf.corner_tex)
    texp = _PADTAB[key]
    t = jnp.take(texp.reshape(-1, 4), x0 * 2048 + y0, axis=0)
    return jnp.minimum(t[..., 0], t[..., 3])


def viacorner_min2(hf, x, y):
    """min(h00, h11) from the 4-channel corner texture: the 6.9 MB operand
    should exceed the alternate-memory promotion budget that pins the
    1.7 MB min2 table into VMEM (where the gather runs scalar)."""
    gx, gy = terr_mod._grid_coords_xy(hf, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    W = hf.corner_tex.shape[1]
    t = jnp.take(hf.corner_tex.reshape(-1, 4), x0 * W + y0, axis=0)
    return jnp.minimum(t[..., 0], t[..., 3])


_ORIG_CORNERS = terr_mod._corners


def flat_corners(hf, x0, y0):
    if hf.corner_tex is None:
        return _ORIG_CORNERS(hf, x0, y0)
    W = hf.corner_tex.shape[1]
    t = jnp.take(hf.corner_tex.reshape(-1, 4), x0 * W + y0, axis=0)
    return t[..., 0], t[..., 1], t[..., 2], t[..., 3]


def run(variant):
    terrain = generate_mixed_terrain(map_length=8.0, num_tiles=8,
                                     difficulty=0.5)
    if variant == "bf16tab":
        terrain = terrain.replace(
            min2_tex=terrain.min2_tex.astype(jnp.bfloat16),
            corner_tex=terrain.corner_tex.astype(jnp.bfloat16))
    obs_mod.height_at_min2_xy = {
        "flat": flat_min2, "cflat": flat_min2,
        "barrier": barrier_min2, "sep": sep_min2,
        "viacorner": viacorner_min2,
        "tbarrier": tbarrier_min2, "padtab": padtab_min2,
    }.get(variant, terr_mod.height_at_min2_xy)
    terr_mod._corners = (flat_corners if variant == "cflat"
                         else _ORIG_CORNERS)
    lib = ml.synthetic_walk_motions(speeds=(1.0, 1.5), duration=2.0)
    cfg = EnvConfig(num_envs=ENVS, sensor_res=32, episode_length=168,
                    num_amp_obs_steps=15)
    env = PedestrianTerrainEnv(cfg, terrain, lib)
    agent = AMPAgent(env, AMPConfig(horizon=32, num_minibatches=20,
                                    mini_epochs=6, amp_batch_size=512))
    ts = agent.init(jax.random.PRNGKey(0))
    dt = timed(lambda t: agent.train_epoch(t)[0], ts)
    print(json.dumps(dict(envs=ENVS, variant=variant,
                          epoch_s=round(dt, 4),
                          env_steps_per_s=round(32 * ENVS / dt, 1))),
          flush=True)
    obs_mod.height_at_min2_xy = terr_mod.height_at_min2_xy


if __name__ == "__main__":
    for v in sys.argv[1:] or ("ix2d", "flat", "bf16tab"):
        run(v)
