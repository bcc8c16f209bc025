"""End-to-end production-step timing across solver-layout configs.

Times the SAME scanned production step (the harness of
scripts/chain_attribution2.py, stage 0) under:

  default      env-last assembly + env-last blocked Pallas solver
  bm           batch-major assembly/solve (EngineConfig.batch_major_solver)
  bm+gram      batch-major + the Pallas fused weighted-Gram LHS
               (EngineConfig.gram_kernel)

plus a cross-config trajectory agreement check at small N before timing
(the paths differ only by bf16 contraction-order rounding; divergence
beyond that means a wrong kernel, not noise).

Run on chip:  python scripts/step_bench.py
CPU check:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/step_bench.py --check
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/emloco_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from emloco_tpu.kinematics import body_model as bm
from emloco_tpu.ops import quat
from emloco_tpu.physics import (EngineConfig, build_model, default_tree,
                                flat_terrain, kinematic_state)
from emloco_tpu.physics import reduced as rd

CHECK = "--check" in sys.argv
N = 64 if CHECK else int(os.environ.get("BENCH_ENVS", 4096))
ITERS = 4 if CHECK else 32
TREE = default_tree()

CONFIGS = {
    "default": EngineConfig(),
    "sqrt": EngineConfig(sqrt_gram=True),
    "gram": EngineConfig(gram_kernel=True),
    "bm": EngineConfig(batch_major_solver=True),
    "bm+gram": EngineConfig(batch_major_solver=True, gram_kernel=True),
}
if os.environ.get("BENCH_CONFIGS"):
    keep = os.environ["BENCH_CONFIGS"].split(",")
    CONFIGS = {k: v for k, v in CONFIGS.items() if k in keep}


def make_state(model):
    n = model.num_envs
    z = model.params.height_offset[:, None] * jnp.ones((n, 1))
    root_pos = jnp.concatenate([jnp.zeros((n, 2)), z], -1)
    return kinematic_state(model, TREE, root_pos, quat.identity_like((n,)),
                           quat.identity_like((n, bm.NUM_BODIES)))


def scanned(model, terrain, cfg):
    def run(st, tgt):
        def body(c, _):
            s, t = c
            s = rd.step(model, terrain, s, t, cfg, TREE)
            t = t + 1e-30 * s.u[0, 0]
            return (s, t), None
        return jax.lax.scan(body, (st, tgt), None, length=ITERS)[0]
    return jax.jit(run)


def timed(fn, st, tgt, reps=3):
    out = fn(st, tgt)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(st, tgt)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best, out


def main():
    betas = jnp.zeros((N, 16))
    model = build_model(bm.build_body_params(betas))
    terrain = flat_terrain(extent=20.0, cell=0.1)
    st0 = make_state(model)
    tgt0 = jnp.zeros((N, 23, 3))

    results, states = {}, {}
    for name, cfg in CONFIGS.items():
        t, (s, _) = timed(scanned(model, terrain, cfg), st0, tgt0)
        results[name] = round(t * 1e3, 3)
        states[name] = s
        print(json.dumps({"config": name, "envs": N,
                          "step_ms": results[name]}), flush=True)
    base = states["default"]
    for name, s in states.items():
        drift = float(jnp.abs(s.root_pos - base.root_pos).max())
        print(json.dumps({"config": name,
                          "root_drift_vs_default": round(drift, 6)}),
              flush=True)
        if not CHECK and drift > 1e-3:
            print(f"WARNING: {name} trajectory drift {drift}", flush=True)


if __name__ == "__main__":
    main()
