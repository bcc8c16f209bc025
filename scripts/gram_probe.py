"""Split the fused-Gram LHS cost (3.19 ms in-situ marginal at 4,096 envs,
scripts/chain_attribution2.py) into its parts: stacked-row concat, the
batched Gram matmul itself, and the env-last (c,d,n) emission vs the
batched-native (n,c,d) layout. Same faithful scan harness as the other
probes (every operand state-derived, results folded back at 1e-30).

  V1  build the stacked R rows + weights only
  V2  + Gram einsum emitting (n,c,d)   — XLA batched-dot native layout
  V3  + Gram einsum emitting (c,d,n)   — production (Pallas solver layout)

marginal(V3) − marginal(V2) ≈ what the env-last emission costs;
marginal(V2) − marginal(V1) ≈ the matmul; marginal(V1) ≈ the concats.

Run on chip:  python scripts/gram_probe.py
CPU check:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/gram_probe.py --check
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
CFG = EngineConfig()


def make_state(model):
    n = model.num_envs
    z = model.params.height_offset[:, None] * jnp.ones((n, 1))
    return kinematic_state(model, TREE,
                           jnp.concatenate([jnp.zeros((n, 2)), z], -1),
                           quat.identity_like((n,)),
                           quat.identity_like((n, bm.NUM_BODIES)))


def stacked_rows(model, terrain, st, cfg):
    """Rebuild the production R/w stacks exactly as _assemble_lhs_merged."""
    (G, W, ground, selfrows, *_rest) = \
        rd._contact_and_jacobians(model, terrain, st, cfg)
    table = _rest[-1]
    Gc, Jn_a, nrm, wn, wt = ground
    p = model.params
    rdt = G.dtype
    n = G.shape[0]
    _, _, _, _, ISELC = rd._merged_point_statics(table)
    isel = jnp.broadcast_to(jnp.asarray(rd._ISEL_M, rdt), (n, rd.MROWS, 3))
    iselc = jnp.broadcast_to(jnp.asarray(ISELC, rdt), (n,) + ISELC.shape)
    mass_m = jnp.repeat(p.mass, 3, axis=-1)
    rows = [jnp.concatenate([isel, G], -1),
            jnp.concatenate([jnp.zeros((n, rd.MROWS, 3), rdt), W], -1),
            jnp.concatenate([iselc, Gc], -1),
            jnp.concatenate([nrm.astype(rdt), Jn_a], -1)]
    wgt = [mass_m, jnp.ones_like(mass_m), jnp.repeat(wt, 3, axis=-1), wn - wt]
    R = jnp.concatenate(rows, axis=1)
    wv = jnp.concatenate(wgt, axis=1).astype(rdt)
    return R, wv


def timed(fn, st, tgt):
    out = fn(st, tgt)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(2 if CHECK else 3):
        t0 = time.perf_counter()
        out = fn(st, tgt)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    model = build_model(bm.build_body_params(jnp.zeros((N, 16))))
    terrain = flat_terrain(extent=20.0, cell=0.1)
    st0 = make_state(model)
    tgt0 = jnp.zeros((N, 23, 3))
    cfg = CFG

    def scanned(stage):
        def run(st, tgt):
            def body(c, _):
                s, t = c
                s = rd.step(model, terrain, s, t, cfg, TREE)
                t = t + 1e-30 * s.u[0, 0]
                if stage > 0:
                    R, wv = stacked_rows(model, terrain, s, cfg)
                    extra = jnp.sum(R[:, 0]).astype(jnp.float32) \
                        + jnp.sum(wv[:, 0])
                    if stage == 2:
                        A = jnp.einsum("nmc,nmd->ncd", wv[..., None] * R, R,
                                       preferred_element_type=jnp.float32)
                        extra = extra + jnp.sum(A[:, 0, 0]) + jnp.sum(A[0])
                    if stage == 3:
                        A = jnp.einsum("nmc,nmd->cdn", wv[..., None] * R, R,
                                       preferred_element_type=jnp.float32)
                        extra = extra + jnp.sum(A[0, 0]) + jnp.sum(A[..., 0])
                    t = t + 1e-30 * extra
                return (s, t), None
            return jax.lax.scan(body, (st, tgt), None, length=ITERS)[0]
        return jax.jit(run)

    names = {0: "base_step", 1: "+stack_rows", 2: "+gram_ncd", 3: "+gram_cdn"}
    prev = None
    for stage in range(4):
        t = timed(scanned(stage), st0, tgt0)
        row = {"stage": names[stage], "envs": N, "total_ms": round(t * 1e3, 3)}
        if prev is not None:
            row["marginal_ms"] = round((t - prev) * 1e3, 3)
        prev = t
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
