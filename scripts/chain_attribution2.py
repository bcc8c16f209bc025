"""Per-stage in-situ attribution of the once-per-control-step factor chain
(follow-up to scripts/merge_attribution.py, which measured the whole chain
at 6.9 ms marginal = 74% of the 9.35 ms production step at 4,096 envs).

Same methodology — time a scanned production step, then the same scan with a
PREFIX of the chain executed a second time per iteration, folded back into
the carry at 1e-30 so XLA cannot DCE or hoist it — with cumulative prefixes
so stage marginals are differences of adjacent prefix timings:

  P1  ground geometry + terrain corner-gather (+pen gates)
  P2  + _build_rows_merged (G, W, t2m)
  P3  + full _contact_and_jacobians (point/normal rows, friction gates)
  P4  + gravity/bias/spring + q_contact + merged RHS
  P5  + merged LHS  (== merge_attribution's chain)

Run on chip:  python scripts/chain_attribution2.py
CPU check:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/chain_attribution2.py --check
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
from emloco_tpu.physics.terrain import height_and_normal_at

CHECK = "--check" in sys.argv
N = 64 if CHECK else int(os.environ.get("BENCH_ENVS", 4096))
ITERS = 4 if CHECK else 32
TREE = default_tree()
CFG = EngineConfig()


def make_state(model):
    n = model.num_envs
    z = model.params.height_offset[:, None] * jnp.ones((n, 1))
    root_pos = jnp.concatenate([jnp.zeros((n, 2)), z], -1)
    return kinematic_state(model, TREE, root_pos, quat.identity_like((n,)),
                           quat.identity_like((n, bm.NUM_BODIES)))


def prefix(model, terrain, st, target_q, cfg, stage):
    """Cumulative prefix of the chain; returns a scalar touching every
    output computed so far."""
    dt = cfg.substep_dt
    x, q = st.body_x, st.body_q
    # P1: geometry + terrain corner gather
    pts, radius, ground_body = rd._ground_geometry(model, x, q, cfg)
    h, nrm = height_and_normal_at(terrain, pts[..., :2])
    pen = (h + radius - pts[..., 2]) * nrm[..., 2]
    s = jnp.sum(pen) + jnp.sum(nrm[..., 0])
    if stage == 1:
        return s
    # P2: merged body rows
    piv_j = x[:, 1:] + rd.quat.rotate(q[:, 1:], model.anchor_c[:, 1:])
    pivots_x = jnp.concatenate([x[:, 0:1], piv_j], axis=1)
    G, W, t2m = rd._build_rows_merged(
        model, x, q, pivots_x,
        jnp.bfloat16 if cfg.rows_bf16 else jnp.float32)
    s = s + jnp.sum(G[:, 0, :]) + jnp.sum(W[:, 0, :]) + jnp.sum(t2m[:, 0, :])
    if stage == 2:
        return s
    # P3: the full fresh-geometry build (point/normal rows, gates)
    (G, W, ground, selfrows, Jn_a_all, nrm, active, d_t, pen_f, diag,
     h0, radius, pts0, ground_body, self_pts0, table) = \
        rd._contact_and_jacobians(model, terrain, st, cfg)
    s = s + jnp.sum(ground[0][:, 0]) + jnp.sum(Jn_a_all[:, 0]) + jnp.sum(d_t)
    if stage == 3:
        return s
    # P4: forces + merged RHS
    ng = radius.shape[1]
    gvec = jnp.array([0.0, 0.0, cfg.gravity])
    f_lin, Q_rest = rd._gravity_bias_spring(model, st.body_x, st.body_q,
                                            st.body_v, st.body_w, st.u,
                                            target_q, gvec)
    k_n = cfg.contact_stiffness
    Q_rest = Q_rest + rd._q_contact_merged(k_n * pen_f[:, :ng], nrm[:, :ng],
                                           k_n * pen_f, Jn_a_all)
    rhs_t = rd._assemble_rhs_merged(model, G, W, st.body_q, st.body_v,
                                    st.body_w, f_lin, dt, Q_rest)
    s = s + jnp.sum(rhs_t[:, 0])
    if stage == 4:
        return s
    # P5: merged LHS (full chain)
    At = rd._assemble_lhs_merged(model, G, W, diag, ground, selfrows, table)
    return s + jnp.sum(At[0, 0])


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
    betas = jnp.zeros((N, 16))
    model = build_model(bm.build_body_params(betas))
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
                    target_q = quat.exp_map_to_quat(t)
                    extra = prefix(model, terrain, s, target_q, cfg, stage)
                    t = t + 1e-30 * extra
                return (s, t), None
            return jax.lax.scan(body, (st, tgt), None, length=ITERS)[0]
        return jax.jit(run)

    names = {0: "base_step", 1: "geometry+terrain_gather",
             2: "+build_rows_merged", 3: "+point/normal_rows(gates)",
             4: "+forces+rhs", 5: "+lhs"}
    prev = None
    out = []
    for stage in range(6):
        t = timed(scanned(stage), st0, tgt0)
        row = {"stage": names[stage], "envs": N,
               "total_ms": round(t * 1e3, 3)}
        if prev is not None:
            row["marginal_ms"] = round((t - prev) * 1e3, 3)
        prev = t
        out.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
