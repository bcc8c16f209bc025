"""In-situ attribution of the row-merged Jacobian/assembly chain (VERDICT
r3 weak #1): the standalone probe (scripts/layout_bench.py) measured the
chain at 1.913 ms/iter merged vs 3.194 ms/iter in the old 4-D layout at
4,096 envs — ~11% of the control step — yet the end-to-end bench moved only
+1% when the merged layout shipped. This script measures what the chain
actually costs INSIDE the compiled production step, by marginal cost: time
a scanned production step, then the same scan with the once-per-control-
step factor chain executed a second time per iteration (geometry + merged
rows + LHS/RHS assembly, optionally + the blocked Cholesky factor), with
the extra result folded back into the carry at 1e-30 so XLA cannot DCE or
hoist it.

  marginal(chain)  = t(step + chain)  − t(step)
  marginal(factor) = t(step + chain + factor) − t(step + chain)

If marginal(chain) ≈ the probe's 1.9 ms, the probe was faithful and the
pre-merge production chain really did cost ~3.2 ms — the +1% bench move
needs another explanation. If marginal(chain) is much smaller, XLA fuses
the in-situ chain far better than the standalone harness could, both
layouts were cheaper in production than probed, and the expected win was
never ~11% — that attribution closes the discrepancy.

Run on chip:  python scripts/merge_attribution.py
CPU check:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/merge_attribution.py --check
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


def make_state(model):
    n = model.num_envs
    z = model.params.height_offset[:, None] * jnp.ones((n, 1))
    root_pos = jnp.concatenate([jnp.zeros((n, 2)), z], -1)
    st = kinematic_state(model, TREE, root_pos, quat.identity_like((n,)),
                         quat.identity_like((n, bm.NUM_BODIES)))
    return st


def extra_chain(model, terrain, st, target_q, cfg, with_factor):
    """One extra once-per-control-step factor chain on the CURRENT state;
    returns a scalar that depends on every output."""
    dt = cfg.substep_dt
    (G, W, ground, selfrows, Jn_a_all, nrm, active, d_t, pen_f, diag,
     h0, radius, pts0, ground_body, self_pts0, table) = \
        rd._contact_and_jacobians(model, terrain, st, cfg)
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
    At = rd._assemble_lhs_merged(model, G, W, diag, ground, selfrows, table)
    s = jnp.sum(At[0, 0]) + jnp.sum(rhs_t[0])
    if with_factor:
        from emloco_tpu.physics.pallas_linalg import (
            backend_supports_pallas, cholesky_factor_blocked_t)
        At = At + 1e-8 * jnp.eye(rd.NU)[:, :, None]
        if backend_supports_pallas():
            L = cholesky_factor_blocked_t(At, rd._ARROW_CHUNKS,
                                          rd._ARROW_LIMBS, rd._ARROW_S)
            s = s + jnp.sum(L[0] if isinstance(L, jnp.ndarray) else
                            sum(jnp.sum(x) for x in jax.tree.leaves(L)))
        else:
            L = jnp.linalg.cholesky(jnp.moveaxis(At, -1, 0)
                                    + 1e-6 * jnp.eye(rd.NU))
            s = s + jnp.sum(L[0])
    return s


def extra_chain_4d(model, terrain, st, target_q, cfg):
    """The same once-per-step chain in the PRE-MERGE 4-D layout
    (_build_jacobians/_point_jacobians/_assemble_lhs/_assemble_rhs) — its
    in-situ marginal cost vs extra_chain's is the true end-to-end delta the
    merged integration could ever have bought."""
    dt = cfg.substep_dt
    x, q = st.body_x, st.body_q
    piv_j = x[:, 1:] + rd.quat.rotate(q[:, 1:], model.anchor_c[:, 1:])
    pivots_x = jnp.concatenate([x[:, 0:1], piv_j], axis=1)
    Jv4, W4, term2 = rd._build_jacobians(model, x, q, pivots_x)
    pts, radius, gbody = rd._ground_geometry(model, x, q, cfg)
    h, nrm = rd.height_and_normal_at(terrain, pts[..., :2])
    pen = (h + radius - pts[..., 2]) * nrm[..., 2]
    active = (pen > 0.0).astype(x.dtype)
    Jc = rd._point_jacobians(pts, gbody, term2)
    Jn = jnp.einsum("nci,ncij->ncj", nrm, Jc)
    k_n = cfg.contact_stiffness
    pen_f = active * jnp.minimum(pen, cfg.max_depenetration)
    wn = active * dt * (dt * k_n + cfg.contact_damping)
    wt = active * dt * 0.5
    N = x.shape[0]
    p = model.params
    diag_joint = dt * p.kd + dt * dt * p.kp
    diag = jnp.concatenate([
        jnp.full((N, 3), dt * cfg.linear_damping),
        jnp.full((N, 3), dt * cfg.angular_damping),
        jnp.repeat(diag_joint, 3, axis=-1),
    ], axis=-1)
    gvec = jnp.array([0.0, 0.0, cfg.gravity])
    f_lin, Q_rest = rd._gravity_bias_spring(model, x, q, st.body_v,
                                            st.body_w, st.u, target_q, gvec)
    Q_rest = Q_rest + jnp.einsum("nc,ncj->nj", k_n * pen_f, Jn)[:, :rd.NU]
    At = rd._assemble_lhs(model, Jv4, W4, diag, wn, wt, Jn, Jc)
    rhs = rd._assemble_rhs(model, Jv4, W4, q, st.body_v, st.body_w, f_lin,
                           dt, Q_rest)
    return jnp.sum(At[0, 0]) + jnp.sum(rhs[0])


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

    results = []
    for cfg_name, cfg in (
            ("default", EngineConfig()),
            ("no_tgs", EngineConfig(tgs_step=False)),
    ):
        def base(st, tgt, cfg=cfg):
            def body(c, _):
                s, t = c
                s = rd.step(model, terrain, s, t, cfg, TREE)
                # state-dependent target: keeps every iter live
                t = t + 1e-30 * s.u[0, 0]
                return (s, t), None
            return jax.lax.scan(body, (st, tgt), None, length=ITERS)[0]

        def plus(st, tgt, with_factor, cfg=cfg):
            def body(c, _):
                s, t = c
                s = rd.step(model, terrain, s, t, cfg, TREE)
                target_q = quat.exp_map_to_quat(t)
                extra = extra_chain(model, terrain, s, target_q, cfg,
                                    with_factor)
                t = t + 1e-30 * s.u[0, 0] + 1e-30 * extra
                return (s, t), None
            return jax.lax.scan(body, (st, tgt), None, length=ITERS)[0]

        def plus4d(st, tgt, cfg=cfg):
            def body(c, _):
                s, t = c
                s = rd.step(model, terrain, s, t, cfg, TREE)
                target_q = quat.exp_map_to_quat(t)
                extra = extra_chain_4d(model, terrain, s, target_q, cfg)
                t = t + 1e-30 * s.u[0, 0] + 1e-30 * extra
                return (s, t), None
            return jax.lax.scan(body, (st, tgt), None, length=ITERS)[0]

        jb = jax.jit(base)
        jp0 = jax.jit(lambda s, t: plus(s, t, False))
        jp1 = jax.jit(lambda s, t: plus(s, t, True))
        jp4 = jax.jit(plus4d)
        t_base = timed(jb, st0, tgt0)
        t_chain = timed(jp0, st0, tgt0)
        t_factor = timed(jp1, st0, tgt0)
        t_4d = timed(jp4, st0, tgt0)
        row = {
            "cfg": cfg_name, "envs": N,
            "step_ms": round(t_base * 1e3, 3),
            "step_plus_chain_ms": round(t_chain * 1e3, 3),
            "step_plus_chain_factor_ms": round(t_factor * 1e3, 3),
            "step_plus_chain4d_ms": round(t_4d * 1e3, 3),
            "marginal_chain_ms": round((t_chain - t_base) * 1e3, 3),
            "marginal_chain4d_ms": round((t_4d - t_base) * 1e3, 3),
            "marginal_factor_ms": round((t_factor - t_chain) * 1e3, 3),
            "chain_pct_of_step": round(100 * (t_chain - t_base) / t_base, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # substep scaling: per-substep vs per-control-step split
    for nss in (1, 2, 4):
        cfg = EngineConfig(n_substeps=nss)

        def base2(st, tgt, cfg=cfg):
            def body(c, _):
                s, t = c
                s = rd.step(model, terrain, s, t, cfg, TREE)
                t = t + 1e-30 * s.u[0, 0]
                return (s, t), None
            return jax.lax.scan(body, (st, tgt), None, length=ITERS)[0]

        t = timed(jax.jit(base2), st0, tgt0)
        print(json.dumps({"cfg": f"substeps_{nss}", "envs": N,
                          "step_ms": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
