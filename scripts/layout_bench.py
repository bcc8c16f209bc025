"""Row-merged Jacobian layout probe.

Hypothesis: the hot per-substep tensors (N,B,3,72) tile-pad ~4.7x on TPU
((3,72) minor -> (8,128)); emitting them row-merged as (N,72,72+) via
e-folded static tensors (no reshapes -- the dots emit the merged layout
directly) pads only 1.78x and should cut substep HBM traffic ~2.6x.

Variant A reproduces the current _build_jacobians/_assemble chain
(reduced.py:336-440); variant B emits merged rows and composes the LHS from
blocks (no [eye|...] concats). Both end in the same (75,75,N) LHS and
(75,N) rhs; equality is asserted at small N before timing.

Run on chip:  python scripts/layout_bench.py
CPU check:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/layout_bench.py --check
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from emloco_tpu.physics import reduced as rd

B, NJ, NU = rd.B, rd.NJ, rd.NU
M = 3 * B                      # 72 merged rows
C = rd.NC                      # 48 ground rows
RC = 3 * C                     # 144 merged contact rows

EPS_JW = rd._EPS_JW            # (B,3,3,72)
EPS_COL = rd._EPS_COL          # (24,3,3,72)
SUBX = rd._SUBX                # (24,B)
JW = rd._JW_EXT                # (B,3,72)
CBODY = rd._CONTACT_BODY       # (48,)
NA = 72                        # angular columns

# ---- merged static tensors ----
# term1m: E1[k,j,3k+i,c] = EPS_JW[k,j,i,c]
E1 = np.zeros((B, 3, M, NA), np.float32)
for k in range(B):
    E1[k, :, 3 * k:3 * k + 3, :] = EPS_JW[k].transpose(0, 1, 2)
# term2m: F[a,j,3k+i,c] = SUBX[a,k] * (-EPS_COL[a,j,i,c])
F = np.einsum("ak,ajic->ajkic", SUBX, -EPS_COL).reshape(24, 3, M, NA)
F = np.ascontiguousarray(F.astype(np.float32))
# W: T[k,j,i,3k+i,c] = JW[k,j,c]
TW = np.zeros((B, 3, 3, M, NA), np.float32)
for k in range(B):
    for i in range(3):
        TW[k, :, i, 3 * k + i, :] = JW[k]
# contact term1: E1C[ci,j,3ci+i,c] = EPS_JW[body(ci),j,i,c]
E1C = np.zeros((C, 3, RC, NA), np.float32)
for ci in range(C):
    E1C[ci, :, 3 * ci:3 * ci + 3, :] = EPS_JW[CBODY[ci]]
# contact term2 row expansion: OH[r, m] = 1 where m = 3*body(r//3) + r%3
OH = np.zeros((RC, M), np.float32)
for r in range(RC):
    OH[r, 3 * CBODY[r // 3] + r % 3] = 1.0
# per-row -> per-contact block sum: P[c, r] = 1 for r in [3c, 3c+3)
P = np.zeros((C, RC), np.float32)
for ci in range(C):
    P[ci, 3 * ci:3 * ci + 3] = 1.0
# flatteners
FL = np.zeros((B, 3, M), np.float32)        # (N,B,3)->(N,72)
for k in range(B):
    for i in range(3):
        FL[k, i, 3 * k + i] = 1.0
FLC = np.zeros((C, 3, RC), np.float32)      # (N,C,3)->(N,144)
for ci in range(C):
    for i in range(3):
        FLC[ci, i, 3 * ci + i] = 1.0
# row -> xyz selector: ISEL[m, i] = 1 where i = m % 3
ISEL = np.tile(np.eye(3, dtype=np.float32), (B, 1))          # (72,3)
ISELC = np.tile(np.eye(3, dtype=np.float32), (C, 1))         # (144,3)


def inputs(n, key):
    ks = jax.random.split(key, 12)
    r = lambda i, shape: jax.random.normal(ks[i], shape) * 0.1
    q = jax.random.normal(ks[0], (n, B, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    import emloco_tpu.ops.quat as quat
    R = quat.to_matrix(q)
    return dict(
        x=r(1, (n, B, 3)), piv=r(2, (n, B, 3)), R=R,
        sqrtD=jnp.abs(r(3, (n, B, 3))) + 0.5,
        mass=jnp.abs(r(4, (n, B))) + 1.0,
        pts=r(5, (n, C, 3)),
        nrm=jnp.concatenate([r(6, (n, C, 2)) * 0.1,
                             jnp.ones((n, C, 1))], -1),
        wt=jnp.abs(r(7, (n, C))), wn=jnp.abs(r(8, (n, C))) + 0.1,
        pen=r(9, (n, C)), f=r(10, (n, B, 3)), v2=r(11, (n, B, 3)),
        diag=jnp.abs(jax.random.normal(ks[0], (n, NU))) + 0.1,
    )


def chain_a(d):
    """Current layout (reduced.py:336-440 faithful)."""
    x, piv = d["x"], d["piv"]
    n = x.shape[0]
    term1 = jnp.einsum("nkj,kjic->nkic", x, jnp.asarray(EPS_JW))
    t2 = jnp.einsum("naj,ajic->naic", piv, jnp.asarray(-EPS_COL))
    term2 = jnp.einsum("naic,ak->nkic", t2, jnp.asarray(SUBX))
    eye = jnp.broadcast_to(jnp.eye(3), (n, B, 3, 3))
    Jv4 = jnp.concatenate([eye, term1 + term2], -1)
    RtJw = jnp.einsum("nkji,kjc->nkic", d["R"], jnp.asarray(JW))
    W4 = jnp.concatenate([jnp.zeros((n, B, 3, 3)),
                          d["sqrtD"][..., None] * RtJw], -1)
    term1c = jnp.einsum("ncj,cjid->ncid", d["pts"],
                        jnp.asarray(EPS_JW[CBODY]))
    eyec = jnp.broadcast_to(jnp.eye(3), (n, C, 3, 3))
    Jc = jnp.concatenate([eyec, term1c + term2[:, CBODY]], -1)
    Jn = jnp.einsum("nci,ncij->ncj", d["nrm"], Jc)
    mw = d["mass"][..., None, None]
    At = jnp.einsum("nkic,nkid->cdn", mw * Jv4, Jv4)
    At = At + jnp.einsum("nkic,nkid->cdn", W4, W4)
    At = At + jnp.einsum("nkic,nkid->cdn", d["wt"][..., None, None] * Jc, Jc)
    At = At + jnp.einsum("nci,ncj->ijn",
                         (d["wn"] - d["wt"])[..., None] * Jn, Jn)
    At = At + jnp.eye(NU)[:, :, None] * d["diag"].T[:, None, :]
    Mu = jnp.einsum("nkic,nki->cn", Jv4, d["f"])
    Mu = Mu + jnp.einsum("nkic,nki->cn", W4, d["v2"])
    Q = jnp.einsum("nc,ncj->nj", d["pen"], Jn)
    return At, Mu, Q


def chain_b(d):
    """Row-merged layout + block assembly (no eye/zero concats)."""
    x, piv = d["x"], d["piv"]
    n = x.shape[0]
    t1m = jnp.einsum("nkj,kjmc->nmc", x, jnp.asarray(E1))      # (N,72,72)
    t2m = jnp.einsum("naj,ajmc->nmc", piv, jnp.asarray(F))     # (N,72,72)
    G = t1m + t2m
    sD = jnp.einsum("nki,kim->nm", d["sqrtD"], jnp.asarray(FL))
    W = sD[..., None] * jnp.einsum("nkji,kjimc->nmc", d["R"],
                                   jnp.asarray(TW))            # (N,72,72)
    # contact rows (merged): Gc = term1c + rows(term2)
    Gc = (jnp.einsum("ncj,cjrd->nrd", d["pts"], jnp.asarray(E1C))
          + jnp.einsum("nmd,rm->nrd", t2m, jnp.asarray(OH)))   # (N,144,72)
    nrm_m = jnp.einsum("nci,cir->nr", d["nrm"], jnp.asarray(FLC))
    Jn_a = jnp.einsum("cr,nrd->ncd", jnp.asarray(P),
                      nrm_m[..., None] * Gc)                   # (N,48,72)
    # block assembly
    mass_m = jnp.repeat(d["mass"], 3, axis=-1)                 # (N,72)
    wt_r = jnp.repeat(d["wt"], 3, axis=-1)                     # (N,144)
    wnt = d["wn"] - d["wt"]
    A_aa = jnp.einsum("nmc,nmd->cdn", mass_m[..., None] * G, G)
    A_aa = A_aa + jnp.einsum("nmc,nmd->cdn", W, W)
    A_aa = A_aa + jnp.einsum("nrc,nrd->cdn", wt_r[..., None] * Gc, Gc)
    A_aa = A_aa + jnp.einsum("ncd,nce->den", wnt[..., None] * Jn_a, Jn_a)
    # lin-ang strip: sum m_k G[(k,i),:] per i + contact/Jn parts
    A_la = jnp.einsum("nmc,mi->icn", mass_m[..., None] * G, jnp.asarray(ISEL))
    A_la = A_la + jnp.einsum("nrc,ri->icn", wt_r[..., None] * Gc,
                             jnp.asarray(ISELC))
    A_la = A_la + jnp.einsum("nci,ncd->idn", wnt[..., None] * d["nrm"], Jn_a)
    # lin-lin corner: (sum_k m_k + sum_c wt_c) I + sum_c wnt n n^T
    s0 = d["mass"].sum(-1) + d["wt"].sum(-1)                   # (N,)
    A_ll = (jnp.eye(3)[:, :, None] * s0[None, None, :]
            + jnp.einsum("nci,ncj->ijn", wnt[..., None] * d["nrm"], d["nrm"]))
    top = jnp.concatenate([A_ll, A_la], axis=1)                # (3,75,N)
    bot = jnp.concatenate([jnp.swapaxes(A_la, 0, 1), A_aa], axis=1)
    At = jnp.concatenate([top, bot], axis=0)                   # (75,75,N)
    At = At + jnp.eye(NU)[:, :, None] * d["diag"].T[:, None, :]
    # rhs
    fm = jnp.einsum("nki,kim->nm", d["f"], jnp.asarray(FL))
    v2m = jnp.einsum("nki,kim->nm", d["v2"], jnp.asarray(FL))
    Mu_a = jnp.einsum("nmc,nm->cn", G, fm) + jnp.einsum("nmc,nm->cn", W, v2m)
    Mu_l = d["f"].sum(1).T                                     # (3,N)
    Mu = jnp.concatenate([Mu_l, Mu_a], axis=0)                 # (75,N)
    # Q = Jn^T pen (75 cols): lin part sum_c pen*nrm; ang part Jn_a
    pen_r = d["pen"]
    Q = jnp.concatenate([jnp.einsum("nc,nci->ni", pen_r, d["nrm"]),
                         jnp.einsum("nc,ncd->nd", pen_r, Jn_a)], axis=-1)
    return At, Mu, Q


def feedback(d, out):
    """Touch every state-derived input so nothing hoists out of the scan
    (the real substep rebuilds x, pivots, R, contact points, forces and
    bias velocities from the integrated state every time)."""
    At, Mu, Q = out
    d = dict(d)
    dx = Mu.T[:, :3][:, None, :]
    d["x"] = d["x"] + 1e-9 * dx
    d["piv"] = d["piv"] + 1e-9 * dx
    d["R"] = d["R"] + 1e-9 * dx[..., None, :3]
    d["pts"] = d["pts"] + 1e-9 * Q[:, :3][:, None, :]
    d["f"] = d["f"] + 1e-9 * dx
    d["v2"] = d["v2"] + 1e-9 * dx
    return d


def timed_scan(chain, d, iters=16):
    @jax.jit
    def run(d):
        def body(c, _):
            return feedback(c, chain(c)), ()
        return jax.lax.scan(body, d, None, length=iters)[0]

    out = run(d)
    float(out["x"].sum())          # force full execution through the tunnel
    t0 = time.perf_counter()
    out = run(d)
    float(out["x"].sum())
    return (time.perf_counter() - t0) / iters


def main():
    if "--check" in sys.argv:
        d = inputs(4, jax.random.PRNGKey(0))
        for name, (a, b) in zip(("At", "Mu", "Q"),
                                zip(chain_a(d), chain_b(d))):
            err = float(jnp.abs(a - b).max())
            print(f"{name}: max|A-B| = {err:.3e}")
            assert err < 1e-4, name
        print("layouts agree")
        return
    n = int(os.environ.get("BENCH_ENVS", 4096))
    d = inputs(n, jax.random.PRNGKey(0))
    for name, chain in (("current-4d", chain_a), ("row-merged", chain_b)):
        dt = timed_scan(chain, d)
        print(json.dumps({"variant": name, "envs": n,
                          "ms_per_iter": round(dt * 1e3, 3)}))


if __name__ == "__main__":
    main()
