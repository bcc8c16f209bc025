"""Pallas TPU kernel: batched SPD Cholesky solve with envs on lanes.

XLA's batched `cholesky` + `triangular_solve` for (N, 75, 75) systems makes
dozens of passes over the matrices in HBM (the dominant memory traffic of the
physics substep). This kernel lays the batch out **env-last** — each of the
128 lanes owns one env's system — loads a (75, 75, 128) block into VMEM once,
runs a textbook right-looking Cholesky + two triangular solves entirely
on-chip, and writes back only the (75, 128) solution: HBM traffic drops from
~2 GB to one read of A + one write of x.

All loop bounds are static (75); row masking replaces dynamic shapes
(pallas guide: static shapes, masked updates).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _chol_solve_kernel(a_ref, b_ref, x_ref, w_ref, y_ref):
    """a (M,M,L), b (M,L) → x (M,L); w,y scratch."""
    M = a_ref.shape[0]
    w_ref[:] = a_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)

    def chol_step(k, _):
        d = w_ref[k, k, :]                                 # (L,)
        s = jnp.sqrt(jnp.maximum(d, 1e-12))
        col = w_ref[:, k, :] / s[None, :]                  # (M,L)
        col = jnp.where(rows > k, col, 0.0)
        # write the finished L column (diag = s, below-diag = col)
        onehot = (rows == k).astype(col.dtype)
        w_ref[:, k, :] = col + onehot * s[None, :]
        # rank-1 trailing update (col is zero at and above row k, so rows/cols
        # ≤ k are untouched)
        w_ref[:, :, :] = w_ref[:] - col[:, None, :] * col[None, :, :]
        return 0

    jax.lax.fori_loop(0, M, chol_step, 0)

    # forward solve L y = b (y[j] stays 0 until assigned; L upper = garbage
    # but masked reads use only the finished lower-triangular columns)
    y_ref[:] = jnp.zeros_like(y_ref)

    def fwd_step(k, _):
        lk = w_ref[k, :, :]                                # row k of L (M,L)
        lk = jnp.where(rows < k, lk, 0.0)                  # strictly lower
        s = jnp.sum(lk * y_ref[:], axis=0)                 # (L,)
        y_ref[k, :] = (b_ref[k, :] - s) / w_ref[k, k, :]
        return 0

    jax.lax.fori_loop(0, M, fwd_step, 0)

    # backward solve Lᵀ x = y
    x_ref[:] = jnp.zeros_like(x_ref)

    def bwd_step(i, _):
        k = M - 1 - i
        ck = w_ref[:, k, :]                                # column k of L
        ck = jnp.where(rows > k, ck, 0.0)
        s = jnp.sum(ck * x_ref[:], axis=0)
        x_ref[k, :] = (y_ref[k, :] - s) / w_ref[k, k, :]
        return 0

    jax.lax.fori_loop(0, M, bwd_step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve_soa(A: jnp.ndarray, b: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Solve A x = b for batched SPD A (N, M, M), b (N, M) → x (N, M)."""
    N, M, _ = A.shape
    pad = (-N) % LANES
    if pad:
        eye = jnp.broadcast_to(jnp.eye(M, dtype=A.dtype), (pad, M, M))
        A = jnp.concatenate([A, eye], 0)
        b = jnp.concatenate([b, jnp.zeros((pad, M), b.dtype)], 0)
    Nf = A.shape[0]
    At = jnp.moveaxis(A, 0, -1)                            # (M,M,Nf)
    bt = jnp.moveaxis(b, 0, -1)                            # (M,Nf)

    grid = (Nf // LANES,)
    x = pl.pallas_call(
        _chol_solve_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, M, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Nf), A.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, M, LANES), A.dtype),
            pltpu.VMEM((M, LANES), A.dtype),
        ],
        interpret=interpret,
    )(At, bt)
    x = jnp.moveaxis(x, -1, 0)                             # (Nf,M)
    return x[:N]


def backend_supports_pallas() -> bool:
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in plat or plat == "axon"
