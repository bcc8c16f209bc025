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
    """a (M,M,L), b (M,L) → x (M,L); w,y scratch.

    M is static, so the factorization unrolls with *static shrinking slices*:
    step k touches only the trailing (M−k, M−k) block instead of a masked
    full-matrix update — 3x fewer VPU flops (Σ(M−k)² = M³/3 vs M³)."""
    M = a_ref.shape[0]
    w_ref[:] = a_ref[:]

    for k in range(M):                       # static unroll
        d = w_ref[k, k, :]                                 # (L,)
        s = jnp.sqrt(jnp.maximum(d, 1e-12))
        w_ref[k, k, :] = s
        if k + 1 < M:
            col = w_ref[k + 1:, k, :] / s[None, :]         # (M-k-1, L)
            w_ref[k + 1:, k, :] = col
            # trailing update on the (M-k-1)² block only
            w_ref[k + 1:, k + 1:, :] = (
                w_ref[k + 1:, k + 1:, :] - col[:, None, :] * col[None, :, :])

    # forward solve L y = b — row k uses only finished columns :k
    y_ref[0, :] = b_ref[0, :] / w_ref[0, 0, :]
    for k in range(1, M):
        s = jnp.sum(w_ref[k, :k, :] * y_ref[:k, :], axis=0)
        y_ref[k, :] = (b_ref[k, :] - s) / w_ref[k, k, :]

    # backward solve Lᵀ x = y — column k below the diagonal
    x_ref[M - 1, :] = y_ref[M - 1, :] / w_ref[M - 1, M - 1, :]
    for k in range(M - 2, -1, -1):
        s = jnp.sum(w_ref[k + 1:, k, :] * x_ref[k + 1:, :], axis=0)
        x_ref[k, :] = (y_ref[k, :] - s) / w_ref[k, k, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve_soa_t(At: jnp.ndarray, bt: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Env-last variant: A (M, M, N), b (M, N) → x (M, N). Preferred in the
    hot path — the producer contraction writes (M, M, N) directly, so no
    (N, M, M) ↔ (M, M, N) relayout (a ~1.6 ms pathological transpose at
    4096 envs) ever happens. Padded lanes solve the zero system → x = 0."""
    M = At.shape[0]
    N = At.shape[-1]
    pad = (-N) % LANES
    if pad:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, pad)))
        bt = jnp.pad(bt, ((0, 0), (0, pad)))
    Nf = At.shape[-1]

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
        out_shape=jax.ShapeDtypeStruct((M, Nf), At.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, M, LANES), At.dtype),
            pltpu.VMEM((M, LANES), At.dtype),
        ],
        interpret=interpret,
    )(At, bt)
    return x[:, :N]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve_soa(A: jnp.ndarray, b: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Solve A x = b for batched SPD A (N, M, M), b (N, M) → x (N, M)."""
    At = jnp.moveaxis(A, 0, -1)                            # (M,M,N)
    bt = jnp.moveaxis(b, 0, -1)                            # (M,N)
    return cholesky_solve_soa_t(At, bt, interpret=interpret).T


def backend_supports_pallas() -> bool:
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in plat or plat == "axon"
