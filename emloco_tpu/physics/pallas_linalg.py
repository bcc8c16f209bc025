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


# ---------------------------------------------------------------------------
# Block-arrow (supernodal) variant for articulated trees
# ---------------------------------------------------------------------------
#
# A reduced-coordinate mass/implicit matrix has M[i,j] ≠ 0 only when DoFs i
# and j lie on a common root-to-leaf path. For the humanoid (5 chains —
# 2 legs, 2 arms, neck — hanging off a trunk+root), ordering the DoFs
# [limb₁ … limb₅ | trunk+root] makes the matrix block-arrow: dense limb
# diagonal blocks, couplings only into the trailing shared block, zero
# between limbs. A Cholesky in that order has NO fill-in outside the
# pattern, so each column's trailing update touches (rest-of-limb + shared)
# rows instead of all remaining rows: Σ ≈ 28k lane-FMAs vs 137k dense at
# M=75 — ~5× less VPU work, same numerics (exact, not approximate).

def _permute_matrix_in(w_ref, a_ref, chunks):
    """2-D chunk moves old→new: w = P·a·Pᵀ for the block permutation."""
    roff = 0
    for rlo, rhi in chunks:
        coff = 0
        for clo, chi in chunks:
            w_ref[roff:roff + rhi - rlo, coff:coff + chi - clo, :] = \
                a_ref[rlo:rhi, clo:chi, :]
            coff += chi - clo
        roff += rhi - rlo


def _permute_vec_in(y_ref, b_ref, chunks):
    off = 0
    for lo, hi in chunks:
        y_ref[off:off + hi - lo, :] = b_ref[lo:hi, :]
        off += hi - lo


def _permute_vec_out(x_ref, z_ref, chunks):
    off = 0
    for lo, hi in chunks:
        x_ref[lo:hi, :] = z_ref[off:off + hi - lo, :]
        off += hi - lo


def _factor_body(w_ref, limbs, s_lo):
    """In-place block-arrow Cholesky of the permuted matrix in w_ref."""
    M = w_ref.shape[0]

    def fcol(k, hi, couple):
        s = jnp.sqrt(jnp.maximum(w_ref[k, k, :], 1e-12))
        w_ref[k, k, :] = s
        if k + 1 < hi:
            col_g = w_ref[k + 1:hi, k, :] / s[None, :]
            w_ref[k + 1:hi, k, :] = col_g
        if couple:
            col_s = w_ref[s_lo:M, k, :] / s[None, :]
            w_ref[s_lo:M, k, :] = col_s
        if k + 1 < hi:
            w_ref[k + 1:hi, k + 1:hi, :] = (
                w_ref[k + 1:hi, k + 1:hi, :]
                - col_g[:, None, :] * col_g[None, :, :])
            if couple:
                w_ref[s_lo:M, k + 1:hi, :] = (
                    w_ref[s_lo:M, k + 1:hi, :]
                    - col_s[:, None, :] * col_g[None, :, :])
        if couple:
            w_ref[s_lo:M, s_lo:M, :] = (
                w_ref[s_lo:M, s_lo:M, :]
                - col_s[:, None, :] * col_s[None, :, :])

    for lo, hi in limbs:
        for k in range(lo, hi):
            fcol(k, hi, couple=True)
    for k in range(s_lo, M):
        fcol(k, M, couple=False)


def _triangular_solves(w_ref, y_ref, z_ref, limbs, s_lo):
    """Forward (in y_ref) then backward (into z_ref) sparse solves."""
    M = w_ref.shape[0]
    for lo, hi in limbs:
        for k in range(lo, hi):
            yk = y_ref[k, :] / w_ref[k, k, :]
            y_ref[k, :] = yk
            if k + 1 < hi:
                y_ref[k + 1:hi, :] = (y_ref[k + 1:hi, :]
                                      - w_ref[k + 1:hi, k, :] * yk[None, :])
            y_ref[s_lo:M, :] = (y_ref[s_lo:M, :]
                                - w_ref[s_lo:M, k, :] * yk[None, :])
    for k in range(s_lo, M):
        yk = y_ref[k, :] / w_ref[k, k, :]
        y_ref[k, :] = yk
        if k + 1 < M:
            y_ref[k + 1:M, :] = (y_ref[k + 1:M, :]
                                 - w_ref[k + 1:M, k, :] * yk[None, :])

    z_ref[M - 1, :] = y_ref[M - 1, :] / w_ref[M - 1, M - 1, :]
    for k in range(M - 2, s_lo - 1, -1):
        acc = jnp.sum(w_ref[k + 1:M, k, :] * z_ref[k + 1:M, :], axis=0)
        z_ref[k, :] = (y_ref[k, :] - acc) / w_ref[k, k, :]
    for lo, hi in limbs:
        for k in range(hi - 1, lo - 1, -1):
            acc = jnp.sum(w_ref[s_lo:M, k, :] * z_ref[s_lo:M, :], axis=0)
            if k + 1 < hi:
                acc = acc + jnp.sum(w_ref[k + 1:hi, k, :]
                                    * z_ref[k + 1:hi, :], axis=0)
            z_ref[k, :] = (y_ref[k, :] - acc) / w_ref[k, k, :]


def _permute_matrix_in_bm(w_ref, a_ref, chunks):
    """Batch-major variant: a_ref block is (LANES, M, M) — XLA's native
    batched-dot output layout — and the permute FUSES the env-last
    transpose into the chunk moves (VMEM relayout instead of an HBM
    round-trip through a materialized (M, M, N) array)."""
    roff = 0
    for rlo, rhi in chunks:
        coff = 0
        for clo, chi in chunks:
            w_ref[roff:roff + rhi - rlo, coff:coff + chi - clo, :] = \
                jnp.transpose(a_ref[:, rlo:rhi, clo:chi], (1, 2, 0))
            coff += chi - clo
        roff += rhi - rlo


def _permute_vec_in_bm(y_ref, b_ref, chunks):
    off = 0
    for lo, hi in chunks:
        y_ref[off:off + hi - lo, :] = b_ref[:, lo:hi].T
        off += hi - lo


def _permute_vec_out_bm(x_ref, z_ref, chunks):
    off = 0
    for lo, hi in chunks:
        x_ref[:, lo:hi] = z_ref[off:off + hi - lo, :].T
        off += hi - lo


def _chol_solve_blocked_kernel(a_ref, b_ref, x_ref, w_ref, y_ref, z_ref,
                               *, chunks, limbs, s_lo):
    """Permuted block-arrow Cholesky solve (fused factor+solve). chunks:
    old-index ranges listed in new order (the permutation, as contiguous
    block moves); limbs: (lo, hi) dense diagonal blocks in NEW order; s_lo:
    start of the trailing shared block (runs to M)."""
    _permute_matrix_in(w_ref, a_ref, chunks)
    _permute_vec_in(y_ref, b_ref, chunks)
    _factor_body(w_ref, limbs, s_lo)
    _triangular_solves(w_ref, y_ref, z_ref, limbs, s_lo)
    _permute_vec_out(x_ref, z_ref, chunks)


def _chol_factor_blocked_kernel(a_ref, l_ref, w_ref, *, chunks, limbs, s_lo):
    """Factor only: writes L in PERMUTED order (consumed by the resolve
    kernel, which permutes rhs/solution itself — L never round-trips the
    permutation)."""
    _permute_matrix_in(w_ref, a_ref, chunks)
    _factor_body(w_ref, limbs, s_lo)
    l_ref[:] = w_ref[:]


def _chol_resolve_blocked_kernel(l_ref, b_ref, x_ref, y_ref, z_ref,
                                 *, chunks, limbs, s_lo):
    """Solve with a precomputed permuted factor (two triangular solves)."""
    _permute_vec_in(y_ref, b_ref, chunks)
    _triangular_solves(l_ref, y_ref, z_ref, limbs, s_lo)
    _permute_vec_out(x_ref, z_ref, chunks)


@functools.partial(jax.jit,
                   static_argnames=("chunks", "limbs", "s_lo", "interpret"))
def cholesky_solve_blocked_t(At: jnp.ndarray, bt: jnp.ndarray,
                             chunks, limbs, s_lo: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Block-arrow SPD solve, env-last: A (M, M, N), b (M, N) → x (M, N).

    REQUIRES A to be zero outside the block-arrow pattern induced by
    (chunks, limbs, s_lo) — true by construction for articulated-tree
    mass/implicit matrices ordered limbs-first (the factorization then has
    zero fill-in and the result is exact; a dense A violating the pattern
    gives a silently wrong answer). chunks/limbs/s_lo as in the kernel."""
    M = At.shape[0]
    N = At.shape[-1]
    pad = (-N) % LANES
    if pad:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, pad)))
        bt = jnp.pad(bt, ((0, 0), (0, pad)))
    Nf = At.shape[-1]

    kernel = functools.partial(_chol_solve_blocked_kernel,
                               chunks=tuple(chunks), limbs=tuple(limbs),
                               s_lo=s_lo)
    x = pl.pallas_call(
        kernel,
        grid=(Nf // LANES,),
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
            pltpu.VMEM((M, LANES), At.dtype),
        ],
        interpret=interpret,
    )(At, bt)
    return x[:, :N]


@functools.partial(jax.jit,
                   static_argnames=("chunks", "limbs", "s_lo", "interpret"))
def cholesky_factor_blocked_t(At: jnp.ndarray, chunks, limbs, s_lo: int,
                              interpret: bool = False) -> jnp.ndarray:
    """Factor A (M, M, N) → permuted-order L (M, M, N). Same block-arrow
    requirements as cholesky_solve_blocked_t. Pair with
    cholesky_resolve_blocked_t to amortize one factorization over several
    solves (TGS-style frozen-LHS substeps)."""
    M = At.shape[0]
    N = At.shape[-1]
    pad = (-N) % LANES
    if pad:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, pad)))
    Nf = At.shape[-1]
    kernel = functools.partial(_chol_factor_blocked_kernel,
                               chunks=tuple(chunks), limbs=tuple(limbs),
                               s_lo=s_lo)
    L = pl.pallas_call(
        kernel,
        grid=(Nf // LANES,),
        in_specs=[pl.BlockSpec((M, M, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, M, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, M, Nf), At.dtype),
        scratch_shapes=[pltpu.VMEM((M, M, LANES), At.dtype)],
        interpret=interpret,
    )(At)
    return L[:, :, :N]


@functools.partial(jax.jit,
                   static_argnames=("chunks", "limbs", "s_lo", "interpret"))
def cholesky_resolve_blocked_t(L: jnp.ndarray, bt: jnp.ndarray,
                               chunks, limbs, s_lo: int,
                               interpret: bool = False) -> jnp.ndarray:
    """Solve with a precomputed permuted factor from
    cholesky_factor_blocked_t: L (M, M, N), b (M, N) → x (M, N)."""
    M = L.shape[0]
    N = L.shape[-1]
    pad = (-N) % LANES
    if pad:
        L = jnp.pad(L, ((0, 0), (0, 0), (0, pad)))
        bt = jnp.pad(bt, ((0, 0), (0, pad)))
    Nf = L.shape[-1]
    kernel = functools.partial(_chol_resolve_blocked_kernel,
                               chunks=tuple(chunks), limbs=tuple(limbs),
                               s_lo=s_lo)
    x = pl.pallas_call(
        kernel,
        grid=(Nf // LANES,),
        in_specs=[
            pl.BlockSpec((M, M, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Nf), L.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, LANES), L.dtype),
            pltpu.VMEM((M, LANES), L.dtype),
        ],
        interpret=interpret,
    )(L, bt)
    return x[:, :N]


def _chol_solve_blocked_bm_kernel(a_ref, b_ref, x_ref, w_ref, y_ref, z_ref,
                                  *, chunks, limbs, s_lo):
    """Batch-major fused solve: A (LANES, M, M), b (LANES, M) blocks; the
    env-last relayout the solve math needs happens inside the permutes."""
    _permute_matrix_in_bm(w_ref, a_ref, chunks)
    _permute_vec_in_bm(y_ref, b_ref, chunks)
    _factor_body(w_ref, limbs, s_lo)
    _triangular_solves(w_ref, y_ref, z_ref, limbs, s_lo)
    _permute_vec_out_bm(x_ref, z_ref, chunks)


def _chol_factor_blocked_bm_kernel(a_ref, l_ref, w_ref, *, chunks, limbs,
                                   s_lo):
    """Batch-major factor: A block (LANES, M, M) in; L stays env-last
    (M, M, LANES) — it is produced and consumed only by these kernels."""
    _permute_matrix_in_bm(w_ref, a_ref, chunks)
    _factor_body(w_ref, limbs, s_lo)
    l_ref[:] = w_ref[:]


def _chol_resolve_blocked_bm_kernel(l_ref, b_ref, x_ref, y_ref, z_ref,
                                    *, chunks, limbs, s_lo):
    """Batch-major resolve: permuted env-last L, batch-major b/x blocks."""
    _permute_vec_in_bm(y_ref, b_ref, chunks)
    _triangular_solves(l_ref, y_ref, z_ref, limbs, s_lo)
    _permute_vec_out_bm(x_ref, z_ref, chunks)


@functools.partial(jax.jit,
                   static_argnames=("chunks", "limbs", "s_lo", "interpret"))
def cholesky_solve_blocked(A: jnp.ndarray, b: jnp.ndarray,
                           chunks, limbs, s_lo: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Batch-major block-arrow SPD solve: A (N, M, M), b (N, M) → x (N, M).

    Same block-arrow requirements as cholesky_solve_blocked_t. Takes the
    batched-dot NATIVE layouts (XLA emits (n, c, d) from "nmc,nmd->ncd"
    without a relayout) and fuses the env-last transpose the solve math
    needs into the kernel's in-VMEM permute — the (M, M, N) relayout never
    round-trips HBM."""
    M = A.shape[-1]
    N = A.shape[0]
    pad = (-N) % LANES
    if pad:
        A = jnp.pad(A, ((0, pad), (0, 0), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    Nf = A.shape[0]
    kernel = functools.partial(_chol_solve_blocked_bm_kernel,
                               chunks=tuple(chunks), limbs=tuple(limbs),
                               s_lo=s_lo)
    x = pl.pallas_call(
        kernel,
        grid=(Nf // LANES,),
        in_specs=[
            pl.BlockSpec((LANES, M, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nf, M), A.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, M, LANES), A.dtype),
            pltpu.VMEM((M, LANES), A.dtype),
            pltpu.VMEM((M, LANES), A.dtype),
        ],
        interpret=interpret,
    )(A, b)
    return x[:N]


@functools.partial(jax.jit,
                   static_argnames=("chunks", "limbs", "s_lo", "interpret"))
def cholesky_factor_blocked(A: jnp.ndarray, chunks, limbs, s_lo: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Batch-major factor: A (N, M, M) → permuted env-last L (M, M, N)
    for cholesky_resolve_blocked."""
    M = A.shape[-1]
    N = A.shape[0]
    pad = (-N) % LANES
    if pad:
        A = jnp.pad(A, ((0, pad), (0, 0), (0, 0)))
    Nf = A.shape[0]
    kernel = functools.partial(_chol_factor_blocked_bm_kernel,
                               chunks=tuple(chunks), limbs=tuple(limbs),
                               s_lo=s_lo)
    L = pl.pallas_call(
        kernel,
        grid=(Nf // LANES,),
        in_specs=[pl.BlockSpec((LANES, M, M), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, M, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, M, Nf), A.dtype),
        scratch_shapes=[pltpu.VMEM((M, M, LANES), A.dtype)],
        interpret=interpret,
    )(A)
    return L[:, :, :N]


@functools.partial(jax.jit,
                   static_argnames=("chunks", "limbs", "s_lo", "interpret"))
def cholesky_resolve_blocked(L: jnp.ndarray, b: jnp.ndarray,
                             chunks, limbs, s_lo: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Batch-major resolve with a cholesky_factor_blocked factor:
    L (M, M, N), b (N, M) → x (N, M)."""
    M = L.shape[0]
    N = L.shape[-1]
    pad = (-N) % LANES
    if pad:
        L = jnp.pad(L, ((0, 0), (0, 0), (0, pad)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    Nf = L.shape[-1]
    kernel = functools.partial(_chol_resolve_blocked_bm_kernel,
                               chunks=tuple(chunks), limbs=tuple(limbs),
                               s_lo=s_lo)
    x = pl.pallas_call(
        kernel,
        grid=(Nf // LANES,),
        in_specs=[
            pl.BlockSpec((M, M, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nf, M), L.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, LANES), L.dtype),
            pltpu.VMEM((M, LANES), L.dtype),
        ],
        interpret=interpret,
    )(L, b)
    return x[:N]


def backend_supports_pallas() -> bool:
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in plat or plat == "axon"
