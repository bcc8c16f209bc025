"""Microbenchmark of merged-LHS Gram strategies at PRODUCTION size
(N=4096 envs, M=304 rows, C=75) — standalone, production-shaped operands
(CLAUDE.md: microbenches lie at small sizes; this one matches the in-situ
operand shapes exactly).

Variants:
  einsum_envlast   production default: "nmc,nmd->cdn" + diag (XLA)
  einsum_bm        "nmc,nmd->ncd" + diag (XLA native batched-dot layout)
  kernel_at_b      gram_diag as committed: per-env dot_general contracting
                   sublanes (AᵀB) — Mosaic inserts a VPU transpose per env
  kernel_dual      dual-layout kernel: lhs Rt (C, M) arrives pre-transposed,
                   per-env dot is the native AB form (lane × sublane)
  relayout         to_env_last on the (N, 75, 75) output alone
  xla_transpose    jnp.moveaxis relayout for comparison

Run on chip:  python scripts/gram_kernel_probe.py
CPU check:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/gram_kernel_probe.py --check
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/emloco_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from emloco_tpu.physics.pallas_linalg import gram_diag, to_env_last

CHECK = "--check" in sys.argv
N = 64 if CHECK else 4096
M, C = 304, 75
ITERS = 2 if CHECK else 16
INTERP = CHECK


def _dual_kernel(rt_ref, r_ref, d_ref, o_ref, *, envs):
    """lhs Rt (envs, C, M) already (w∘R)ᵀ; rhs R (envs, M, C): the native
    AB dot — contraction lhs lane × rhs sublane, no Mosaic transpose."""
    Cc = r_ref.shape[-1]
    eye = jnp.eye(Cc, dtype=jnp.float32)
    for e in range(envs):
        acc = jax.lax.dot_general(rt_ref[e], r_ref[e],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[e] = acc + eye * d_ref[e][None, :]


@functools.partial(jax.jit, static_argnames=("block_envs", "interpret"))
def gram_dual(Rt, R, diag, block_envs=8, interpret=False):
    Nn = R.shape[0]
    kernel = functools.partial(_dual_kernel, envs=block_envs)
    return pl.pallas_call(
        kernel,
        grid=(Nn // block_envs,),
        in_specs=[
            pl.BlockSpec((block_envs, C, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_envs, M, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_envs, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_envs, C, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nn, C, C), jnp.float32),
        interpret=interpret,
    )(Rt, R, diag)


def _dual_batched_kernel(rt_ref, r_ref, d_ref, o_ref):
    """One batched dot_general per grid step (batch dim = envs): gives
    Mosaic the whole block to pipeline instead of a Python loop of
    per-env dots."""
    Cc = r_ref.shape[-1]
    eye = jnp.eye(Cc, dtype=jnp.float32)
    acc = jax.lax.dot_general(rt_ref[:], r_ref[:],
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[:] = acc + eye[None] * d_ref[:][:, None, :]


@functools.partial(jax.jit, static_argnames=("block_envs", "interpret"))
def gram_dual_batched(Rt, R, diag, block_envs=8, interpret=False):
    Nn = R.shape[0]
    return pl.pallas_call(
        _dual_batched_kernel,
        grid=(Nn // block_envs,),
        in_specs=[
            pl.BlockSpec((block_envs, C, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_envs, M, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_envs, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_envs, C, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nn, C, C), jnp.float32),
        interpret=interpret,
    )(Rt, R, diag)


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3, out


def main():
    rng = np.random.RandomState(0)
    R = jnp.asarray(rng.randn(N, M, C), jnp.bfloat16)
    w = jnp.asarray(rng.rand(N, M), jnp.bfloat16)
    d = jnp.asarray(rng.rand(N, C), jnp.float32)
    wR = (w[..., None] * R)
    Rt = jnp.swapaxes(wR, 1, 2)                           # (N, C, M) bf16
    eye = jnp.eye(C, dtype=jnp.float32)

    @jax.jit
    def einsum_envlast(R, w, d):
        At = jnp.einsum("nmc,nmd->cdn", w[..., None] * R, R,
                        preferred_element_type=jnp.float32)
        return At + eye[:, :, None] * d.T[:, None, :]

    @jax.jit
    def einsum_bm(R, w, d):
        At = jnp.einsum("nmc,nmd->ncd", w[..., None] * R, R,
                        preferred_element_type=jnp.float32)
        return At + eye[None] * d[:, :, None]

    @jax.jit
    def build_rt(R, w):
        return jnp.swapaxes(w[..., None] * R, 1, 2)

    out = {}
    out["einsum_envlast"], ref_el = timed(einsum_envlast, R, w, d)
    out["einsum_bm"], ref_bm = timed(einsum_bm, R, w, d)
    out["kernel_at_b"], o1 = timed(
        lambda: gram_diag(R, w, d, interpret=INTERP))
    out["kernel_dual"], o2 = timed(
        lambda: gram_dual(Rt, R, d, interpret=INTERP))
    out["kernel_dual_batched8"], o3 = timed(
        lambda: gram_dual_batched(Rt, R, d, interpret=INTERP))
    out["kernel_dual_batched32"], _ = timed(
        lambda: gram_dual_batched(Rt, R, d, block_envs=32,
                                  interpret=INTERP))
    out["kernel_at_b32"], _ = timed(
        lambda: gram_diag(R, w, d, block_envs=32, interpret=INTERP))
    out["build_rt_xla"], _ = timed(build_rt, R, w)
    out["relayout_pallas"], _ = timed(
        lambda: to_env_last(ref_bm, interpret=INTERP))
    out["xla_transpose"], _ = timed(
        jax.jit(lambda a: jnp.moveaxis(a, 0, -1) + 0.0), ref_bm)
    for k, v in out.items():
        print(json.dumps({"variant": k, "ms": round(v, 3)}), flush=True)
    for name, o in (("kernel_at_b", o1), ("kernel_dual", o2)):
        err = float(jnp.abs(o - ref_bm).max())
        print(json.dumps({"variant": name, "max_abs_err_vs_einsum":
                          round(err, 5)}), flush=True)


if __name__ == "__main__":
    main()
