"""Does emitting the merged rows TRANSPOSED kill XLA's pre-dot operand
copy? The production trace shows the Gram dot wants its bf16 operand in
{1,2,0} (rows minor) and XLA inserts a 0.5 ms relayout copy after the
{0,1,2} row build. Here both orientations are produced inside a scanned
program by one dot against a static (mimicking _build_rows_merged), then
contracted to the same (75, 75, N) LHS:

  A  S  = einsum("nkj,kjmc->nmc", x, T);  At = einsum("nmc,nmd->cdn", S, S)
  B  St = einsum("nkj,kjcm->ncm", x, T);  At = einsum("ncm,ndm->cdn", St, St)

Run on chip:  python scripts/lhs_layout_probe.py
CPU check:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/lhs_layout_probe.py --check
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

CHECK = "--check" in sys.argv
N = 64 if CHECK else 4096
M, C, K = 256, 75, 48
ITERS = 4 if CHECK else 32

rng = np.random.RandomState(0)
T_nmc = jnp.asarray(rng.randn(K, 3, M, C) * 0.1, jnp.float32)
T_ncm = jnp.swapaxes(T_nmc, 2, 3)                         # (K, 3, C, M)
x0 = jnp.asarray(rng.randn(N, K, 3), jnp.float32)


def variant_a(x):
    S = jnp.einsum("nkj,kjmc->nmc", x, T_nmc,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.einsum("nmc,nmd->cdn", S, S,
                      preferred_element_type=jnp.float32)


def variant_b(x):
    St = jnp.einsum("nkj,kjcm->ncm", x, T_ncm,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.einsum("ncm,ndm->cdn", St, St,
                      preferred_element_type=jnp.float32)


def scanned(variant):
    def run(x):
        def body(c, _):
            At = variant(c)
            return c + 1e-30 * At[0, 0, :, None, None], None
        return jax.lax.scan(body, x, None, length=ITERS)[0]
    return jax.jit(run)


def timed(fn, x, reps=3):
    out = jax.block_until_ready(fn(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main():
    ref = np.asarray(variant_a(x0[:4]))
    alt = np.asarray(variant_b(x0[:4]))
    err = np.abs(ref - alt).max() / max(np.abs(ref).max(), 1e-9)
    print(json.dumps({"check_rel_err": round(float(err), 6)}), flush=True)
    for name, v in (("rows_major_nmc", variant_a), ("rows_minor_ncm",
                                                    variant_b)):
        ms = timed(scanned(v), x0)
        print(json.dumps({"variant": name, "ms_per_iter": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
