"""In-situ probe of the heightmap-sensor gather (round-5 epoch trace:
fusion.2503, terrain.py:107 — min2_tex[x0, y0] — runs as a 16.6 ms/step
"custom fusion" with S(1) operands at 1,600 envs on the 659x659 train
table, i.e. ~10 ns/lookup scalar-path, 532 ms of the 1.05 s epoch. The
4,096-env bench config (num_tiles=2, small table) gets a vectorized
kernel).

Methodology per CLAUDE.md: scanned large-program timings only — each
variant runs inside a 32-iteration lax.scan whose indices depend on the
carry (no hoisting/DCE), timed after a warmup call.

Variants:
  ix2d   baseline advanced indexing tex[x0, y0]
  flat   jnp.take(tex.ravel(), x0*W + y0)
  flatp  ravel-take on a row-padded (H, 1024) table (128-lane row stride)
  bf16   flat take on a bf16 table
  onehotrow  h[x0] row-gather then lane select -- expected slow, bounds it

Run on chip: python scripts/sensor_gather_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def run(envs, side, steps=32, points=1024):
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(side, side).astype(np.float32))
    Wp = 1 << int(np.ceil(np.log2(side)))
    texp = jnp.zeros((side, Wp), jnp.float32).at[:, :side].set(tex)
    tex16 = tex.astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.randint(0, side - 1, (envs, points)), jnp.int32)
    y0 = jnp.asarray(rng.randint(0, side - 1, (envs, points)), jnp.int32)

    def scan_over(gather):
        @jax.jit
        def f(x0, y0):
            def body(c, _):
                xs = (x0 + c) % (side - 1)
                ys = (y0 + c) % (side - 1)
                h = gather(xs, ys)
                return c + (h.sum() > 0).astype(jnp.int32), ()
            return jax.lax.scan(body, jnp.int32(0), None, length=steps)[0]
        return f

    variants = {
        "ix2d": lambda xs, ys: tex[xs, ys],
        "flat": lambda xs, ys: jnp.take(tex.ravel(), xs * side + ys),
        "flatp": lambda xs, ys: jnp.take(texp.ravel(), xs * Wp + ys),
        "bf16": lambda xs, ys: jnp.take(
            tex16.ravel(), xs * side + ys).astype(jnp.float32),
    }
    for name, g in variants.items():
        dt = timed(scan_over(g), x0, y0)
        print(json.dumps(dict(envs=envs, side=side, variant=name,
                              ms_per_step=round(dt / steps * 1e3, 3))),
              flush=True)


if __name__ == "__main__":
    for envs in (1600, 4096):
        for side in (165, 659):
            run(envs, side)
