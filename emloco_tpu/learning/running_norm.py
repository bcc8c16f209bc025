"""Running mean/std normalization as pure pytree state.

Counterpart of the reference's RunningMeanStd
(/root/reference/pacer/pacer/utils/running_mean_std.py, incl. freeze semantics
:38-47): parallel Welford updates, usable inside jit; freezing = simply not
calling `update` (no mutable flags needed in a functional design).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class RunningNorm(struct.PyTreeNode):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls, dim: int):
        # explicit dtype → non-weak type, so the first `update` doesn't change
        # the pytree signature and force a one-time jit retrace of the epoch
        return cls(mean=jnp.zeros((dim,)), var=jnp.ones((dim,)),
                   count=jnp.asarray(1e-4, jnp.float32))

    def update(self, batch: jnp.ndarray) -> "RunningNorm":
        batch = batch.reshape(-1, batch.shape[-1])
        b_mean = batch.mean(0)
        b_var = batch.var(0)
        b_count = batch.shape[0]
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta ** 2 * self.count * b_count / tot
        return self.replace(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jnp.ndarray, clip: float = 5.0) -> jnp.ndarray:
        y = (x - self.mean) / jnp.sqrt(self.var + 1e-5)
        return jnp.clip(y, -clip, clip)

    def denormalize(self, y: jnp.ndarray) -> jnp.ndarray:
        return y * jnp.sqrt(self.var + 1e-5) + self.mean
