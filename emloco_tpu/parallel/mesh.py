"""Device-mesh / sharding helpers — the multi-chip story.

Replaces the reference's Horovod/NCCL plumbing (run.py:57-72 rank setup,
amp_continuous.py:268-301 KL averaging, :430-446 optimizer sync,
common_agent.py:179-180 stat sync) with the JAX-native recipe: one
`jax.sharding.Mesh`, env-axis data parallelism annotated with NamedSharding,
gradient/statistic reductions emitted by XLA as ICI collectives. The
workload's only scale axis is the env batch (SURVEY.md §2.3) — models are
MLPs/d≤2048 transformers, so no tensor/pipeline parallelism is warranted;
multi-slice DCN would only enter above one-pod scale.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up (jax.distributed). Safe no-op single-host."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_env_axis(tree: Any, mesh: Mesh, num_envs: int,
                   axis: str = "env") -> Any:
    """Place every leaf whose leading dim == num_envs on the env axis;
    replicate everything else (params, optimizer, norms, buffers).

    num_envs must divide evenly over the mesh — uneven env shards would
    silently change per-device batch shapes (and XLA's implicit padding
    semantics differ between device_put and jit outputs), so reject early
    with a clear message instead."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    if num_envs % n_dev != 0:
        raise ValueError(
            f"num_envs={num_envs} is not divisible by the {n_dev}-device "
            f"mesh; choose an env count that is a multiple of the device "
            f"count (e.g. {num_envs - num_envs % n_dev} or "
            f"{num_envs + n_dev - num_envs % n_dev})")
    env_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(leaf):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1 \
                and leaf.shape[0] == num_envs:
            return jax.device_put(leaf, env_sharding)
        return jax.device_put(leaf, rep)

    return jax.tree.map(place, tree)


def pmean_metrics(metrics: dict, axis: str = "env") -> dict:
    """Average metrics across the mesh inside shard_map-style code (the
    Horovod `average_value` equivalent)."""
    return {k: jax.lax.pmean(v, axis) for k, v in metrics.items()}
