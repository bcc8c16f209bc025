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


# EnvState fields that are NOT per-env even though they live in the env
# state: the rng key, the global DR clock, and the per-MOTION hard-negative
# sampling bookkeeping (whose leading dim is the motion count — which can
# collide with num_envs, which is exactly why sharding is decided by FIELD
# PATH here, never by leading-dim sniffing).
REPLICATED_ENV_STATE_FIELDS = frozenset({
    "rng", "dr_clock",
    "motion_weights", "motion_sampled", "motion_term", "motion_succ",
    # getup curriculum scalars (traced state, envs/getup.py:40-46)
    "fall_init_prob", "recovery_episode_prob",
})


def _path_names(path) -> list:
    out = []
    for k in path:
        if hasattr(k, "name"):
            out.append(k.name)
        elif hasattr(k, "key"):
            out.append(k.key)
    return out


def shard_env_axis(tree: Any, mesh: Mesh, num_envs: int,
                   axis: str = "env") -> Any:
    """Explicit-spec placement: leaves inside an `env_state` subtree (or an
    EnvState passed as the root) are sharded on the env axis — except the
    enumerated non-env fields (REPLICATED_ENV_STATE_FIELDS) — and everything
    else (params, optimizer, norms, replay buffers, demo pools) replicates.

    Placement is decided by pytree FIELD PATH, not by array shape: a replay
    buffer or motion table whose leading dim happens to equal num_envs must
    still replicate. A leaf selected for env sharding whose leading dim is
    NOT num_envs is a structural error and raises.

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
    # an EnvState passed directly (duck-typed) roots the env subtree at []
    root_is_env_state = hasattr(tree, "physics") and hasattr(tree,
                                                            "amp_obs_hist")

    def place(path, leaf):
        names = _path_names(path)
        if root_is_env_state:
            env_rel = names
        elif "env_state" in names:
            env_rel = names[names.index("env_state") + 1:]
        else:
            env_rel = None
        if env_rel is not None and env_rel and \
                env_rel[0] not in REPLICATED_ENV_STATE_FIELDS:
            if getattr(leaf, "ndim", 0) < 1 or leaf.shape[0] != num_envs:
                raise ValueError(
                    f"env_state field {'.'.join(names)} has shape "
                    f"{getattr(leaf, 'shape', ())}, expected leading dim "
                    f"num_envs={num_envs}; if this field is not per-env, "
                    f"add it to REPLICATED_ENV_STATE_FIELDS")
            return jax.device_put(leaf, env_sharding)
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, tree)


def pmean_metrics(metrics: dict, axis: str = "env") -> dict:
    """Average metrics across the mesh inside shard_map-style code (the
    Horovod `average_value` equivalent)."""
    return {k: jax.lax.pmean(v, axis) for k, v in metrics.items()}
