from .mesh import make_mesh, shard_env_axis, distributed_init  # noqa: F401
