"""Native (C++) host-runtime components with ctypes bindings.

The compute path is jax/XLA (the TPU program); the host runtime around it —
terrain preparation and bulk data ingestion — is C++ where the reference's
runtime is native (Isaac Gym's .so does terrain cooking + asset IO). Builds
lazily with g++ on first use and caches the shared library; every entry point
has a pure-python fallback so the package works without a toolchain.
"""
from .build import load_native  # noqa: F401
from .terrain import fast_walkable_mask, fast_spawn_table  # noqa: F401
from .ndjson import read_ndjson_fast  # noqa: F401
