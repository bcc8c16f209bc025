"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated against 8 virtual CPU devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (remote TPU
# tunnel), which is slow and single-chip; tests validate semantics + sharding
# on a local 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize (ambient environment) registers a remote-TPU PJRT
# plugin and programmatically sets jax_platforms="axon,cpu", which overrides
# the env var — force it back to cpu before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache (same recipe as the CLI, __graft_entry__.py):
# the suite is compile-bound (~20 min cold), and most of it is re-compiling
# identical programs run-to-run. XLA:CPU cache entries are machine-specific,
# which is fine here — the cache lives on the machine running the tests.
# EMLOCO_TEST_NO_CACHE=1 opts out (e.g. after an XLA upgrade).
if os.environ.get("EMLOCO_TEST_NO_CACHE") != "1":
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/emloco_jax_tests"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


import pytest  # noqa: E402

_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_modules(request):
    """Free compiled executables when crossing test modules.

    The suite compiles hundreds of XLA CPU programs in one process; past
    ~85 tests the accumulated compiler state segfaults inside
    backend_compile_and_load (observed twice at the same point). Dropping
    caches at module boundaries keeps the process well under that ceiling
    at the cost of a few intra-module recompiles.
    """
    mod = request.module.__name__
    if _last_module[0] is not None and _last_module[0] != mod:
        import jax
        jax.clear_caches()
    _last_module[0] = mod
    yield
