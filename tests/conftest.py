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
