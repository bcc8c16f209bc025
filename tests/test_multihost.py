"""Multi-host (multi-process) distributed bring-up.

The reference's multi-GPU path is Horovod rank setup + NCCL allreduce
(pacer/pacer/run.py:57-72, amp_continuous.py:268-301). The TPU-native
equivalent is `jax.distributed.initialize` + one global mesh; this test
exercises exactly that with 2 PROCESSES × 4 virtual CPU devices each:
every process holds only its local devices, the env axis spans the global
8-device mesh, and the train epoch's gradient/metric reductions become
cross-process collectives (gloo on CPU, ICI on real chips).

This is the piece the in-process 8-device tests (test_parallel.py) cannot
cover: device_put/make_array with non-addressable shards, cross-process
psum, and coordinator hand-shake through emloco_tpu.parallel.mesh.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emloco_tpu.parallel.mesh import distributed_init

distributed_init(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 8

# global mesh over BOTH processes' devices
mesh = Mesh(np.array(jax.devices()), ("env",))

# 1. raw cross-process collective: global sum over an env-sharded array
num_envs = 16
sharding = NamedSharding(mesh, P("env"))
data = np.arange(num_envs, dtype=np.float32)
garr = jax.make_array_from_callback((num_envs,), sharding,
                                    lambda idx: data[idx])
total = jax.jit(lambda x: x.sum(),
                out_shardings=NamedSharding(mesh, P()))(garr)
np.testing.assert_allclose(float(total), data.sum())

# 2. the actual train epoch over the global mesh (the reference's Horovod
#    allreduce path, folded into jit by XLA)
import __graft_entry__ as g
env, agent = g._build(num_envs=num_envs, sensor_res=8, amp_steps=3)
ts = agent.init(jax.random.PRNGKey(0))

def mk(leaf):
    leaf = np.asarray(leaf)
    if leaf.ndim >= 1 and leaf.shape[0] == num_envs:
        sh = NamedSharding(mesh, P("env"))
    else:
        sh = NamedSharding(mesh, P())
    return jax.make_array_from_callback(leaf.shape, sh,
                                        lambda idx: leaf[idx])

ts = jax.tree.map(mk, ts)
with mesh:
    ts, metrics = agent.train_epoch(ts)
    jax.block_until_ready(metrics)
for k, v in metrics.items():
    assert np.isfinite(float(v)), f"{k} not finite under multihost sharding"
print(f"proc{pid}: ok", flush=True)
"""


@pytest.mark.timeout(900)
def test_two_process_four_device_bringup(tmp_path):
    wf = tmp_path / "worker.py"
    wf.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if not k.startswith("JAX_")}
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # no persistent compile cache: the workers race on it and XLA:CPU AOT
    # entries are machine-specific anyway (see __graft_entry__)
    env["_EMLOCO_DRYRUN_CHILD"] = "1"

    procs = [subprocess.Popen([sys.executable, str(wf), str(i), str(port)],
                              env=env, cwd=REPO, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{out[-3000:]}")
        assert f"proc{i}: ok" in out
