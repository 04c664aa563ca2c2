"""Multi-host smoke test (SURVEY.md section 4 class 4, 'multi-host:
jax.distributed with multiple local processes').

Spawns two local processes that jax.distributed.initialize against each
other on the CPU backend, build a shared 2-device mesh over the combined
process devices, and run one psum -- validating the DCN init path that
ShardedBank/ShardedScanner ride on a real pod slice. Skipped gracefully
if the runtime refuses local multi-process init."""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np
devs = jax.devices()
assert len(devs) == nproc, devs
mesh = Mesh(np.array(devs), ("time",))
x = jnp.arange(8.0)


def f(a):
    return jax.lax.psum(a, "time")


y = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("time"), out_specs=P("time"),
                          check_vma=False))(
    jax.device_put(x, NamedSharding(mesh, P("time"))))
local = np.asarray(jax.device_get([s.data for s in y.addressable_shards][0]))
print("OK", pid, local.tolist(), flush=True)
"""


@pytest.mark.skipif(os.environ.get("TPUDSP_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_distributed_psum(tmp_path):
    port = "52345"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("multi-process init timed out in this environment")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        if rc != 0 and "coordinator" in err.lower():
            pytest.skip(f"distributed runtime unavailable: {err[-200:]}")
        assert rc == 0, err[-500:]
        assert "OK" in out
