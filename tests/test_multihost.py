"""Two-process `initialize_multihost` smoke test on CPU.

Exercises parallel.initialize_multihost (a wrapper over
jax.distributed.initialize) the way a real multi-host launch would use it:
two local processes, a coordinator on localhost, one CPU device each. Each
worker asserts the GLOBAL device/process counts and runs a cross-process
psum over a 2-device mesh so an actual collective crosses the process
boundary (the single-host analog of DCN collectives, SURVEY.md §2.3).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax

coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)

from objectdetection_tpu.parallel import initialize_multihost, make_mesh

initialize_multihost(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()
assert len(jax.local_devices()) == 1

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(2)
sharding = NamedSharding(mesh, P("data"))
# each process contributes its local shard of a global [2] array
local = jnp.asarray([float(pid + 1)])
global_arr = jax.make_array_from_single_device_arrays(
    (2,), sharding, [jax.device_put(local, jax.local_devices()[0])]
)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(global_arr)
assert float(total) == 3.0, float(total)
print(f"worker {pid} ok", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_initialize_multihost_two_processes(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coordinator, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} ok" in out
