"""Multi-process distributed bring-up: 2 real CPU processes join via
jax.distributed, assemble the global mesh, and run a psum over it
(covers parallel/distributed.py, which previously had no multi-process
exercise)."""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from videoglamm_tpu.parallel import (global_device_mesh,
                                     initialize_distributed,
                                     is_main_process)

pid = int(sys.argv[1])
initialize_distributed(coordinator_address=sys.argv[2],
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert is_main_process() == (pid == 0)

mesh = global_device_mesh(model_parallel=2)
assert mesh.devices.size == 4, mesh.devices.shape   # 2 procs x 2 devices
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
    "data": 2, "model": 2}

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# global array sharded over the data axis; every process contributes
arr = jax.make_array_from_callback(
    (4, 8), NamedSharding(mesh, P("data")),
    lambda idx: jnp.ones((4, 8))[idx] * (pid + 1))
s = float(jax.jit(lambda a: a.sum())(arr))
# rows 0-1 from proc 0 (value 1), rows 2-3 from proc 2 (value 2)
assert s == 8 * (2 * 1.0 + 2 * 2.0), s
print(f"proc {pid} OK sum={s}")
"""


def test_two_process_cpu_distributed(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd(), env.get("PYTHONPATH", "")])
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), addr],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
