"""Multi-host input pipeline: exercise ``shard_batch_multihost`` under a REAL
``jax.distributed`` 2-process CPU cluster (SURVEY.md §2.11 — the round-1 gap
was that only the single-process branch ever ran).

Each spawned process initializes jax.distributed, builds its local half of a
global batch, assembles a global sharded array via
``jax.make_array_from_process_local_data``, and verifies a psum over the
global batch sees every host's data.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

coord = sys.argv[1]
pid = int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4  # 2 local per process

sys.path.insert(0, os.environ["COTR_TPU_REPO"])
from cotr_tpu.parallel.mesh import make_mesh, shard_batch_multihost

mesh = make_mesh()  # all 4 global devices on the 'data' axis
# per-host local shard: host p contributes values p*100 + [0..1] per row
local = {"x": (np.arange(2, dtype=np.float32)[:, None]
               + 100.0 * pid + np.zeros((2, 3), np.float32))}
gbatch = shard_batch_multihost(local, mesh)
assert gbatch["x"].shape == (4, 3), gbatch["x"].shape  # global batch

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

@jax.jit
def global_sum(x):
    return jnp.sum(x)

total = float(global_sum(gbatch["x"]))
# expected: sum over both hosts' rows: (0+1) * 3 + (100+101) * 3 = 606
assert abs(total - 606.0) < 1e-5, total
print(f"proc {pid} OK total={total}")
"""


@pytest.mark.slow
def test_shard_batch_multihost_two_processes(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["COTR_TPU_REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
