"""Real multi-process DP exercise (round-1 VERDICT item 8): spawn two local
processes with jax.distributed.initialize over CPU, build the global mesh,
assert local_batch_slice feeds disjoint rows, and run a psum across hosts.
No TPU pod needed — this is exactly the bring-up path parallel/mesh.py:56-86
documents for pod slices (SURVEY.md §5.8)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["FDM_REPO"])

from fdm_tpu.parallel import initialize_distributed, local_batch_slice, make_mesh, shard_batch

pid = initialize_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
assert jax.process_count() == 2, jax.process_count()
assert pid == int(os.environ["PROC_ID"])

# 2 processes x 2 local CPU devices = 4 global devices
assert len(jax.local_devices()) == 2, jax.local_devices()
assert jax.device_count() == 4, jax.device_count()

mesh = make_mesh()  # global 4-way data mesh
assert mesh.devices.size == 4

sl = local_batch_slice(8)
print(f"RESULT pid={pid} slice={sl.start}:{sl.stop}", flush=True)

# cross-host collective: global sum over a sharded array
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

rows = np.arange(8, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
local = rows[sl]
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, global_shape=(8, 4)
)
total = jax.jit(lambda x: jnp.sum(x))(arr)
print(f"RESULT pid={pid} sum={float(total)}", flush=True)
assert float(total) == float(rows.sum()), float(total)

# the Trainer's own batch-placement helper must assemble the same global
# array from per-host rows (multi-process shard_batch goes through
# make_array_from_process_local_data; a plain device_put cannot stitch
# per-host shards)
batch = shard_batch({"x": local}, mesh)
assert batch["x"].shape == (8, 4), batch["x"].shape
total2 = jax.jit(lambda b: jnp.sum(b["x"]))(batch)
print(f"RESULT pid={pid} shard_batch_sum={float(total2)}", flush=True)
assert float(total2) == float(rows.sum()), float(total2)

# non-divisible global batches must fail loudly, not drop tail rows
try:
    local_batch_slice(9)
except ValueError:
    print(f"RESULT pid={pid} indivisible=raises", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_dp():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        env["COORD"] = f"localhost:{port}"
        env["PROC_ID"] = str(pid)
        env["FDM_REPO"] = REPO
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                # NOT the repo root: the axon sitecustomize registers its
                # plugin for processes started there and initializes the
                # backend before jax.distributed can form the cluster
                env=env, cwd="/tmp",
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"

    # disjoint per-host rows: proc 0 -> 0:4, proc 1 -> 4:8
    assert "RESULT pid=0 slice=0:4" in outs[0]
    assert "RESULT pid=1 slice=4:8" in outs[1]
    assert "sum=112.0" in outs[0] and "sum=112.0" in outs[1]
    assert "shard_batch_sum=112.0" in outs[0]
    assert "shard_batch_sum=112.0" in outs[1]
    assert "indivisible=raises" in outs[0]
