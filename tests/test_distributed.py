"""Multi-PROCESS (multi-host analog) distributed backend test.

The reference scales with accelerate/NCCL DDP across processes
(train_lora_pipeline.py:194-197); the TPU-native analog is
jax.distributed.initialize + a global mesh spanning every process's
devices, with XLA emitting the cross-host collectives.  The in-process
8-device mesh tests cover sharding semantics; THIS test covers the
process-boundary machinery itself: coordinator bootstrap
(`maybe_initialize_distributed`), global device visibility,
`make_array_from_process_local_data` batch assembly, and a jitted global
reduction — two actual OS processes, 2 CPU devices each.

Also a regression test: maybe_initialize_distributed used to call
jax.process_count() BEFORE jax.distributed.initialize, which initializes
the XLA backend and makes initialize() raise unconditionally.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())
from jax.sharding import NamedSharding, PartitionSpec as P
import jax.numpy as jnp
import numpy as np
from stablediffusion_tpu.parallel import (
    make_mesh, maybe_initialize_distributed,
)

assert maybe_initialize_distributed(), "distributed init failed"
assert maybe_initialize_distributed(), "not idempotent"
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()
assert len(jax.local_devices()) == 2

mesh = make_mesh(data=2 * nproc, tensor=1)
B = 2 * nproc
local = np.arange(2, dtype=np.float32) + 2 * pid  # rows this process owns
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (B,)
)
out = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(arr)
total = float(out.addressable_shards[0].data)
expect = float(np.arange(B, dtype=np.float32).sum())
assert total == expect, (total, expect)
print(f"RESULT {pid} {total}", flush=True)
"""


def test_two_process_global_mesh(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    results = [
        line for o in outs for line in o.splitlines() if line.startswith("RESULT")
    ]
    assert len(results) == 2, outs
    # both processes computed the same global reduction
    assert {r.split()[2] for r in results} == {"6.0"}, results
