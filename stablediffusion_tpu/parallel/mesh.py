"""Device mesh and sharding rules — the distributed "backend".

The reference's only parallelism is accelerate/NCCL data-parallel DDP
(ref: train_lora_pipeline.py:194-197,363-376,470-476; SURVEY.md §2.10/§5.8).
The TPU-native equivalent is not a comm library: it is a mesh + sharding
module.  Collectives (grad psum/pmean, loss mean) are emitted by XLA from
sharding annotations inside one jitted step and ride ICI within a slice.

Axes:
  * ``data``   — batch sharding (DP); the parity requirement.
  * ``tensor`` — optional head/feature sharding (TP) for large UNets at high
    batch; 1 by default.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TENSOR_AXIS = "tensor"


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from environment when running multi-host
    (the accelerate process-group init analog, SURVEY.md §5.8).  On TPU pods
    jax.distributed.initialize() discovers coordinates automatically; on
    other platforms it needs JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID.  Returns True if distributed mode is active."""
    import os

    import jax

    # NB: do NOT touch jax.process_count()/jax.devices() before deciding —
    # they initialize the XLA backend, after which jax.distributed.initialize
    # raises ("must be called before any JAX calls").  Found by the
    # two-process CPU test (tests/test_distributed.py).
    try:
        from jax._src import distributed as _dist

        state = getattr(_dist, "global_state", None)
        if state is not None and getattr(state, "client", None) is not None:
            return True  # already initialized (idempotent re-entry)
    except (ImportError, AttributeError):  # pragma: no cover - private API moved
        pass
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        return True
    if on_pod:
        jax.distributed.initialize()
        return True
    return jax.process_count() > 1


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1: all remaining devices
    tensor: int = 1

    def build(self, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
        return make_mesh(self.data, self.tensor, devices)


def make_mesh(
    data: int = -1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % tensor == 0, f"{n} devices not divisible by tensor={tensor}"
        data = n // tensor
    assert data * tensor == n, f"mesh {data}x{tensor} != {n} devices"
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, (DATA_AXIS, TENSOR_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] arrays with batch sharded over `data`."""

    def place(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(place, batch)
