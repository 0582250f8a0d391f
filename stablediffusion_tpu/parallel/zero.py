"""ZeRO-style state sharding over the ``data`` mesh axis.

The reference's trainer replicates parameters and optimizer state on every
GPU (accelerate DDP, ref: train_lora_pipeline.py:194-197,470-476).  On a TPU
mesh the idiomatic alternative is to *annotate* the big state trees as
sharded and let XLA's SPMD partitioner insert the collectives (SURVEY.md
§5.8 / §2.10):

* ``shard_opt_state`` (ZeRO-1): each Adam-moment leaf lives split over the
  data axis; XLA reduce-scatters the gradients into the moment update and
  all-gathers the parameter delta.  Cuts optimizer HBM by ``1/n_data`` —
  for full-UNet fine-tuning (fp32 AdamW: 8 bytes/param = 6.9 GB on SD1.5)
  this is the difference between fitting and not.
* ``shard_params`` (FSDP / ZeRO-3 flavour): frozen and trainable parameter
  leaves are stored split over the data axis; XLA all-gathers each weight
  just before use in the step and discards the gathered copy after.  Trades
  ICI all-gather traffic for ``(n-1)/n`` of the parameter HBM (frozen SDXL
  UNet bf16: 5.1 GB -> 0.64 GB per chip on 8).

Leaf rule: split the largest axis whose size divides the data-axis length
(conv HWIO kernels split on O or I, linears on the bigger of in/out,
embeddings on vocab); leaves with no divisible axis — biases, norm scales,
scalar step counts — stay replicated.  The rule is applied identically at
placement time (``shard_tree``) and inside the jitted step
(``constrain_tree``), so steady-state layouts are stable across steps.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stablediffusion_tpu.parallel.mesh import DATA_AXIS


def _best_axis(shape, n: int) -> Optional[int]:
    """Largest axis divisible by ``n`` (ties -> earliest), else None."""
    best = None
    for i, s in enumerate(shape):
        if s >= n and s % n == 0 and (best is None or s > shape[best]):
            best = i
    return best


def tree_shardings(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Per-leaf NamedShardings by the largest-divisible-axis rule."""
    n = mesh.shape[axis]

    def spec(x):
        shape = getattr(x, "shape", ())
        ax = _best_axis(shape, n)
        if ax is None:
            return NamedSharding(mesh, P())
        parts = [None] * len(shape)
        parts[ax] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec, tree)


def shard_tree(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """device_put the tree with each leaf split over ``axis`` (host call)."""
    return jax.device_put(tree, tree_shardings(tree, mesh, axis))


def constrain_tree(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Apply the same layout as a sharding constraint (inside jit)."""
    return jax.tree_util.tree_map(
        jax.lax.with_sharding_constraint, tree, tree_shardings(tree, mesh, axis)
    )
