"""Optional tensor-parallel parameter sharding (SURVEY.md §2.10: "optional
2-D mesh for SDXL UNet at high batch" — not needed for parity).

Strategy: place attention/MLP linear kernels sharded over the `tensor` mesh
axis (column-parallel on to_q/to_k/to_v and the GEGLU projection, row-parallel
on to_out/ff-out) and let XLA's sharding propagation insert the collectives.
Everything else stays replicated.  No model code changes — sharding is purely
parameter placement.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stablediffusion_tpu.parallel.mesh import TENSOR_AXIS

# column-parallel (shard output features): q/k/v and up projections
_COL_SUFFIXES = (
    "to_q", "to_k", "to_v", "proj",
    # MM-DiT context stream (models/mmdit.py)
    "add_q_proj", "add_k_proj", "add_v_proj",
)
# row-parallel (shard input features): output projections
_ROW_SUFFIXES = ("to_out.0", "to_add_out", "2")  # ff(_context).net.2


def _spec_for(path: str, ndim: int, tensor_size: int, shape) -> P:
    if ndim != 2:
        return P()
    full = path.replace("/", ".")
    # int8-quantized trees (ops/quant.py): the [in, out] kernel is
    # "weight_int8" and its per-output-channel scale is "[w8|w8a8]_scale"
    # of shape [1, out] — both shard exactly like "weight" (the scale's
    # leading 1 makes the row-parallel case a replicate automatically)
    for s in _COL_SUFFIXES:
        if (
            full.endswith((f"{s}.weight", f"{s}.weight_int8",
                           f"{s}.w8_scale", f"{s}.w8a8_scale"))
            and shape[1] % tensor_size == 0
        ):
            return P(None, TENSOR_AXIS)
    for s in _ROW_SUFFIXES:
        if (
            full.endswith((f"{s}.weight", f"{s}.weight_int8"))
            and shape[0] % tensor_size == 0
        ):
            return P(TENSOR_AXIS, None)
    return P()


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a UNet/CLIP param tree with attention/MLP kernels sharded over
    the `tensor` axis.  With tensor size 1 this is a plain replicate."""
    tensor_size = mesh.shape[TENSOR_AXIS]

    def place(path, x):
        keys = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        spec = (
            _spec_for(keys, getattr(x, "ndim", 0), tensor_size, x.shape)
            if tensor_size > 1
            else P()
        )
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
