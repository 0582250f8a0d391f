"""Fused GroupNorm+SiLU Pallas kernel.

Every UNet/VAE resnet starts with GroupNorm -> SiLU (SURVEY.md D1); XLA
executes the reduction passes + normalize as several HBM round trips.  This
kernel holds one batch row (bf16) in VMEM and does everything in one read +
one write.

Implementation notes:
  * fp32 statistics are accumulated slab-by-slab with a fori_loop, so no
    full fp32 copy of the row is ever materialized (VMEM stays ~2x the bf16
    row);
  * group reductions go through matmuls against a constant [C, G] one-hot
    membership matrix (MXU), avoiding lane-dimension reshapes that would
    force Mosaic relayouts; per-channel scale/shift come back through the
    transposed one-hot.

Gated to rows that fit VMEM (all UNet levels; the largest VAE decode levels
fall back to the XLA path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024
_SLAB = 512


def _pick_slab(hw: int) -> Optional[int]:
    for s in (_SLAB, 256, 128, 64, 8):
        if hw % s == 0:
            return min(s, hw)
    return None


def shape_supported(shape, dtype_size: int = 2) -> bool:
    b, h, w, c = shape
    hw = h * w
    if _pick_slab(hw) is None:
        return False
    # double-buffered in + out rows + slab-sized fp32 temps
    return hw * c * dtype_size * 4 + _SLAB * c * 4 * 2 < _VMEM_BUDGET


def _gn_silu_kernel(
    x_ref,
    gamma_ref,
    beta_ref,
    onehot_ref,
    o_ref,
    *,
    eps: float,
    n_per_group: float,
    apply_silu: bool,
    slab: int,
):
    HW, C = x_ref.shape[1], x_ref.shape[2]
    n_slabs = HW // slab
    onehot = onehot_ref[:]  # [C, G] fp32

    def stat_body(i, acc):
        s1, s2 = acc
        xs = x_ref[0, pl.ds(i * slab, slab), :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xs, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xs * xs, axis=0, keepdims=True)
        return (s1, s2)

    zero = jnp.zeros((1, C), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, n_slabs, stat_body, (zero, zero))

    g1 = jnp.dot(s1, onehot, preferred_element_type=jnp.float32)  # [1, G]
    g2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32)
    mean_g = g1 / n_per_group
    var_g = g2 / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, onehot.T, preferred_element_type=jnp.float32)

    gamma = gamma_ref[:].astype(jnp.float32)
    beta = beta_ref[:].astype(jnp.float32)
    alpha = gamma * rstd_c  # [1, C]
    shift = beta - mean_c * alpha

    def apply_body(i, _):
        xs = x_ref[0, pl.ds(i * slab, slab), :].astype(jnp.float32)
        y = xs * alpha + shift
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * slab, slab), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, apply_body, 0)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "apply_silu")
)
def group_norm_silu_pallas(
    x: jax.Array,  # [B, H, W, C]
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = True,
) -> jax.Array:
    B, H, W, C = x.shape
    G = num_groups
    HW = H * W
    slab = _pick_slab(HW)
    assert slab is not None, "gate with shape_supported()"
    xr = x.reshape(B, HW, C)
    onehot = jnp.asarray(
        np.repeat(np.eye(G, dtype=np.float32), C // G, axis=0)
    )  # [C, G]
    out = pl.pallas_call(
        functools.partial(
            _gn_silu_kernel,
            eps=float(eps),
            n_per_group=float(HW * (C // G)),
            apply_silu=apply_silu,
            slab=slab,
        ),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, HW, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * HW * C,
            bytes_accessed=2 * B * HW * C * x.dtype.itemsize,
            transcendentals=B * HW * C,
        ),
    )(xr, gamma.reshape(1, C), beta.reshape(1, C), onehot)
    return out.reshape(B, H, W, C)
