"""Pallas TPU attention kernel.

The hot op of the whole framework: UNet self-attention (up to 4096 spatial
tokens at SDXL 1024²) and cross-attention (4096 q × 77 text kv) — SURVEY.md
§5.7 and BASELINE north star.  The reference delegates to diffusers/xformers
CUDA attention.

Design: grid over (batch·heads, q-blocks); each program holds its q block and
the FULL K/V for that head in VMEM (K/V for SD shapes is <= ~1-2 MB), computes
exact fp32 softmax over the whole row — no online rescaling needed, fewer
passes than textbook flash attention — and writes the output block.  The
`shape_supported` gate keeps usage within a VMEM budget; larger shapes fall
back to the XLA path (a streaming KV variant can slot in later for >2048²
generation).

Head dims are zero-padded to lane width (128): zero q/k columns add nothing to
logits, zero v columns are cropped after.  kv padding is masked with -inf
(kv length is static under jit, so the mask is a compile-time constant).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024  # bytes of explicit buffers per program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _buffer_bytes(bq: int, skv_pad: int, d_pad: int, itemsize: int = 2) -> int:
    kv_bytes = 2 * skv_pad * d_pad * itemsize  # k + v
    logits_bytes = bq * skv_pad * 4  # fp32 scores
    q_out_bytes = 2 * bq * d_pad * 4
    return kv_bytes + logits_bytes + q_out_bytes


def _block_q(sq: int, skv_pad: int, d_pad: int) -> Optional[int]:
    """Largest q block that fits the VMEM budget.  Long-KV shapes cap at 256
    to keep the fp32 score block small (peak liveness drives VMEM spills)."""
    cap = 256 if skv_pad >= 2048 else 1024
    for bq in (1024, 512, 256, 128):
        if bq <= cap and _buffer_bytes(bq, skv_pad, d_pad) < _VMEM_BUDGET:
            return min(bq, _round_up(sq, 8))
    return None


def shape_supported(q_shape: Tuple[int, ...], k_shape: Tuple[int, ...]) -> bool:
    _, sq, _, d = q_shape
    _, skv, _, _ = k_shape
    d_pad = _round_up(d, _LANE)
    skv_pad = _round_up(skv, _LANE)
    return _block_q(sq, skv_pad, d_pad) is not None


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0].astype(jnp.float32)  # [SKV, D]
    v = v_ref[0]  # [SKV, D]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    skv_pad = k.shape[0]
    if kv_len < skv_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    # cast probabilities to the value dtype immediately (halves liveness);
    # normalize on the small [BQ, D] output, not the [BQ, SKV] matrix
    p = jnp.exp(s - m).astype(v.dtype)
    ones = jnp.ones((skv_pad, 1), v.dtype)
    denom = jax.lax.dot_general(
        p, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, 1] fp32 accumulation on the MXU
    o = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o = o / denom
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """q [B, Sq, H, D], k/v [B, Skv, H, D] -> [B, Sq, H, D]."""
    B, Sq, H, D = q.shape
    _, Skv, _, _ = k.shape
    if scale is None:
        scale = D**-0.5

    d_pad = _round_up(D, _LANE)
    skv_pad = _round_up(Skv, _LANE)
    bq = _block_q(Sq, skv_pad, d_pad)
    assert bq is not None, "shape not supported; gate with shape_supported()"
    sq_pad = _round_up(Sq, bq)

    def to_bh(x, s_pad, s):
        # [B, S, H, D] -> [B*H, S_pad, D_pad]
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, s, D)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - D)))

    qb = to_bh(q, sq_pad, Sq)
    kb = to_bh(k, skv_pad, Skv)
    vb = to_bh(v, skv_pad, Skv)

    grid = (B * H, sq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=float(scale), kv_len=Skv),
        out_shape=jax.ShapeDtypeStruct((B * H, sq_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bq, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, skv_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, skv_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Skv * D,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=B * H * Sq * Skv,
        ),
    )(qb, kb, vb)

    out = out[:, :Sq, :D].reshape(B, H, Sq, D)
    return jnp.swapaxes(out, 1, 2)
