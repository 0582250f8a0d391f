"""Pallas TPU attention kernel.

The hot op of the whole framework: UNet self-attention (up to 4096 spatial
tokens at SDXL 1024²) and cross-attention (4096 q × 77 text kv) — SURVEY.md
§5.7 and BASELINE north star.  The reference delegates to diffusers/xformers
CUDA attention.

Two kernels over the [B, S, H*D] flattened layout (no transposes, no head-dim
padding; heads are static lane slices):
  * resident: full K/V in VMEM, exact fp32 row softmax — short/medium KV;
  * streaming: online-softmax over KV blocks with running (max, denom, acc)
    scratch — any KV length (4096-token SD levels and beyond).

STATUS (v5e measurements, benchmarks/profile_trace.py): XLA's own attention
fusion outperforms both kernels at SD shapes (~122 vs ~136 ms/step SD1.5
batch-16; per-L1-attention ~7 ms XLA vs ~10 ms pallas) — the D=40 contraction
pads to the 128-deep MXU either way and XLA's fusion pipeline is simply
better here.  Pallas attention is therefore OPT-IN (SDTPU_PALLAS_ATTN=1),
kept for the long-KV regimes (>2048² generation) where XLA would materialize
multi-GB score tensors, and as the base for future kernel work.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024  # bytes of explicit buffers per program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _buffer_bytes(bq: int, skv_pad: int, h: int, d: int, itemsize: int = 2) -> int:
    # k + v blocks hold ALL heads (double-buffered by Mosaic), plus the
    # per-head fp32 score block and bf16 prob block
    kv_bytes = 2 * 2 * skv_pad * h * d * itemsize
    logits_bytes = bq * skv_pad * 4
    probs_bytes = bq * skv_pad * itemsize
    q_out_bytes = 2 * 2 * bq * h * d * itemsize
    return kv_bytes + logits_bytes + probs_bytes + q_out_bytes


def _block_q(sq: int, skv_pad: int, h: int, d: int) -> Optional[int]:
    """Largest q block that fits the VMEM budget."""
    for bq in (1024, 512, 256, 128):
        if _buffer_bytes(bq, skv_pad, h, d) < _VMEM_BUDGET:
            return min(bq, _round_up(sq, 8))
    return None


def shape_supported(q_shape: Tuple[int, ...], k_shape: Tuple[int, ...]) -> bool:
    _, sq, h, d = q_shape
    _, skv, _, _ = k_shape
    skv_pad = _round_up(skv, _LANE)
    return _block_q(sq, skv_pad, h, d) is not None


def _attn_kernel4d(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                   heads: int, head_dim: int):
    """Blocks come off the [B, S, H*D] flattened layout with all heads
    resident: q [1, BQ, H*D], k/v [1, SKV, H*D] — no host-side transposes or
    D padding.  Heads are static lane slices in an unrolled loop (the
    [BQ, SKV] score block is reused across heads, bounding VMEM)."""
    H = heads
    skv = k_ref.shape[1]
    col = None
    if kv_len < skv:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[1], skv), dimension=1
        )
    ones = jnp.ones((skv, 1), v_ref.dtype)
    for h in range(H):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl].astype(jnp.float32)  # [BQ, D]
        k = k_ref[0, :, sl].astype(jnp.float32)  # [SKV, D]
        v = v_ref[0, :, sl]  # [SKV, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale
        if col is not None:
            s = jnp.where(col < kv_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(v.dtype)
        denom = jax.lax.dot_general(
            p, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# streaming variant: online softmax over KV blocks (long-KV self-attention)
# ---------------------------------------------------------------------------

_NEG_INF = -1e30


def _flash_stream_kernel(
    q_ref,  # [1, BQ, H*D]
    k_ref,  # [1, BKV, H*D]
    v_ref,  # [1, BKV, H*D]
    o_ref,  # [1, BQ, H*D]
    acc_ref,  # scratch [BQ, H*D] f32
    m_ref,  # scratch [BQ, 128] f32 (col h = running max of head h)
    l_ref,  # scratch [BQ, 128] f32 (col h = running denom of head h)
    *,
    scale: float,
    heads: int,
    head_dim: int,
    kv_len: int,
    bkv: int,
):
    j = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # kv tail mask (static per grid position via iota + dynamic j)
    base = j * bkv
    col = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[1], bkv), 1) + base
    need_mask = kv_len % bkv != 0 or kv_len < bkv * n_kv

    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl].astype(jnp.float32)
        k = k_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if need_mask:
            s = jnp.where(col < kv_len, s, _NEG_INF)

        m_old = m_ref[:, h : h + 1]
        l_old = l_ref[:, h : h + 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_old, m_cur)
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_old + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:, sl] = alpha * acc_ref[:, sl] + pv
        m_ref[:, h : h + 1] = m_new
        l_ref[:, h : h + 1] = l_new

    @pl.when(j == n_kv - 1)
    def _finish():
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            denom = l_ref[:, h : h + 1]
            o_ref[0, :, sl] = (acc_ref[:, sl] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention_streaming(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None
) -> jax.Array:
    """Online-softmax flash attention over KV blocks; handles any KV length
    (the 4096-token SD level and beyond) with bounded VMEM."""
    B, Sq, H, D = q.shape
    _, Skv, _, _ = k.shape
    if scale is None:
        scale = D**-0.5
    HD = H * D
    bq = 512 if Sq % 512 == 0 else (256 if Sq % 256 == 0 else _round_up(Sq, 8))
    bkv = 1024 if Skv % 1024 == 0 else _round_up(Skv, _LANE)
    sq_pad = _round_up(Sq, bq)
    skv_pad = _round_up(Skv, bkv)

    qf = q.reshape(B, Sq, HD)
    kf = k.reshape(B, Skv, HD)
    vf = v.reshape(B, Skv, HD)
    if sq_pad != Sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - Sq), (0, 0)))
    if skv_pad != Skv:
        kf = jnp.pad(kf, ((0, 0), (0, skv_pad - Skv), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, skv_pad - Skv), (0, 0)))

    grid = (B, sq_pad // bq, skv_pad // bkv)
    out = pl.pallas_call(
        functools.partial(
            _flash_stream_kernel,
            scale=float(scale),
            heads=H,
            head_dim=D,
            kv_len=Skv,
            bkv=bkv,
        ),
        out_shape=jax.ShapeDtypeStruct((B, sq_pad, HD), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, HD), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, HD), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, HD), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, HD), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, HD), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Skv * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=B * H * Sq * Skv,
        ),
    )(qf, kf, vf)
    out = out[:, :Sq] if sq_pad != Sq else out
    return out.reshape(B, Sq, H, D)


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

    skv_pad = _round_up(Skv, _LANE)
    bq = _block_q(Sq, skv_pad, H, D)
    assert bq is not None, "shape not supported; gate with shape_supported()"

    HD = H * D
    qf = q.reshape(B, Sq, HD)
    kf = k.reshape(B, Skv, HD)
    vf = v.reshape(B, Skv, HD)
    # pad only the sequence dims (cheap); lanes stay in place
    sq_pad = _round_up(Sq, bq)
    if sq_pad != Sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - Sq), (0, 0)))
    if skv_pad != Skv:
        kf = jnp.pad(kf, ((0, 0), (0, skv_pad - Skv), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, skv_pad - Skv), (0, 0)))

    grid = (B, sq_pad // bq)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel4d, scale=float(scale), kv_len=Skv, heads=H, head_dim=D
        ),
        out_shape=jax.ShapeDtypeStruct((B, sq_pad, HD), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Skv * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=B * H * Sq * Skv,
        ),
    )(qf, kf, vf)

    out = out[:, :Sq] if sq_pad != Sq else out
    return out.reshape(B, Sq, H, D)
