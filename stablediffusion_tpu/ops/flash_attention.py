"""Pallas TPU streaming attention kernel (long-KV self-attention).

The hot op of the whole framework: UNet self-attention reaches 4096 spatial
tokens at SDXL 1024² and 16384+ at high-res generation — SURVEY.md §5.7 and
BASELINE north star.  The reference delegates to diffusers/xformers CUDA
attention.

One kernel over the [B, S, H*D] flattened layout (no transposes, no head-dim
padding; heads are static lane slices): online-softmax over KV blocks with
running (max, denom, acc) scratch — any KV length and ANY head dim, which is
what earns it a default slot: the jax library flash kernel requires D ≥ 32
blocked tiles and XLA's fusion materializes the [B, H, S, S] fp32 logits
(S=16384, H=8, B=2: 8 GiB — cannot run at all).

STATUS (v5e): XLA's own attention fusion wins every benched SD shape up to
S=4096 (per-L1-attention ~7 ms XLA vs ~10 ms pallas at D=40; the 40→128 MXU
pad hurts the kernel more), and the jax library flash kernel wins the D≥64 /
S≥1024 block (see ops/attention._lib_flash_supported).  This kernel owns the
remaining regime — very long KV where XLA's logits don't fit — measured in
benchmarks/bench_longkv_attention.py; a resident full-KV-in-VMEM variant
that lost to XLA everywhere was deleted in round 3 (VERDICT r2 item 7)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# Explicit VMEM buffers must fit well under the ~16M hardware limit
# (Mosaic double-buffers every grid-streamed block, and the kernel stack
# needs headroom: a fixed 512/1024 blocking measured 16.82M at fp32 HD=512
# — the SDXL VAE-encoder mid-block — and failed to compile)
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_blocks(sq: int, skv: int, hd: int, itemsize: int):
    """Largest (block_q, block_kv) whose double-buffered VMEM footprint
    (q/k/v/out blocks ×2 + fp32 acc/max/denom scratch) fits the budget."""

    def cost(bq, bkv):
        io = 2 * itemsize * hd * (2 * bq + 2 * bkv)  # q+out, k+v (×2 buf)
        scratch = 4 * bq * hd + 8 * bq * _LANE
        return io + scratch

    for bq in (512, 256, 128, 64):
        for bkv in (1024, 512, 256, 128):
            if cost(bq, bkv) <= _VMEM_BUDGET:
                return (
                    min(bq, _round_up(sq, 8)),
                    min(bkv, _round_up(skv, _LANE)),
                )
    return 64, 128


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


# ---------------------------------------------------------------------------
# (removed) Small-head-dim long-KV kernel — round-4 kill-or-keep: an
# exp2/ones-column-denominator kernel for D<128 (scale folded into Q, the
# softmax denominator riding the PV matmul as a ones column in the lane-pad
# space) LOST to the library flash kernel at every measured shape once the
# benchmark timing was cleaned of tunnel dispatch latency (64-iter scans):
# B2 S4096 D40 1.59 vs 1.40 ms, B1 S16384 D40 8.65 vs 8.32, B16 S4096 D40
# 10.92 vs 9.22.  The D=40 MXU lane pad is structural (a 40-deep
# contraction cannot use the other 88 lanes; block-diagonal packings just
# move the zeros), and the library kernel already sits on the padded-MXU
# floor.  Numbers: RESULTS.json["longkv_attention"] (git: round-4 history).
# ---------------------------------------------------------------------------



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
    bq, bkv = _pick_blocks(Sq, Skv, HD, q.dtype.itemsize)
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
