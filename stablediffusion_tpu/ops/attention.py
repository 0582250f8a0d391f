"""Attention dispatch: XLA reference path + Pallas flash path.

The reference relies on diffusers attention processors / optional xformers
(SURVEY.md §2.9 D1, §5.7).  Here `attention()` is the single entry point used
by CLIP, the UNet transformer blocks and the VAE mid-block; it routes to the
Pallas flash kernel on TPU for shapes that fit its tiling, else to a
well-fused XLA softmax(QK^T)V with fp32 accumulation.

Layout: q [B, Sq, H, D], k/v [B, Skv, H, D] -> out [B, Sq, H, D].
"""

from __future__ import annotations

import contextvars
import os
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp

_flash_mode_var = contextvars.ContextVar("sdtpu_flash_mode", default=None)


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v.

    Matmul accumulation is always fp32 (MXU native).  For bf16 inputs the
    materialized logits/probs tensors are stored bf16 — they dominate HBM
    traffic at the 4096-token SD level (an [B,H,4096,4096] tensor) and the
    single extra rounding matches what fp16 CUDA pipelines do.  fp32 inputs
    keep fp32 end to end (the parity path)."""
    B, Sq, H, D = q.shape
    if scale is None:
        scale = D**-0.5
    # Measured on v5e (benchmarks/, SD1.5 batch 8-32): fp32 logits + XLA's
    # own softmax fusion is the fastest formulation; storing logits bf16
    # regressed large batches because XLA materializes the fp32 exp anyway.
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(q.dtype), v, preferred_element_type=q.dtype
    )
    return out


_on_tpu_cache: Optional[bool] = None


def _flash_mode() -> str:
    """Effective flash-attention mode: the scoped `flash_attention_mode`
    override if active in this thread/context, else the SDTPU_FLASH_ATTN env
    var, else "1" (auto dispatch).  Values: "0" (XLA everywhere), "1" (auto),
    "all" (lower the head-dim floor to 32 — training backward memory)."""
    ov = _flash_mode_var.get()
    if ov is not None:
        return ov
    return os.environ.get("SDTPU_FLASH_ATTN", "1")


@contextmanager
def flash_attention_mode(mode: str):
    """Scoped, thread-local override of the flash-attention dispatch mode.

    Used by the trainers to trace their jitted step with mode="all" without
    mutating the process-global env var: a concurrent thread tracing an
    attention-bearing jit (in-process serving, a validation render) keeps
    its own mode.  The dispatch reads the mode at TRACE time only."""
    tok = _flash_mode_var.set(str(mode))
    try:
        yield
    finally:
        _flash_mode_var.reset(tok)


def _on_tpu() -> bool:
    global _on_tpu_cache
    if _on_tpu_cache is None:
        try:
            _on_tpu_cache = jax.devices()[0].platform in ("tpu", "axon")
        except Exception:
            _on_tpu_cache = False
    return _on_tpu_cache


def _use_pallas() -> bool:
    """SDTPU_PALLAS_ATTN=1 force-routes every >=2048-KV attention through the
    hand streaming kernel (R&D / A-B override; benchmarks/bench_attention.py).
    The kernel is also on BY DEFAULT in the regime it owns — see
    `attention`."""
    return bool(os.environ.get("SDTPU_PALLAS_ATTN")) and _on_tpu()


def _lib_flash_supported(q_shape, k_shape) -> bool:
    """Shapes where the jax library TPU flash kernel beats XLA's attention
    fusion (v5e, benchmarks/sweep_attention.py):

      * SDXL L1 self (8,4096,10,64):  18.4 -> 7.1 ms (2.6x)
      * SDXL L2 self (8,1024,20,64):   3.4 -> 2.2 ms
      * SD15 L2 self (16,1024,8,80):   3.0 -> 2.0 ms

    XLA stays ahead at D=40 (SD1.5 L1: 8.4 vs 10.7 ms — the 40->128 MXU pad
    hurts the [b,h,s,d]-blocked kernel more) and at short KV (cross-attn,
    Skv=77, below the kernel's block minimum).

    SDTPU_FLASH_ATTN=all lowers the head-dim floor to 32: the D=40 forward is
    ~27% slower than XLA's fusion, but the flash BACKWARD is O(S*D) memory
    where XLA's saves the fp32 [B,H,S,S] logits — the difference between
    batch-16 training fitting in 16G HBM and OOMing by gigabytes.  The
    trainers set this mode.

    Sequences that are NOT a multiple of 512 (e.g. the SD3/MMDiT joint
    stream, 4096 image + 333 text = 4429 tokens) are zero-padded up to the
    next multiple and masked via the kernel's segment ids — the ~4% extra
    tiles are far cheaper than XLA's materialized fp32 [B,H,S,S] logits at
    these lengths.

    At tiny attention batch (B<=2, i.e. single-image CFG latency serving),
    the D<64 floor is lifted: the XLA path's materialized probs dominate
    there and flash wins end-to-end (SD1.5 batch-1 p50 1.106 -> 0.464 s).

    Round-4 measurement caveat that SETS this table: STANDALONE attention
    microbenches do not transfer to the big-batch in-graph XLA path.  Inside
    the real denoise program XLA emits ONE kOutput loop fusion per layer
    computing softmax(QK^T)V end-to-end without materializing [S,S] logits
    (b8 device trace: 6.97 ms at B16,S4096,H8,D40 = ~50 TF/s incl. both
    matmuls — at the D=40 padded-MXU practical ceiling and FASTER than the
    library flash kernel's 9.22 ms standalone), while the same XLA
    formulation benched standalone materializes logits and reads 12.73 ms.
    Hence D<64 big-batch stays on XLA: the fusion only exists in-graph.
    Kernel custom-calls (lib flash, streaming) measure the same in or out
    of graph, so their standalone numbers are trusted.

    Past S=8192 (>=1448² generation) the floor drops to 32 at ANY batch:
    XLA's fp32/bf16 [B,H,S,S] intermediates are GiB-scale there and the
    loop fusion stops being chosen — the flash kernels own the regime
    (benchmarks/bench_longkv_attention.py: B2 S9216 D40 lib 5.45 vs XLA
    23.74 ms; S=16384 XLA cannot run)."""
    b, sq, _, d = q_shape
    skv = k_shape[1]
    d_min = 32 if (_flash_mode() == "all" or b <= 2 or skv >= 8192) else 64
    return skv >= 1024 and d_min <= d <= 128


def _pad_granularity(s: int) -> int:
    """Ragged-sequence pad granularity: 512 when it wastes <=12.5% of the
    true length, else 256.  Floor is 256, NOT 128: 128-token blocks
    measurably ballooned the flash backward's live set (17.12G vs 15.97G
    on the SD3 512² batch-16 step — more, smaller residual buffers beat
    the padding saving).  Unit-pinned in tests/test_ops.py."""
    return 512 if (-s % 512) * 8 <= s else 256


def _lib_flash(q, k, v, scale: float) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as lib_flash_attention,
    )

    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    # Ragged sequences (SD3 joint stream: 4429 at 1024², 1101 at 512²):
    # zero-pad to the tile grid and exclude the padding with segment ids
    # (pad tokens live in segment 0, real tokens in segment 1 — the kernel
    # masks q/kv segment mismatches).  Pad GRANULARITY adapts: 512 when it
    # wastes <=12.5% of the true length, else 256 — a fixed 512 pads
    # 1101 -> 1536 (40% waste), and in training the backward residuals
    # scale with the PADDED length (the SD3 512² batch-16 step missed the
    # 15.75G chip by 230M on exactly that waste); see _pad_granularity.
    gran = min(_pad_granularity(Sq), _pad_granularity(Skv))
    pad_q, pad_k = -Sq % gran, -Skv % gran
    segment_ids = None
    if pad_q or pad_k:
        seg = lambda s, pad: jnp.pad(
            jnp.ones((B, s), jnp.int32), ((0, 0), (0, pad))
        )
        segment_ids = SegmentIds(q=seg(Sq, pad_q), kv=seg(Skv, pad_k))
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        Sq, Skv = Sq + pad_q, Skv + pad_k

    def _pick_block(s, cap):
        for b in (cap, 512, 256, 128):
            if b <= s and s % b == 0:
                return b
        return 128

    block_q = _pick_block(Sq, 512 if Sq >= 2048 else min(1024, Sq))
    block_k = _pick_block(Skv, min(1024, Skv))
    bs = BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=1,
        # backward-pass blocks (LoRA training at D>=64 shapes)
        block_q_major_dkv=block_q,
        block_k_major_dkv=block_k,
        block_k_dkv=block_k,
        block_q_dkv=block_q,
        block_k_major_dq=block_k,
        block_k_dq=block_k,
        block_q_dq=block_q,
    )
    out = lib_flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=segment_ids,
        sm_scale=scale,
        block_sizes=bs,
    )
    out = out.transpose(0, 2, 1, 3)
    return out[:, : Sq - pad_q] if pad_q else out


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Shape-based dispatch: library TPU flash kernel where it wins (see
    `_lib_flash_supported`), the hand streaming kernel for long-KV head
    dims the library kernel cannot tile, else the XLA fusion.

    Set SDTPU_FLASH_ATTN=0 to force the XLA path everywhere (e.g. when a
    pallas_call cannot be SPMD-partitioned for an exotic sharding);
    SDTPU_PALLAS_ATTN=1 force-routes every >=2048-KV call through the
    streaming kernel (A/B, benchmarks/bench_longkv_attention.py)."""
    if mask is None and _on_tpu():
        skv, d = k.shape[1], q.shape[-1]
        # (round 4) a third hand kernel — exp2/ones-column "smalld" for
        # D<128 — was built for the D=40 regime and KILLED: with clean
        # 64-iter timing it lost to the library kernel at every measured
        # shape (e.g. B2 S4096 D40: 1.59 vs 1.40 ms; B1 S16384 D40: 8.65 vs
        # 8.32).  Numbers preserved in RESULTS.json["longkv_attention"].
        if _use_pallas() and skv >= 2048:
            from stablediffusion_tpu.ops.flash_attention import (
                flash_attention_streaming,
            )

            return flash_attention_streaming(q, k, v, scale=scale)
        if _flash_mode() != "0":
            if _lib_flash_supported(q.shape, k.shape):
                return _lib_flash(
                    q, k, v, scale if scale is not None else d**-0.5
                )
            if skv >= 8192 and not 32 <= d <= 128:
                # Long KV at a head dim the library kernel cannot tile
                # (VAE mid-block: H=1, D=512 — 16384 tokens at 1024² decode,
                # 65536 at 2048²).  XLA's fp32 [B,1,S,S] logits are 1-16 GiB
                # here; the streaming kernel's flattened [B,S,H*D] layout
                # takes any D (benchmarks/bench_longkv_attention.py).
                from stablediffusion_tpu.ops.flash_attention import (
                    flash_attention_streaming,
                )

                return flash_attention_streaming(q, k, v, scale=scale)
    return attention_xla(q, k, v, mask=mask, scale=scale)
