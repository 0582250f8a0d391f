"""Attention dispatch: XLA reference path + Pallas flash path.

The reference relies on diffusers attention processors / optional xformers
(SURVEY.md §2.9 D1, §5.7).  Here `attention()` is the single entry point used
by CLIP, the UNet transformer blocks and the VAE mid-block; it routes to the
Pallas flash kernel on TPU for shapes that fit its tiling, else to a
well-fused XLA softmax(QK^T)V with fp32 accumulation.

Layout: q [B, Sq, H, D], k/v [B, Skv, H, D] -> out [B, Sq, H, D].
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


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


def _use_pallas() -> bool:
    """Pallas attention is opt-in (SDTPU_PALLAS_ATTN=1): measured on v5e,
    XLA's own attention fusion beats our exact-softmax kernel at SD shapes
    (148 vs 167-177 ms/step batch-16 SD1.5); see benchmarks/ablate_unet.py."""
    if not os.environ.get("SDTPU_PALLAS_ATTN"):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Route to the Pallas flash kernel when on TPU and the shape qualifies."""
    if _use_pallas() and mask is None:
        from stablediffusion_tpu.ops.flash_attention import (
            flash_attention,
            flash_attention_streaming,
            shape_supported,
        )

        if shape_supported(q.shape, k.shape):
            return flash_attention(q, k, v, scale=scale)
        if k.shape[1] >= 2048:  # long KV: streaming online-softmax kernel
            return flash_attention_streaming(q, k, v, scale=scale)
    return attention_xla(q, k, v, mask=mask, scale=scale)
