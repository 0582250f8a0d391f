"""int8 quantization for the denoise compute path (opt-in, approximate).

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs 197
TFLOP/s), and int8 weights halve the HBM traffic that dominates batch-1
latency.  The reference has no quantized path at all (its serving loop is
fp16 torch, /root/reference/pipelines/sd_unified_pipeline.py:465-523); this
module is a TPU-native extension in the same spirit as DeepCache: measured,
opt-in, and honest about being approximate.

Two modes, both applied as a one-time pytree transform AFTER any LoRA
fusion (quantization must see the final effective weights):

  * "w8"   — weight-only: weights stored int8 + per-output-channel fp32
             scale, dequantized to the activation dtype at use.  The MXU
             still runs bf16; the win is halved weight HBM reads (the
             batch-1 / memory-bound regime).
  * "w8a8" — weights int8 as above; activations dynamically quantized at
             each matmul/conv (per-token scale for linears, per-tensor for
             convs — a per-pixel scale cannot factor out of a conv's
             spatial window sum).  The dot/conv contracts in int8 on the
             doubled-rate MXU path; the int32 accumulator is rescaled by
             (act_scale * weight_scale) in the epilogue.

Numerics: symmetric 127-clip quantization.  GroupNorm/LayerNorm stats,
softmax, scheduler math, and every sub-`min_size` parameter (time-embedding
MLPs, norms, biases) stay untouched, so the approximation is confined to
the large matmuls/convs where the speed lives.  Error-vs-interval artifact:
benchmarks/bench_int8.py (MXU rates) + RESULTS.json["int8_mxu"].

Layout note: `ops.basic.linear`/`conv2d` auto-detect quantized param dicts
({"weight_int8", "<mode>_scale"} replacing "weight" — the mode lives in the
tree STRUCTURE, never as a string leaf, so the transformed tree is still a
valid jit argument), and so no model code changes: the same UNet/MMDiT/VAE
forward runs either tree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_weight(w: jax.Array, contract_axes):
    """Symmetric per-output-channel int8 quantization.

    `contract_axes`: axes of `w` that the matmul/conv contracts over —
    (0,) for (in, out) linears, (0, 1, 2) for HWIO convs.  The scale is
    per remaining (output) channel."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=tuple(contract_axes), keepdims=True)
    scale = jnp.maximum(amax / 127.0, _EPS)
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def quantize_act_per_token(x: jax.Array):
    """Per-token (last-axis) dynamic activation quantization for linears."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, _EPS)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def quantize_act_per_tensor(x: jax.Array):
    """Per-tensor dynamic activation quantization for convs (a spatially
    varying scale cannot factor out of the window sum)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, _EPS)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def int8_linear(params: dict, x: jax.Array) -> jax.Array:
    """Quantized counterpart of ops.basic.linear for a transformed tree."""
    wq = params["weight_int8"]  # [in, out]
    # the MODE is static tree structure, not a (jit-hostile string) leaf:
    # "w8_scale" marks weight-only, "w8a8_scale" the int8-MXU path
    if "w8_scale" in params:
        wscale = params["w8_scale"]
        w = wq.astype(x.dtype) * wscale.astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
    else:
        wscale = params["w8a8_scale"]
        xq, xs = quantize_act_per_token(x)
        acc = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * xs * wscale.reshape(1, -1)).astype(
            x.dtype)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def int8_conv2d(
    params: dict, x: jax.Array, stride: int = 1, padding="SAME"
) -> jax.Array:
    """Quantized counterpart of ops.basic.conv2d (NHWC / HWIO)."""
    wq = params["weight_int8"]  # [H, W, I, O]
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    if "w8_scale" in params:
        w = wq.astype(x.dtype) * params["w8_scale"].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        wscale = params["w8a8_scale"]
        xq, xs = quantize_act_per_tensor(x)
        acc = jax.lax.conv_general_dilated(
            xq, wq, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * xs
             * wscale.reshape(1, 1, 1, -1)).astype(x.dtype)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def validate_quant_mode(mode) -> None:
    """Raise on an unknown mode string
    ("auto" | "w8" | "w8a8" | "w8a8:N" | None).

    Callers that persist the mode (SDModel/SD3Model.quantize, the serving
    handler) validate BEFORE mutating state, so a bad request can't leave a
    poisoned quant_mode behind a fp tree."""
    if mode is None or mode == "auto":
        return
    base, _, thr = str(mode).partition(":")
    if base not in ("w8", "w8a8") or (thr and not thr.isdigit()):
        raise ValueError(f"unknown quant mode {mode!r}")


# The measured regime optima behind quantize="auto" (bench_int8_mixed.py on
# real v5e, RESULTS.json["int8_mixed_sdxl"/"int8_mixed_sd15_b8"]):
#   batch 1 (latency serving): full w8a8 is a 0.66x SLOWDOWN on the SDXL
#     1024² denoise (activation-quant overhead on narrow compute-starved
#     layers), while "w8a8:2048" — int8-MXU only for >=2048-out-channel
#     layers, w8 elsewhere — is 1.11x fp.
#   batch >= 8 (throughput serving): the narrow layers become compute-bound
#     too, and FULL "w8a8" wins (sd15 b8 106.2 vs fp 117.7 ms/step = 1.108x;
#     "w8a8:2048" captures only 1.013x there).
# Both operating points measure w8-grade quality (sd15 52.8 dB, sdxl 51.5).
AUTO_QUANT_SMALL_BATCH = "w8a8:2048"
AUTO_QUANT_LARGE_BATCH = "w8a8"
AUTO_QUANT_BATCH_THRESHOLD = 8


def resolve_quant_mode(mode, expected_batch: int = 1):
    """Map "auto" to the measured best mode for the expected serving batch
    (see the table above); any other mode passes through unchanged.  Called
    at the EDGES (SDModel/SD3Model.quantize, serving handler, quantize CLI)
    so the stored/persisted quant_mode is always a concrete string — the
    dispatch layer and int8 checkpoint metadata never see "auto"."""
    if mode != "auto":
        return mode
    if int(expected_batch) >= AUTO_QUANT_BATCH_THRESHOLD:
        return AUTO_QUANT_LARGE_BATCH
    return AUTO_QUANT_SMALL_BATCH


def _is_weight_leafdict(d: Any) -> bool:
    return isinstance(d, dict) and "weight" in d and hasattr(
        d["weight"], "ndim")


def quantize_params(
    tree: Any,
    mode: str = "w8a8",
    min_size: int = 65536,
    skip_keys: tuple = ("norm", "time_emb", "label_emb", "conv_in",
                        "conv_out", "pos_embed"),
    a8_min_out: int = 0,
) -> Any:
    """Transform a params pytree: every {"weight": ...} dict whose weight is
    a 2-D (in, out) linear or 4-D HWIO conv with >= min_size elements is
    replaced by its int8 form.  Apply AFTER LoRA fusion.

    `skip_keys`: any path component containing one of these substrings is
    left untouched — norms (their affine params are not matmuls), the
    time/label embedding MLPs (tiny, numerically sensitive), and the pixel
    boundary convs conv_in/conv_out (first/last-layer quantization is the
    classic quality cliff in W8A8 diffusion literature).

    `a8_min_out` (mode="w8a8" only): layers with fewer output channels fall
    back to weight-only w8.  The int8-MXU path only beats bf16 on wide-N
    shapes (RESULTS.json["int8_mxu"]: K1280->N10240 +20%, small-K/N
    neutral-to-worse), so a mixed tree captures the wide-layer win without
    paying activation-quant error/overhead on narrow layers.  The mode
    lives per-leaf in tree structure, so mixing is free at dispatch.
    Measured on the real SDXL B=1 1024² denoise (bench_int8_mixed.py):
    full w8a8 0.66x fp, "w8a8:2048" (ff.in projections only) **1.11x fp**.

    `mode` may carry the threshold inline as "w8a8:N" — the spelling used
    by SDModel.quantize / the serving `model.quantize` key / the int8
    checkpoint metadata."""
    if ":" in mode:
        mode, _, thr = mode.partition(":")
        a8_min_out = max(int(a8_min_out), int(thr))
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"unknown quant mode {mode!r}")

    def walk(node, path):
        if _is_weight_leafdict(node):
            w = node["weight"]
            name = "/".join(path)
            skip = (
                any(s in name for s in skip_keys)
                or w.ndim not in (2, 4)
                or w.size < min_size
            )
            if skip:
                return node
            axes = (0,) if w.ndim == 2 else (0, 1, 2)
            out = {k: v for k, v in node.items() if k != "weight"}
            wq, scale = quantize_weight(w, axes)
            out["weight_int8"] = wq
            leaf_mode = mode
            if mode == "w8a8" and w.shape[-1] < a8_min_out:
                leaf_mode = "w8"
            out[f"{leaf_mode}_scale"] = scale
            return out
        if isinstance(node, dict):
            return {k: walk(v, path + [str(k)]) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v, path + [str(i)]) for i, v in enumerate(node))
        return node

    return walk(tree, [])
