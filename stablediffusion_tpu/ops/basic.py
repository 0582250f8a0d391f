"""Primitive NN ops over plain param dicts.

Conventions (TPU-canonical layouts, converted once at checkpoint load):
  * activations are NHWC (channels-last — the TPU conv layout);
  * conv kernels are HWIO;
  * linear kernels are (in, out);
  * norm statistics and softmax run in fp32 regardless of compute dtype.

The reference gets these from torch/diffusers CUDA kernels (SURVEY.md §2.9
D1/D2); here they are XLA ops shaped so the compiler fuses elementwise chains
into the surrounding matmuls/convs, with the long-KV Pallas attention kernel
layered on in ops/flash_attention.py.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp


def linear(params: dict, x: jax.Array) -> jax.Array:
    """x [..., in] @ weight [in, out] + bias."""
    if "weight_int8" in params:  # quantized tree (ops/quant.py, opt-in)
        from stablediffusion_tpu.ops.quant import int8_linear

        return int8_linear(params, x)
    w = params["weight"]
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv2d(
    params: dict,
    x: jax.Array,
    stride: int = 1,
    padding: int | str = "SAME",
) -> jax.Array:
    """NHWC conv with HWIO kernel."""
    if "weight_int8" in params:  # quantized tree (ops/quant.py, opt-in)
        from stablediffusion_tpu.ops.quant import int8_conv2d

        return int8_conv2d(params, x, stride=stride, padding=padding)
    w = params["weight"].astype(x.dtype)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _group_onehot(C: int, G: int):
    # fresh constant per trace (caching a device array across jit traces
    # raises UnexpectedTracerError); XLA constant-folds it
    import numpy as np

    return jnp.asarray(np.repeat(np.eye(G, dtype=np.float32), C // G, axis=0))


def group_norm(
    params: dict, x: jax.Array, num_groups: int, eps: float = 1e-5
) -> jax.Array:
    """GroupNorm over NHWC (stats in fp32).

    v5e profiling history (benchmarks/profile_trace.py, SD1.5 batch-16):
      * naive mean-then-var: two dependent reduction passes, ~23% of a UNet
        step;
      * one-pass E[x^2]-E[x]^2 via jnp.mean over (H, W, C/G): better, but the
        C/G-wide lane-group reduction runs at ~8% of HBM bandwidth on the VPU
        (cross-lane reduce), still ~25 ms/step;
      * here: group sums as matmuls against a constant [C, G] one-hot
        membership matrix — the reduction rides the MXU, the spatial sum is a
        cheap sublane reduce."""
    B, H, W, C = x.shape
    G = num_groups
    onehot = _group_onehot(C, G)
    xf = x.reshape(B, H * W, C).astype(jnp.float32)
    # [B, HW, C] @ [C, G] -> sum over channels-in-group, then over space
    s1 = jnp.einsum("bsc,cg->bg", xf, onehot, preferred_element_type=jnp.float32)
    s2 = jnp.einsum(
        "bsc,cg->bg", xf * xf, onehot, preferred_element_type=jnp.float32
    )
    n = H * W * (C // G)
    mean_g = s1 / n
    var_g = jnp.maximum(s2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # back to per-channel via the transposed one-hot (also MXU)
    mean_c = jnp.einsum("bg,cg->bc", mean_g, onehot)[:, None, None, :]
    rstd_c = jnp.einsum("bg,cg->bc", rstd_g, onehot)[:, None, None, :]
    gamma = params["weight"].astype(jnp.float32)
    beta = params["bias"].astype(jnp.float32)
    alpha = rstd_c * gamma
    shift = beta - mean_c * alpha
    out = x.astype(jnp.float32) * alpha + shift
    return out.astype(x.dtype)


def group_norm_silu(
    params: dict, x: jax.Array, num_groups: int, eps: float = 1e-5
) -> jax.Array:
    """GroupNorm followed by SiLU — the resnet prologue.

    Negative result (v5e, rounds 1-3): a hand-fused Pallas GN+SiLU kernel
    saved only ~1 ms/step of HBM traffic over this XLA formulation (whose
    stats already ride the MXU via one-hot matmuls) and its compile hung at
    SD L1 sizes through the remote-compile tunnel — deleted in round 3
    rather than shipped opt-in-dead (VERDICT r2 item 7)."""
    return silu(group_norm(params, x, num_groups, eps))


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with stats computed via a ones-matmul: the feature axis is
    the TPU lane dimension, where VPU cross-lane reductions are slow — a
    [.., C] @ [C, 1] dot puts the reduction on the MXU instead (same
    profiling rationale as group_norm)."""
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    ones = jnp.ones((C, 1), jnp.float32)
    mean = jnp.dot(xf, ones, preferred_element_type=jnp.float32) / C
    mean2 = jnp.dot(xf * xf, ones, preferred_element_type=jnp.float32) / C
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "weight" in params:
        out = out * params["weight"].astype(jnp.float32)
    if "bias" in params and params["bias"] is not None:
        out = out + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — OpenAI CLIP's activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(params: dict, x: jax.Array) -> jax.Array:
    """GEGLU feed-forward gate (diffusers FeedForward 'geglu'): one projection
    to 2*d_ff, split, x * gelu(gate)."""
    h = linear(params, x)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * gelu(gate)


ACTIVATIONS = {"silu": silu, "gelu": gelu, "quick_gelu": quick_gelu}


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jax.Array:
    """Sinusoidal timestep embedding (SD convention: half sin / half cos,
    flip_sin_to_cos=True gives [cos, sin] ordering)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """NHWC nearest-neighbor 2x (UNet/VAE upsampler)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def interpolate_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """NHWC nearest-neighbor resize to (out_h, out_w) — mask downsampling to
    latent resolution (ref: sd_unified_pipeline.py:916-976)."""
    B, H, W, C = x.shape
    rows = (jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    cols = (jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[:, rows][:, :, cols]
