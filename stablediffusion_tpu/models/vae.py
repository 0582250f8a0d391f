"""AutoencoderKL VAE — pure functional, NHWC.

The reference binds diffusers' AutoencoderKL (models/stable_diffusion.py:
113-116), encodes at sd_unified_pipeline.py:1017-1041 (with the force_upcast
fp32 policy) and decodes at :511-523.  Param tree mirrors the diffusers
checkpoint key structure (encoder.down_blocks.N.resnets.M.conv1 ...), with
kernels in canonical HWIO/(in,out) layouts.

Structure notes (diffusers AutoencoderKL):
  * encoder down blocks: `layers_per_block` resnets + strided conv downsample
    with asymmetric (0,1),(0,1) padding;
  * decoder up blocks: `layers_per_block + 1` resnets + nearest-2x upsample
    followed by conv;
  * mid blocks: resnet / single-head full-channel attention / resnet;
  * encode emits a DiagonalGaussian (mean, logvar) through quant_conv.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stablediffusion_tpu.core.config import VAEConfig
from stablediffusion_tpu.ops import (
    attention,
    conv2d,
    group_norm,
    group_norm_silu,
    linear,
    silu,
    upsample_nearest_2x,
)


def _resnet(p: dict, x: jax.Array, groups: int, eps: float) -> jax.Array:
    h = group_norm_silu(p["norm1"], x, groups, eps)
    h = conv2d(p["conv1"], h, padding=1)
    h = group_norm_silu(p["norm2"], h, groups, eps)
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _mid_attention(p: dict, x: jax.Array, groups: int, eps: float) -> jax.Array:
    B, H, W, C = x.shape
    h = group_norm(p["group_norm"], x, groups, eps)
    h = h.reshape(B, H * W, C)
    q = linear(p["to_q"], h)[:, :, None, :]  # single head, head_dim = C
    k = linear(p["to_k"], h)[:, :, None, :]
    v = linear(p["to_v"], h)[:, :, None, :]
    o = attention(q, k, v)[:, :, 0, :]
    o = linear(p["to_out"]["0"], o)
    return x + o.reshape(B, H, W, C)


def _mid_block(p: dict, x: jax.Array, groups: int, eps: float) -> jax.Array:
    x = _resnet(p["resnets"]["0"], x, groups, eps)
    x = _mid_attention(p["attentions"]["0"], x, groups, eps)
    x = _resnet(p["resnets"]["1"], x, groups, eps)
    return x


def encode(
    params: dict, config: VAEConfig, image: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """image NHWC in [-1, 1] -> (mean, logvar), each [B, h/8, w/8, latent_ch]."""
    p = params["encoder"]
    g, eps = config.norm_num_groups, config.norm_eps
    x = conv2d(p["conv_in"], image, padding=1)
    n_blocks = len(config.block_out_channels)
    for i in range(n_blocks):
        bp = p["down_blocks"][str(i)]
        for j in range(config.layers_per_block):
            x = _resnet(bp["resnets"][str(j)], x, g, eps)
        if i < n_blocks - 1:
            # asymmetric pad then stride-2 valid conv (diffusers Downsample2D
            # with padding=0 in the VAE encoder)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(bp["downsamplers"]["0"]["conv"], x, stride=2, padding="VALID")
    x = _mid_block(p["mid_block"], x, g, eps)
    x = group_norm_silu(p["conv_norm_out"], x, g, eps)
    x = conv2d(p["conv_out"], x, padding=1)
    # SD3-family VAEs have use_quant_conv=False (no quant convs in the ckpt)
    moments = (
        conv2d(params["quant_conv"], x, padding=0)
        if "quant_conv" in params
        else x
    )
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample_latent(mean: jax.Array, logvar: jax.Array, key: jax.Array) -> jax.Array:
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def decode(params: dict, config: VAEConfig, latents: jax.Array) -> jax.Array:
    """latents NHWC [B, h, w, latent_ch] -> image NHWC in [-1, 1] range."""
    p = params["decoder"]
    g, eps = config.norm_num_groups, config.norm_eps
    x = (
        conv2d(params["post_quant_conv"], latents, padding=0)
        if "post_quant_conv" in params
        else latents
    )
    x = conv2d(p["conv_in"], x, padding=1)
    x = _mid_block(p["mid_block"], x, g, eps)
    n_blocks = len(config.block_out_channels)
    for i in range(n_blocks):
        bp = p["up_blocks"][str(i)]
        for j in range(config.layers_per_block + 1):
            x = _resnet(bp["resnets"][str(j)], x, g, eps)
        if i < n_blocks - 1:
            x = upsample_nearest_2x(x)
            x = conv2d(bp["upsamplers"]["0"]["conv"], x, padding=1)
    x = group_norm_silu(p["conv_norm_out"], x, g, eps)
    return conv2d(p["conv_out"], x, padding=1)


# ---------------------------------------------------------------------------
# init (tests)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, config: VAEConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 4096))

    def conv(ci, co, k=3):
        return {
            "weight": jax.random.normal(next(keys), (k, k, ci, co), dtype)
            * (0.3 / (k * (ci**0.5))),
            "bias": jnp.zeros((co,), dtype),
        }

    def lin(ci, co):
        return {
            "weight": jax.random.normal(next(keys), (ci, co), dtype) * (ci**-0.5),
            "bias": jnp.zeros((co,), dtype),
        }

    def norm(c):
        return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def resnet(ci, co):
        p = {
            "norm1": norm(ci),
            "conv1": conv(ci, co),
            "norm2": norm(co),
            "conv2": conv(co, co),
        }
        if ci != co:
            p["conv_shortcut"] = conv(ci, co, k=1)
        return p

    def mid(c):
        return {
            "resnets": {"0": resnet(c, c), "1": resnet(c, c)},
            "attentions": {
                "0": {
                    "group_norm": norm(c),
                    "to_q": lin(c, c),
                    "to_k": lin(c, c),
                    "to_v": lin(c, c),
                    "to_out": {"0": lin(c, c)},
                }
            },
        }

    ch = config.block_out_channels
    L = config.layers_per_block
    lc = config.latent_channels

    enc_blocks = {}
    c_in = ch[0]
    for i, c in enumerate(ch):
        b = {"resnets": {}}
        for j in range(L):
            b["resnets"][str(j)] = resnet(c_in if j == 0 else c, c)
        if i < len(ch) - 1:
            b["downsamplers"] = {"0": {"conv": conv(c, c)}}
        enc_blocks[str(i)] = b
        c_in = c

    dec_ch = tuple(reversed(ch))
    dec_blocks = {}
    c_in = dec_ch[0]
    for i, c in enumerate(dec_ch):
        b = {"resnets": {}}
        for j in range(L + 1):
            b["resnets"][str(j)] = resnet(c_in if j == 0 else c, c)
        if i < len(ch) - 1:
            b["upsamplers"] = {"0": {"conv": conv(c, c)}}
        dec_blocks[str(i)] = b
        c_in = c

    params = {
        "encoder": {
            "conv_in": conv(config.in_channels, ch[0]),
            "down_blocks": enc_blocks,
            "mid_block": mid(ch[-1]),
            "conv_norm_out": norm(ch[-1]),
            "conv_out": conv(ch[-1], 2 * lc),
        },
        "decoder": {
            "conv_in": conv(lc, ch[-1]),
            "mid_block": mid(ch[-1]),
            "up_blocks": dec_blocks,
            "conv_norm_out": norm(dec_ch[-1]),
            "conv_out": conv(dec_ch[-1], config.out_channels),
        },
    }
    if config.use_quant_conv:
        params["quant_conv"] = conv(2 * lc, 2 * lc, k=1)
    if config.use_post_quant_conv:
        params["post_quant_conv"] = conv(lc, lc, k=1)
    return params


# ---------------------------------------------------------------------------
# tiled decode/encode (diffusers enable_vae_tiling analog — AutoencoderKL
# .tiled_decode/.tiled_encode semantics, reshaped for the XLA compile model)
# ---------------------------------------------------------------------------


def _linear_blend(prev: jax.Array, cur: jax.Array, extent: int, axis: int):
    """Blend cur's leading `extent` rows/cols (axis 1=v, 2=h) against prev's
    trailing ones with a linear ramp (AutoencoderKL.blend_v/blend_h)."""
    ramp_shape = [1, 1, 1, 1]
    ramp_shape[axis] = extent
    ramp = (jnp.arange(extent, dtype=cur.dtype) / extent).reshape(ramp_shape)
    take = lambda arr, a, b: jax.lax.slice_in_dim(arr, a, b, axis=axis)
    prev_edge = take(prev, prev.shape[axis] - extent, prev.shape[axis])
    blended = prev_edge * (1.0 - ramp) + take(cur, 0, extent) * ramp
    return jnp.concatenate(
        [blended, take(cur, extent, cur.shape[axis])], axis=axis
    )


def _tiled_apply(fn, x, tile: int, out_tile: int, overlap: float):
    """Shared tiling driver: run `fn` over uniform [B, tile, tile, C] input
    windows with `overlap` fraction; fn outputs have spatial size
    `out_tile` (decode: tile*8; encode moments: tile/8).  Seams of the
    OUTPUTS are linear-blended, stitched, and cropped to the true output
    size.  Every window has the SAME shape — edge windows are edge-padded —
    so exactly ONE program is compiled (ragged diffusers-style edge tiles
    would each pay a multi-minute remote compile here)."""
    B, H, W, C = x.shape
    b_in = int(tile * overlap)
    # the input stride and the output row_limit must describe the SAME
    # geometry or stitching duplicates/shifts bands at every seam; that
    # requires the blend extent to scale exactly between the two domains
    if b_in <= 0 or b_in >= tile or (b_in * out_tile) % tile != 0:
        raise ValueError(
            f"tile={tile}, out_tile={out_tile}, overlap={overlap}: "
            "tile*overlap must be a positive integer < tile whose scaled "
            "extent (tile*overlap*out_tile/tile) is integral"
        )
    stride = tile - b_in
    blend = b_in * out_tile // tile
    row_limit = out_tile - blend  # == stride scaled to output units
    n_i = -(-H // stride)
    n_j = -(-W // stride)
    Hp = (n_i - 1) * stride + tile
    Wp = (n_j - 1) * stride + tile
    if Hp != H or Wp != W:
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")

    rows = []
    for i in range(n_i):
        row = []
        for j in range(n_j):
            t = jax.lax.dynamic_slice(
                x, (0, i * stride, j * stride, 0), (B, tile, tile, C)
            )
            row.append(fn(t))
        rows.append(row)

    out_rows = []
    for i, row in enumerate(rows):
        pieces = []
        for j, t in enumerate(row):
            if i > 0:
                t = _linear_blend(rows[i - 1][j], t, blend, axis=1)
            if j > 0:
                # blend against the RAW left tile (diffusers blend_h uses
                # row[j-1], not the already vertically-blended piece)
                t = _linear_blend(row[j - 1], t, blend, axis=2)
            pieces.append(t)
        out_rows.append(
            jnp.concatenate(
                [p[:, :row_limit, :row_limit] for p in pieces], axis=2
            )
        )
    out = jnp.concatenate(out_rows, axis=1)
    return out[:, : H * out_tile // tile, : W * out_tile // tile]


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("config",))
def _decode_jit(params, latents, *, config: VAEConfig):
    """Per-tile decode program: module-level jit so the cache persists
    across tiled_decode calls, with params passed as arguments (a
    params-closing partial would bake them in as HLO constants — the
    never-finishing-remote-compile pattern CLAUDE.md forbids)."""
    return decode(params, config, latents)


@_functools.partial(jax.jit, static_argnames=("config",))
def _encode_moments_jit(params, pixels, *, config: VAEConfig):
    mean, logvar = encode(params, config, pixels)
    return jnp.concatenate([mean, logvar], axis=-1)


def tiled_decode(
    params: dict,
    config: VAEConfig,
    latents: jax.Array,
    tile_latent: int = 64,
    overlap: float = 0.25,
) -> jax.Array:
    """`decode` in overlapping tiles with seam blending.  At 2048² the full
    decoder holds [B, 2048, 2048, C]-scale activations and a 65536-token
    mid-block attention — tiling bounds both to the 512px-tile cost (~25
    sequential tile programs at 2048²), at the price of receptive-field
    truncation at seams (hidden by the blend, same trade diffusers makes)."""
    B, H, W, C = latents.shape
    if H <= tile_latent and W <= tile_latent:
        return decode(params, config, latents)
    vf = config.vae_scale_factor
    return _tiled_apply(
        lambda t: _decode_jit(params, t, config=config),
        latents, tile_latent, tile_latent * vf, overlap,
    )


def tiled_encode(
    params: dict,
    config: VAEConfig,
    pixels: jax.Array,
    tile_sample: int = 512,
    overlap: float = 0.25,
) -> Tuple[jax.Array, jax.Array]:
    """`encode` in overlapping pixel tiles; moment maps are seam-blended in
    latent space (AutoencoderKL.tiled_encode semantics).  Returns
    (mean, logvar) like `encode`."""
    B, H, W, C = pixels.shape
    if H <= tile_sample and W <= tile_sample:
        return encode(params, config, pixels)
    vf = config.vae_scale_factor
    out = _tiled_apply(
        lambda t: _encode_moments_jit(params, t, config=config),
        pixels, tile_sample, tile_sample // vf, overlap,
    )
    return jnp.split(out, 2, axis=-1)
