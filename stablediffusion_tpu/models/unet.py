"""UNet2DCondition (SD1.5 / SD1.5-inpaint 9ch / SDXL) — pure functional, NHWC.

The reference binds diffusers' UNet2DConditionModel
(models/stable_diffusion.py:117-123), calls it in the denoise hot loop
(sd_unified_pipeline.py:475-482) with SDXL added_cond_kwargs
{text_embeds, time_ids} (:430-433).  Param tree mirrors the diffusers
checkpoint key structure; kernels in canonical HWIO/(in,out) layouts.

Structure (diffusers UNet2DConditionModel):
  * down blocks: `layers_per_block` resnets (+paired Transformer2D for
    cross-attn blocks) + stride-2 conv downsample (except last block);
  * mid: resnet / Transformer2D / resnet;
  * up blocks: `layers_per_block + 1` resnets consuming skip concats
    (+Transformer2D) + nearest-2x upsample conv (except last);
  * Transformer2D: groupnorm -> proj_in (conv1x1 for SD1.x, linear for SDXL)
    -> BasicTransformerBlocks (self-attn, cross-attn, GEGLU ff) -> proj_out;
  * time: sinusoidal -> 2-layer MLP; SDXL adds text_time micro-conditioning
    (pooled embeds ++ per-element 256-dim sinusoids of 6 add_time_ids).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from stablediffusion_tpu.core.config import UNetConfig
from stablediffusion_tpu.ops import (
    attention,
    conv2d,
    geglu,
    group_norm,
    group_norm_silu,
    layer_norm,
    linear,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _resnet(p: dict, x: jax.Array, temb: jax.Array, groups: int, eps: float):
    h = group_norm_silu(p["norm1"], x, groups, eps)
    h = conv2d(p["conv1"], h, padding=1)
    t = linear(p["time_emb_proj"], silu(temb))
    h = h + t[:, None, None, :]
    h = group_norm_silu(p["norm2"], h, groups, eps)
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _attn(p: dict, x: jax.Array, ctx: jax.Array, heads: int,
          ip_ctx: Optional[jax.Array] = None, ip_scale=None):
    """Cross/self attention.  When the params carry fused IP-Adapter
    projections (`to_k_ip`/`to_v_ip`) and image tokens are provided, adds the
    decoupled image-attention stream scaled by `ip_scale` (IP-Adapter,
    arXiv 2308.06721 — diffusers IPAdapterAttnProcessor semantics; the
    reference repo has no image-prompt path)."""
    B, S, C = x.shape
    d = C // heads
    q = linear(p["to_q"], x).reshape(B, S, heads, d)
    k = linear(p["to_k"], ctx).reshape(B, ctx.shape[1], heads, d)
    v = linear(p["to_v"], ctx).reshape(B, ctx.shape[1], heads, d)
    o = attention(q, k, v).reshape(B, S, C)
    if ip_ctx is not None and "to_k_ip" in p:
        k_ip = linear(p["to_k_ip"], ip_ctx).reshape(B, ip_ctx.shape[1], heads, d)
        v_ip = linear(p["to_v_ip"], ip_ctx).reshape(B, ip_ctx.shape[1], heads, d)
        o_ip = attention(q, k_ip, v_ip).reshape(B, S, C)
        scale = jnp.asarray(ip_scale if ip_scale is not None else 1.0, o.dtype)
        o = o + scale * o_ip
    return linear(p["to_out"]["0"], o)


def _transformer_block(p: dict, x: jax.Array, ctx: jax.Array, heads: int,
                       ip_ctx: Optional[jax.Array] = None, ip_scale=None,
                       perturb_self: bool = False):
    h = layer_norm(p["norm1"], x)
    if perturb_self:
        # PAG (arXiv 2403.17377): replace the self-attention map with
        # identity — each token attends only to itself, so the attention
        # output collapses to to_out(to_v(h))
        x = x + linear(p["attn1"]["to_out"]["0"], linear(p["attn1"]["to_v"], h))
    else:
        x = x + _attn(p["attn1"], h, h, heads)
    x = x + _attn(p["attn2"], layer_norm(p["norm2"], x), ctx, heads,
                  ip_ctx=ip_ctx, ip_scale=ip_scale)
    h = layer_norm(p["norm3"], x)
    h = geglu(p["ff"]["net"]["0"]["proj"], h)
    x = x + linear(p["ff"]["net"]["2"], h)
    return x


def _transformer2d(
    p: dict,
    x: jax.Array,
    ctx: jax.Array,
    heads: int,
    n_layers: int,
    use_linear_projection: bool,
    groups: int = 32,
    ip_ctx: Optional[jax.Array] = None,
    ip_scale=None,
    perturb_self: bool = False,
):
    B, H, W, C = x.shape
    residual = x
    h = group_norm(p["norm"], x, groups, eps=1e-6)
    if use_linear_projection:
        h = h.reshape(B, H * W, C)
        h = linear(p["proj_in"], h)
    else:
        h = conv2d(p["proj_in"], h, padding=0)
        h = h.reshape(B, H * W, C)
    for i in range(n_layers):
        h = _transformer_block(p["transformer_blocks"][str(i)], h, ctx, heads,
                               ip_ctx=ip_ctx, ip_scale=ip_scale,
                               perturb_self=perturb_self)
    if use_linear_projection:
        h = linear(p["proj_out"], h)
        h = h.reshape(B, H, W, C)
    else:
        h = h.reshape(B, H, W, C)
        h = conv2d(p["proj_out"], h, padding=0)
    return h + residual


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def apply(
    params: dict,
    config: UNetConfig,
    sample: jax.Array,  # [B, H, W, C_in] latent (NHWC)
    timesteps: jax.Array,  # [] or [B]
    encoder_hidden_states: jax.Array,  # [B, S, cross_attention_dim]
    added_cond: Optional[Dict[str, jax.Array]] = None,  # SDXL {text_embeds, time_ids}
    deep_cache: Optional[jax.Array] = None,
    return_deep_cache: bool = False,
    down_block_residuals: Optional[List[jax.Array]] = None,
    mid_block_residual: Optional[jax.Array] = None,
    ip_hidden_states: Optional[jax.Array] = None,  # [B, n_tokens, cross_dim]
    ip_scale=None,
    freeu: Optional[tuple] = None,  # (b1, b2, s1, s2) static — ops/freeu.py
    pag_perturb: Optional[tuple] = None,  # static subset of ("down","mid","up"):
    #   replace self-attention with identity in those groups (PAG branch)
):
    """Forward pass.

    DeepCache-style acceleration (arXiv 2312.03209 / 2312.09608 family;
    PAPERS.md): `return_deep_cache=True` additionally returns the feature map
    entering the LAST up block; passing it back as `deep_cache` on subsequent
    steps runs only the shallowest level (first down block + last up block),
    reusing the cached deep features — deep features change slowly across
    adjacent timesteps.  Opt-in; changes outputs slightly.

    ControlNet: `down_block_residuals` (one per skip) and
    `mid_block_residual` are added to the skip connections / mid output,
    matching diffusers' additional-residual semantics."""
    g, eps = config.norm_num_groups, config.norm_eps
    B = sample.shape[0]
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (B,))

    dtype = sample.dtype
    ctx = encoder_hidden_states.astype(dtype)

    # time embedding
    t_emb = timestep_embedding(
        timesteps,
        config.block_out_channels[0],
        flip_sin_to_cos=config.flip_sin_to_cos,
        freq_shift=config.freq_shift,
    ).astype(dtype)
    te = params["time_embedding"]
    emb = linear(te["linear_2"], silu(linear(te["linear_1"], t_emb)))

    if config.addition_embed_type == "text_time":
        assert added_cond is not None, "SDXL UNet needs added_cond text_embeds/time_ids"
        time_ids = added_cond["time_ids"]  # [B, 6]
        t_flat = timestep_embedding(
            time_ids.reshape(-1),
            config.addition_time_embed_dim,
            flip_sin_to_cos=config.flip_sin_to_cos,
            freq_shift=config.freq_shift,
        ).reshape(B, -1)
        add_embeds = jnp.concatenate(
            [added_cond["text_embeds"].astype(jnp.float32), t_flat], axis=-1
        ).astype(dtype)
        ae = params["add_embedding"]
        aug = linear(ae["linear_2"], silu(linear(ae["linear_1"], add_embeds)))
        emb = emb + aug

    # down
    x = conv2d(params["conv_in"], sample, padding=1)

    def _with_res(h, idx):
        if down_block_residuals is None:
            return h
        return h + down_block_residuals[idx].astype(h.dtype)

    skips: List[jax.Array] = [_with_res(x, 0)]
    n_blocks = len(config.block_out_channels)
    shallow_only = deep_cache is not None
    down_blocks = (
        list(enumerate(config.down_block_types))[:1]
        if shallow_only
        else list(enumerate(config.down_block_types))
    )
    for i, btype in down_blocks:
        bp = params["down_blocks"][str(i)]
        has_attn = btype == "CrossAttnDownBlock2D"
        for j in range(config.layers_per_block):
            x = _resnet(bp["resnets"][str(j)], x, emb, g, eps)
            if has_attn:
                x = _transformer2d(
                    bp["attentions"][str(j)],
                    x,
                    ctx,
                    config.heads_for_block(i),
                    config.tf_layers_for_block(i),
                    config.use_linear_projection,
                    g,
                    ip_ctx=ip_hidden_states,
                    ip_scale=ip_scale,
                    perturb_self=bool(pag_perturb) and "down" in pag_perturb,
                )
            skips.append(_with_res(x, len(skips)))
        if i < n_blocks - 1 and not shallow_only:
            x = conv2d(bp["downsamplers"]["0"]["conv"], x, stride=2, padding=1)
            skips.append(_with_res(x, len(skips)))

    deep_feature = None
    if shallow_only:
        x = deep_cache.astype(dtype)
        up_blocks = [(len(config.up_block_types) - 1,
                      config.up_block_types[-1])]
    else:
        # mid
        mp = params["mid_block"]
        x = _resnet(mp["resnets"]["0"], x, emb, g, eps)
        x = _transformer2d(
            mp["attentions"]["0"],
            x,
            ctx,
            config.heads_for_block(n_blocks - 1),
            config.tf_layers_for_block(n_blocks - 1),
            config.use_linear_projection,
            g,
            ip_ctx=ip_hidden_states,
            ip_scale=ip_scale,
            perturb_self=bool(pag_perturb) and "mid" in pag_perturb,
        )
        x = _resnet(mp["resnets"]["1"], x, emb, g, eps)
        if mid_block_residual is not None:
            x = x + mid_block_residual.astype(x.dtype)
        up_blocks = list(enumerate(config.up_block_types))

    # up
    for i, btype in up_blocks:
        if not shallow_only and i == len(config.up_block_types) - 1:
            deep_feature = x  # input to the last up block (the cache point)
        bp = params["up_blocks"][str(i)]
        has_attn = btype == "CrossAttnUpBlock2D"
        block_idx = n_blocks - 1 - i  # mirrored resolution index
        for j in range(config.layers_per_block + 1):
            skip = skips.pop()
            if freeu is not None and not shallow_only:
                from stablediffusion_tpu.ops.freeu import apply_freeu

                x, skip = apply_freeu(x, skip, i, freeu)
            x = jnp.concatenate([x, skip], axis=-1)
            x = _resnet(bp["resnets"][str(j)], x, emb, g, eps)
            if has_attn:
                x = _transformer2d(
                    bp["attentions"][str(j)],
                    x,
                    ctx,
                    config.heads_for_block(block_idx),
                    config.tf_layers_for_block(block_idx),
                    config.use_linear_projection,
                    g,
                    ip_ctx=ip_hidden_states,
                    ip_scale=ip_scale,
                    perturb_self=bool(pag_perturb) and "up" in pag_perturb,
                )
        if i < n_blocks - 1:
            x = upsample_nearest_2x(x)
            x = conv2d(bp["upsamplers"]["0"]["conv"], x, padding=1)

    x = group_norm_silu(params["conv_norm_out"], x, g, eps)
    out = conv2d(params["conv_out"], x, padding=1)
    if return_deep_cache:
        return out, deep_feature
    return out


# ---------------------------------------------------------------------------
# init (tests / training from scratch)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, config: UNetConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 100_000))

    def conv(ci, co, k=3):
        return {
            "weight": jax.random.normal(next(keys), (k, k, ci, co), dtype)
            * (0.3 / (k * ci**0.5)),
            "bias": jnp.zeros((co,), dtype),
        }

    def lin(ci, co, bias=True):
        p = {"weight": jax.random.normal(next(keys), (ci, co), dtype) * (ci**-0.5)}
        if bias:
            p["bias"] = jnp.zeros((co,), dtype)
        return p

    def norm(c):
        return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    temb_dim = config.time_embed_dim
    xdim = config.cross_attention_dim

    def resnet(ci, co):
        p = {
            "norm1": norm(ci),
            "conv1": conv(ci, co),
            "time_emb_proj": lin(temb_dim, co),
            "norm2": norm(co),
            "conv2": conv(co, co),
        }
        if ci != co:
            p["conv_shortcut"] = conv(ci, co, k=1)
        return p

    def tf_block(c):
        return {
            "norm1": norm(c),
            "attn1": {
                "to_q": lin(c, c, bias=False),
                "to_k": lin(c, c, bias=False),
                "to_v": lin(c, c, bias=False),
                "to_out": {"0": lin(c, c)},
            },
            "norm2": norm(c),
            "attn2": {
                "to_q": lin(c, c, bias=False),
                "to_k": lin(xdim, c, bias=False),
                "to_v": lin(xdim, c, bias=False),
                "to_out": {"0": lin(c, c)},
            },
            "norm3": norm(c),
            "ff": {"net": {"0": {"proj": lin(c, 8 * c)}, "2": lin(4 * c, c)}},
        }

    def transformer2d(c, n_layers):
        proj = lin(c, c) if config.use_linear_projection else conv(c, c, k=1)
        proj2 = lin(c, c) if config.use_linear_projection else conv(c, c, k=1)
        return {
            "norm": norm(c),
            "proj_in": proj,
            "transformer_blocks": {
                str(i): tf_block(c) for i in range(n_layers)
            },
            "proj_out": proj2,
        }

    ch = config.block_out_channels
    n_blocks = len(ch)
    L = config.layers_per_block

    down_blocks = {}
    c_in = ch[0]
    down_out_channels = [ch[0]]  # conv_in output
    for i, btype in enumerate(config.down_block_types):
        b: dict = {"resnets": {}}
        if btype == "CrossAttnDownBlock2D":
            b["attentions"] = {}
        for j in range(L):
            b["resnets"][str(j)] = resnet(c_in if j == 0 else ch[i], ch[i])
            if btype == "CrossAttnDownBlock2D":
                b["attentions"][str(j)] = transformer2d(
                    ch[i], config.tf_layers_for_block(i)
                )
            down_out_channels.append(ch[i])
        if i < n_blocks - 1:
            b["downsamplers"] = {"0": {"conv": conv(ch[i], ch[i])}}
            down_out_channels.append(ch[i])
        down_blocks[str(i)] = b
        c_in = ch[i]

    mid = {
        "resnets": {"0": resnet(ch[-1], ch[-1]), "1": resnet(ch[-1], ch[-1])},
        "attentions": {
            "0": transformer2d(ch[-1], config.tf_layers_for_block(n_blocks - 1))
        },
    }

    up_blocks = {}
    rev_ch = list(reversed(ch))
    prev_c = ch[-1]
    skip_stack = list(down_out_channels)
    for i, btype in enumerate(config.up_block_types):
        c = rev_ch[i]
        b = {"resnets": {}}
        if btype == "CrossAttnUpBlock2D":
            b["attentions"] = {}
        for j in range(L + 1):
            skip_c = skip_stack.pop()
            b["resnets"][str(j)] = resnet(prev_c + skip_c, c)
            if btype == "CrossAttnUpBlock2D":
                b["attentions"][str(j)] = transformer2d(
                    c, config.tf_layers_for_block(n_blocks - 1 - i)
                )
            prev_c = c
        if i < n_blocks - 1:
            b["upsamplers"] = {"0": {"conv": conv(c, c)}}
        up_blocks[str(i)] = b

    params = {
        "conv_in": conv(config.in_channels, ch[0]),
        "time_embedding": {
            "linear_1": lin(ch[0], temb_dim),
            "linear_2": lin(temb_dim, temb_dim),
        },
        "down_blocks": down_blocks,
        "mid_block": mid,
        "up_blocks": up_blocks,
        "conv_norm_out": norm(ch[0]),
        "conv_out": conv(ch[0], config.out_channels),
    }
    if config.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": lin(config.projection_class_embeddings_input_dim, temb_dim),
            "linear_2": lin(temb_dim, temb_dim),
        }
    return params
