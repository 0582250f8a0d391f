"""MM-DiT (SD3Transformer2DModel) — pure functional, NHWC latents.

Beyond-parity model family (the reference repo is SD1.5/SDXL only).  The
param tree mirrors diffusers' SD3Transformer2DModel checkpoint keys so
sd3-family `transformer/` folders load through the standard converter
(io/torch_convert): pos_embed.{proj,pos_embed}, time_text_embed.{timestep_
embedder,text_embedder}, context_embedder, transformer_blocks.N.{norm1,
norm1_context,attn,ff,ff_context}, norm_out, proj_out.

Architecture (arXiv 2403.03206): two streams (patchified image tokens and
projected text tokens) with per-stream adaLN-Zero modulation from
timestep+pooled-text embeddings, JOINT self-attention over the concatenated
[image; text] sequence, per-stream gated MLPs; the final block drops the
text-stream output (context_pre_only); AdaLN-continuous final norm ->
linear -> unpatchify.  Optional QK-RMSNorm (SD3.5).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from stablediffusion_tpu.core.config import SD3Config
from stablediffusion_tpu.ops import attention, conv2d, layer_norm, linear, silu
from stablediffusion_tpu.ops import timestep_embedding


def _ln_noaffine(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _rms_norm(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    out = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (out * p["weight"].astype(jnp.float32)).astype(x.dtype)


def _modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return _ln_noaffine(x) * (1.0 + scale[:, None]) + shift[:, None]


def _ff(p: dict, x: jax.Array) -> jax.Array:
    """diffusers FeedForward(activation_fn="gelu-approximate"):
    net.0.proj -> tanh-gelu -> net.2."""
    h = linear(p["net"]["0"]["proj"], x)
    h = jax.nn.gelu(h, approximate=True)
    return linear(p["net"]["2"], h)


def _joint_attention(
    p: dict,
    x: jax.Array,  # [B, S_img, D] modulated image tokens
    ctx: jax.Array,  # [B, S_txt, D] modulated text tokens
    config: SD3Config,
    context_pre_only: bool,
):
    B, S, _ = x.shape
    St = ctx.shape[1]
    H, hd = config.num_attention_heads, config.attention_head_dim

    q = linear(p["to_q"], x).reshape(B, S, H, hd)
    k = linear(p["to_k"], x).reshape(B, S, H, hd)
    v = linear(p["to_v"], x).reshape(B, S, H, hd)
    qc = linear(p["add_q_proj"], ctx).reshape(B, St, H, hd)
    kc = linear(p["add_k_proj"], ctx).reshape(B, St, H, hd)
    vc = linear(p["add_v_proj"], ctx).reshape(B, St, H, hd)
    if config.qk_norm == "rms_norm":
        q = _rms_norm(p["norm_q"], q)
        k = _rms_norm(p["norm_k"], k)
        qc = _rms_norm(p["norm_added_q"], qc)
        kc = _rms_norm(p["norm_added_k"], kc)

    # image tokens first, then context (diffusers JointAttnProcessor order)
    q = jnp.concatenate([q, qc], axis=1)
    k = jnp.concatenate([k, kc], axis=1)
    v = jnp.concatenate([v, vc], axis=1)
    o = attention(q, k, v).reshape(B, S + St, H * hd)
    o_img, o_ctx = o[:, :S], o[:, S:]
    out_img = linear(p["to_out"]["0"], o_img)
    out_ctx = None
    if not context_pre_only:
        out_ctx = linear(p["to_add_out"], o_ctx)
    return out_img, out_ctx


def _image_self_attention(p: dict, x: jax.Array, config: SD3Config):
    """MMDiT-X attn2: plain self-attention over the image stream only
    (diffusers JointTransformerBlock use_dual_attention branch)."""
    B, S, _ = x.shape
    H, hd = config.num_attention_heads, config.attention_head_dim
    q = linear(p["to_q"], x).reshape(B, S, H, hd)
    k = linear(p["to_k"], x).reshape(B, S, H, hd)
    v = linear(p["to_v"], x).reshape(B, S, H, hd)
    if config.qk_norm == "rms_norm":
        q = _rms_norm(p["norm_q"], q)
        k = _rms_norm(p["norm_k"], k)
    o = attention(q, k, v).reshape(B, S, H * hd)
    return linear(p["to_out"]["0"], o)


def _joint_block(
    p: dict,
    x: jax.Array,
    ctx: jax.Array,
    temb: jax.Array,  # [B, D]
    config: SD3Config,
    context_pre_only: bool,
    dual: bool = False,
):
    mod = linear(p["norm1"]["linear"], silu(temb))
    if dual:
        # AdaLayerNormZeroX: 9 chunks, the extra 3 modulate/gate attn2
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp,
         sh_msa2, sc_msa2, g_msa2) = jnp.split(mod, 9, axis=-1)
        x_n2 = _modulate(x, sh_msa2, sc_msa2)
    else:
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(
            mod, 6, axis=-1
        )
    x_n = _modulate(x, sh_msa, sc_msa)

    if context_pre_only:
        # AdaLayerNormContinuous on the text stream of the LAST block
        cmod = linear(p["norm1_context"]["linear"], silu(temb))
        c_sc, c_sh = jnp.split(cmod, 2, axis=-1)
        ctx_n = _ln_noaffine(ctx) * (1.0 + c_sc[:, None]) + c_sh[:, None]
    else:
        cmod = linear(p["norm1_context"]["linear"], silu(temb))
        c_sh_msa, c_sc_msa, c_g_msa, c_sh_mlp, c_sc_mlp, c_g_mlp = jnp.split(
            cmod, 6, axis=-1
        )
        ctx_n = _modulate(ctx, c_sh_msa, c_sc_msa)

    attn_img, attn_ctx = _joint_attention(
        p["attn"], x_n, ctx_n, config, context_pre_only
    )
    x = x + g_msa[:, None] * attn_img
    if dual:
        x = x + g_msa2[:, None] * _image_self_attention(p["attn2"], x_n2, config)
    x = x + g_mlp[:, None] * _ff(p["ff"], _modulate(x, sh_mlp, sc_mlp))

    if context_pre_only:
        return x, None
    ctx = ctx + c_g_msa[:, None] * attn_ctx
    ctx = ctx + c_g_mlp[:, None] * _ff(
        p["ff_context"], _modulate(ctx, c_sh_mlp, c_sc_mlp)
    )
    return x, ctx


def _cropped_pos_embed(pos_embed: jax.Array, h: int, w: int, max_size: int):
    """PatchEmbed.cropped_pos_embed: take the centered h x w window of the
    stored max_size x max_size grid."""
    top = (max_size - h) // 2
    left = (max_size - w) // 2
    grid = pos_embed.reshape(1, max_size, max_size, -1)
    return grid[:, top : top + h, left : left + w].reshape(1, h * w, -1)


def apply(
    params: dict,
    config: SD3Config,
    hidden_states: jax.Array,  # [B, H, W, C] NHWC latent
    timestep: jax.Array,  # [] or [B] flow timestep (sigma * T)
    encoder_hidden_states: jax.Array,  # [B, S_txt, joint_attention_dim]
    pooled_projections: jax.Array,  # [B, pooled_projection_dim]
) -> jax.Array:
    B, H, W, _ = hidden_states.shape
    p_sz = config.patch_size
    h, w = H // p_sz, W // p_sz
    dtype = hidden_states.dtype

    if timestep.ndim == 0:
        timestep = jnp.broadcast_to(timestep, (B,))

    # patchify + positional embedding
    pe = params["pos_embed"]
    x = conv2d(pe["proj"], hidden_states, stride=p_sz, padding=0)
    x = x.reshape(B, h * w, config.dim)
    x = x + _cropped_pos_embed(
        pe["pos_embed"], h, w, config.pos_embed_max_size
    ).astype(dtype)

    # timestep + pooled-text conditioning
    tte = params["time_text_embed"]
    t_freq = timestep_embedding(
        timestep, 256, flip_sin_to_cos=True, freq_shift=0
    ).astype(dtype)
    te = tte["timestep_embedder"]
    t_emb = linear(te["linear_2"], silu(linear(te["linear_1"], t_freq)))
    xe = tte["text_embedder"]
    pooled = pooled_projections.astype(dtype)
    p_emb = linear(xe["linear_2"], silu(linear(xe["linear_1"], pooled)))
    temb = t_emb + p_emb

    ctx = linear(params["context_embedder"], encoder_hidden_states.astype(dtype))

    for i in range(config.num_layers):
        bp = params["transformer_blocks"][str(i)]
        x, ctx = _joint_block(
            bp, x, ctx, temb, config,
            context_pre_only=(i == config.num_layers - 1),
            dual=(i in config.dual_attention_layers),
        )

    # final AdaLN-continuous + projection
    no = params["norm_out"]
    mod = linear(no["linear"], silu(temb))
    scale, shift = jnp.split(mod, 2, axis=-1)
    x = _ln_noaffine(x) * (1.0 + scale[:, None]) + shift[:, None]
    x = linear(params["proj_out"], x)

    # unpatchify -> NHWC
    x = x.reshape(B, h, w, p_sz, p_sz, config.out_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, config.out_channels)
    return x


# ---------------------------------------------------------------------------
# init (tests / torch-mirror parity)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, config: SD3Config, dtype=jnp.float32) -> dict:
    k = iter(jax.random.split(key, 100_000))
    D = config.dim

    def lin(ci, co, bias=True, scale=0.02):
        p = {"weight": jax.random.normal(next(k), (ci, co), dtype) * scale}
        if bias:
            p["bias"] = jnp.zeros((co,), dtype)
        return p

    def norm(c):
        return {"weight": jnp.ones((c,), dtype)}

    def attn_p():
        p = {
            "to_q": lin(D, D),
            "to_k": lin(D, D),
            "to_v": lin(D, D),
            "add_q_proj": lin(D, D),
            "add_k_proj": lin(D, D),
            "add_v_proj": lin(D, D),
            "to_out": {"0": lin(D, D)},
            "to_add_out": lin(D, D),
        }
        if config.qk_norm == "rms_norm":
            hd = config.attention_head_dim
            p.update(
                norm_q=norm(hd), norm_k=norm(hd),
                norm_added_q=norm(hd), norm_added_k=norm(hd),
            )
        return p

    def attn2_p():
        p = {
            "to_q": lin(D, D),
            "to_k": lin(D, D),
            "to_v": lin(D, D),
            "to_out": {"0": lin(D, D)},
        }
        if config.qk_norm == "rms_norm":
            hd = config.attention_head_dim
            p.update(norm_q=norm(hd), norm_k=norm(hd))
        return p

    def block(last, dual):
        p = {
            "norm1": {"linear": lin(D, (9 if dual else 6) * D)},
            "norm1_context": {
                "linear": lin(D, 2 * D if last else 6 * D)
            },
            "attn": attn_p(),
            "ff": {"net": {"0": {"proj": lin(D, 4 * D)}, "2": lin(4 * D, D)}},
        }
        if dual:
            p["attn2"] = attn2_p()
        if last:
            p["attn"].pop("to_add_out")
        else:
            p["ff_context"] = {
                "net": {"0": {"proj": lin(D, 4 * D)}, "2": lin(4 * D, D)}
            }
        return p

    ps = config.patch_size
    m = config.pos_embed_max_size
    return {
        "pos_embed": {
            "proj": {
                "weight": jax.random.normal(
                    next(k), (ps, ps, config.in_channels, D), dtype
                )
                * 0.02,
                "bias": jnp.zeros((D,), dtype),
            },
            "pos_embed": jax.random.normal(next(k), (1, m * m, D), dtype) * 0.02,
        },
        "time_text_embed": {
            "timestep_embedder": {
                "linear_1": lin(256, D),
                "linear_2": lin(D, D),
            },
            "text_embedder": {
                "linear_1": lin(config.pooled_projection_dim, D),
                "linear_2": lin(D, D),
            },
        },
        "context_embedder": lin(config.joint_attention_dim, D),
        "transformer_blocks": {
            str(i): block(
                i == config.num_layers - 1,
                i in config.dual_attention_layers,
            )
            for i in range(config.num_layers)
        },
        "norm_out": {"linear": lin(D, 2 * D)},
        "proj_out": lin(D, ps * ps * config.out_channels),
    }
