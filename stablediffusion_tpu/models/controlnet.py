"""ControlNet — conditioning-residual network (Zhang et al. 2023).

The reference can only *convert* ControlNet checkpoints
(convert_from_A1111.py:714-755 / our io/a1111.convert_controlnet); here the
runtime is implemented too: the trunk reuses the UNet's down/mid blocks, a
conditioning embedder maps the control image (canny/pose/depth/...) to
latent-resolution features, and zero-initialized 1x1 convs emit per-skip and
mid residuals that the UNet adds during its up path.

Param tree mirrors diffusers ControlNetModel keys
(controlnet_cond_embedding.*, controlnet_down_blocks.N, controlnet_mid_block,
plus the shared UNet trunk keys), canonical layouts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from stablediffusion_tpu.core.config import UNetConfig
from stablediffusion_tpu.models.unet import _resnet, _transformer2d
from stablediffusion_tpu.ops import conv2d, linear, silu, timestep_embedding

# diffusers ControlNetConditioningEmbedding channel ladder
COND_EMBED_CHANNELS = (16, 32, 96, 256)


def _cond_embedding(p: dict, cond: jax.Array) -> jax.Array:
    """Control image [B, H, W, 3] (pixel res, [0,1]) -> [B, H/8, W/8, C0].
    conv_in -> 6 blocks (stride 2 on every second) -> zero-init conv_out."""
    h = silu(conv2d(p["conv_in"], cond, padding=1))
    n_blocks = len(COND_EMBED_CHANNELS) - 1  # 3 downsampling pairs
    for i in range(n_blocks * 2):
        stride = 2 if i % 2 == 1 else 1
        h = silu(conv2d(p["blocks"][str(i)], h, stride=stride, padding=1))
    return conv2d(p["conv_out"], h, padding=1)


def apply(
    params: dict,
    config: UNetConfig,
    sample: jax.Array,  # [B, h, w, 4] latent
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    cond_image: jax.Array,  # [B, 8h, 8w, 3] control image in [0, 1]
    conditioning_scale: float = 1.0,
    added_cond: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[List[jax.Array], jax.Array]:
    """-> (down_block_residuals (one per UNet skip), mid_residual)."""
    g, eps = config.norm_num_groups, config.norm_eps
    B = sample.shape[0]
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (B,))
    dtype = sample.dtype
    ctx = encoder_hidden_states.astype(dtype)

    t_emb = timestep_embedding(
        timesteps, config.block_out_channels[0],
        flip_sin_to_cos=config.flip_sin_to_cos, freq_shift=config.freq_shift,
    ).astype(dtype)
    te = params["time_embedding"]
    emb = linear(te["linear_2"], silu(linear(te["linear_1"], t_emb)))
    if config.addition_embed_type == "text_time" and added_cond is not None:
        time_ids = added_cond["time_ids"]
        t_flat = timestep_embedding(
            time_ids.reshape(-1), config.addition_time_embed_dim,
            flip_sin_to_cos=config.flip_sin_to_cos, freq_shift=config.freq_shift,
        ).reshape(B, -1)
        add_embeds = jnp.concatenate(
            [added_cond["text_embeds"].astype(jnp.float32), t_flat], axis=-1
        ).astype(dtype)
        ae = params["add_embedding"]
        emb = emb + linear(ae["linear_2"], silu(linear(ae["linear_1"], add_embeds)))

    x = conv2d(params["conv_in"], sample, padding=1)
    x = x + _cond_embedding(
        params["controlnet_cond_embedding"], cond_image.astype(dtype)
    )

    skips: List[jax.Array] = [x]
    n_blocks = len(config.block_out_channels)
    for i, btype in enumerate(config.down_block_types):
        bp = params["down_blocks"][str(i)]
        has_attn = btype == "CrossAttnDownBlock2D"
        for j in range(config.layers_per_block):
            x = _resnet(bp["resnets"][str(j)], x, emb, g, eps)
            if has_attn:
                x = _transformer2d(
                    bp["attentions"][str(j)], x, ctx,
                    config.heads_for_block(i), config.tf_layers_for_block(i),
                    config.use_linear_projection, g,
                )
            skips.append(x)
        if i < n_blocks - 1:
            x = conv2d(bp["downsamplers"]["0"]["conv"], x, stride=2, padding=1)
            skips.append(x)

    mp = params["mid_block"]
    x = _resnet(mp["resnets"]["0"], x, emb, g, eps)
    x = _transformer2d(
        mp["attentions"]["0"], x, ctx,
        config.heads_for_block(n_blocks - 1),
        config.tf_layers_for_block(n_blocks - 1),
        config.use_linear_projection, g,
    )
    x = _resnet(mp["resnets"]["1"], x, emb, g, eps)

    down_res = [
        conv2d(params["controlnet_down_blocks"][str(i)], s, padding=0)
        * conditioning_scale
        for i, s in enumerate(skips)
    ]
    mid_res = conv2d(params["controlnet_mid_block"], x, padding=0) * conditioning_scale
    return down_res, mid_res


def init_from_unet(
    key: jax.Array, unet_params: dict, config: UNetConfig, dtype=jnp.float32
) -> dict:
    """ControlNetModel.from_unet analog (diffusers train_controlnet.py's
    default init when no --controlnet_model_name_or_path is given): the trunk
    COPIES the trained UNet's conv_in / time_embedding / down_blocks /
    mid_block (+add_embedding), the conditioning embedder is freshly
    initialized, and the control convs are zero — so a fresh ControlNet is an
    exact no-op on the UNet output."""
    from stablediffusion_tpu.models.ip_adapter import strip_ip_weights

    trunk_keys = ("conv_in", "time_embedding", "down_blocks", "mid_block",
                  "add_embedding")
    params = init_params(key, config, dtype=dtype)
    for k in trunk_keys:
        if k in params and k in unet_params:
            params[k] = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, dtype),
                strip_ip_weights(unet_params[k]),
            )
    return params


def init_params(key: jax.Array, config: UNetConfig, dtype=jnp.float32) -> dict:
    """Random trunk + ZERO-initialized control convs (the ControlNet
    property: a fresh controlnet is an exact no-op)."""
    from stablediffusion_tpu.models import unet as unet_model

    keys = jax.random.split(key, 64)
    full = unet_model.init_params(keys[0], config, dtype=dtype)
    params = {
        k: full[k]
        for k in ("conv_in", "time_embedding", "down_blocks", "mid_block")
    }
    if "add_embedding" in full:
        params["add_embedding"] = full["add_embedding"]

    def conv(ci, co, k=3, zero=False, rng=None):
        w = (
            jnp.zeros((k, k, ci, co), dtype)
            if zero
            else jax.random.normal(rng, (k, k, ci, co), dtype) * (0.3 / (k * ci**0.5))
        )
        return {"weight": w, "bias": jnp.zeros((co,), dtype)}

    ch = COND_EMBED_CHANNELS
    blocks = {}
    ki = iter(keys[1:])
    io_pairs = []
    for i in range(len(ch) - 1):
        io_pairs += [(ch[i], ch[i]), (ch[i], ch[i + 1])]
    for i, (ci, co) in enumerate(io_pairs):
        blocks[str(i)] = conv(ci, co, rng=next(ki))
    params["controlnet_cond_embedding"] = {
        "conv_in": conv(3, ch[0], rng=next(ki)),
        "blocks": blocks,
        "conv_out": conv(ch[-1], config.block_out_channels[0], zero=True),
    }

    # one zero conv per skip
    n_blocks = len(config.block_out_channels)
    L = config.layers_per_block
    skip_channels = [config.block_out_channels[0]]
    for i in range(n_blocks):
        skip_channels += [config.block_out_channels[i]] * L
        if i < n_blocks - 1:
            skip_channels.append(config.block_out_channels[i])
    params["controlnet_down_blocks"] = {
        str(i): conv(c, c, k=1, zero=True) for i, c in enumerate(skip_channels)
    }
    params["controlnet_mid_block"] = conv(
        config.block_out_channels[-1], config.block_out_channels[-1], k=1, zero=True
    )
    return params
