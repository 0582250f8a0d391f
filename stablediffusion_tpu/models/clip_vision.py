"""CLIP vision tower (ViT) — pure functional, NHWC.

Backs the IP-Adapter image encoder (beyond-parity: the reference repo has no
image-prompt path; diffusers' equivalent is CLIPVisionModelWithProjection
loaded from the `image_encoder` subfolder of h94/IP-Adapter-style layouts).

Semantics match transformers' CLIPVisionTransformer exactly (validated
layer-by-layer in tests/test_clip.py):
  * patch conv (stride=patch, no bias) -> flatten -> prepend class token ->
    add learned position embeddings -> pre_layrnorm (sic — transformers'
    attribute name carries the typo; we keep the checkpoint key);
  * encoder layers identical to the text tower but with NO causal mask;
  * `last_hidden_state` is NOT post-layernormed; `pooled` is
    post_layernorm(last[:, 0]); `image_embeds` = visual_projection(pooled).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp

from stablediffusion_tpu.core.config import CLIPVisionConfig
from stablediffusion_tpu.core.dtypes import Policy, FP32_POLICY
from stablediffusion_tpu.ops import ACTIVATIONS, attention, conv2d, layer_norm, linear


@dataclass
class CLIPVisionOutput:
    last_hidden_state: jax.Array  # [B, S, H] (no post_layernorm)
    hidden_states: List[jax.Array]  # embeddings + each layer out
    pooled_output: jax.Array  # [B, H] post_layernorm(class token)
    image_embeds: Optional[jax.Array]  # [B, P] if with_projection

    def penultimate(self) -> jax.Array:
        """hidden_states[-2] — IP-Adapter-Plus conditioning convention."""
        return self.hidden_states[-2]


def _attn_block(p: dict, x: jax.Array, cfg: CLIPVisionConfig):
    B, S, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    q = linear(p["q_proj"], x).reshape(B, S, nh, hd)
    k = linear(p["k_proj"], x).reshape(B, S, nh, hd)
    v = linear(p["v_proj"], x).reshape(B, S, nh, hd)
    out = attention(q, k, v)
    return linear(p["out_proj"], out.reshape(B, S, H))


def apply(
    params: dict,
    config: CLIPVisionConfig,
    pixel_values: jax.Array,  # [B, H, W, 3] NHWC, CLIP-normalized
    policy: Policy = FP32_POLICY,
) -> CLIPVisionOutput:
    vm = params["vision_model"]
    emb = vm["embeddings"]

    patches = conv2d(
        emb["patch_embedding"], pixel_values, stride=config.patch_size, padding=0
    )  # [B, H/p, W/p, hidden]
    B = patches.shape[0]
    x = patches.reshape(B, -1, config.hidden_size)
    cls = jnp.broadcast_to(
        emb["class_embedding"].reshape(1, 1, -1), (B, 1, config.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + emb["position_embedding"]["weight"][None, : x.shape[1]]
    x = layer_norm(vm["pre_layrnorm"], x, eps=config.layer_norm_eps)
    x = x.astype(policy.compute_dtype)

    hidden_states = [x]
    act = ACTIVATIONS[config.hidden_act]
    for i in range(config.num_hidden_layers):
        lp = vm["encoder"]["layers"][str(i)]
        h = layer_norm(lp["layer_norm1"], x, eps=config.layer_norm_eps)
        x = x + _attn_block(lp["self_attn"], h, config)
        h = layer_norm(lp["layer_norm2"], x, eps=config.layer_norm_eps)
        x = x + linear(lp["mlp"]["fc2"], act(linear(lp["mlp"]["fc1"], h)))
        hidden_states.append(x)

    pooled = layer_norm(vm["post_layernorm"], x[:, 0], eps=config.layer_norm_eps)
    image_embeds = None
    if config.with_projection and "visual_projection" in params:
        image_embeds = linear(params["visual_projection"], pooled)

    return CLIPVisionOutput(
        last_hidden_state=x,
        hidden_states=hidden_states,
        pooled_output=pooled,
        image_embeds=image_embeds,
    )


# ---------------------------------------------------------------------------
# init (tests)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, config: CLIPVisionConfig, dtype=jnp.float32) -> dict:
    k = iter(jax.random.split(key, 1000))
    H, I = config.hidden_size, config.intermediate_size

    def lin(n_in, n_out, bias=True):
        p = {"weight": jax.random.normal(next(k), (n_in, n_out), dtype) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((n_out,), dtype)
        return p

    def ln():
        return {"weight": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)}

    layers = {}
    for i in range(config.num_hidden_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": lin(H, H),
                "k_proj": lin(H, H),
                "v_proj": lin(H, H),
                "out_proj": lin(H, H),
            },
            "layer_norm1": ln(),
            "layer_norm2": ln(),
            "mlp": {"fc1": lin(H, I), "fc2": lin(I, H)},
        }
    p = config.patch_size
    params = {
        "vision_model": {
            "embeddings": {
                "class_embedding": jax.random.normal(next(k), (H,), dtype) * 0.02,
                "patch_embedding": {
                    "weight": jax.random.normal(
                        next(k), (p, p, config.num_channels, H), dtype
                    )
                    * 0.02
                },
                "position_embedding": {
                    "weight": jax.random.normal(
                        next(k), (config.num_positions, H), dtype
                    )
                    * 0.02
                },
            },
            "pre_layrnorm": ln(),
            "encoder": {"layers": layers},
            "post_layernorm": ln(),
        }
    }
    if config.with_projection:
        params["visual_projection"] = lin(H, config.projection_dim, bias=False)
    return params
