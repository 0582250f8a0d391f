"""CLIP text towers (ViT-L and OpenCLIP bigG) — pure functional.

The reference binds transformers' CLIPTextModel / CLIPTextModelWithProjection
(models/stable_diffusion.py:124-147) and consumes hidden states for clip-skip
and SDXL penultimate-layer conditioning (sd_unified_pipeline.py:596-609).

Params are nested dicts mirroring the HF checkpoint key tree
(text_model.encoder.layers.N.self_attn.q_proj.weight ...), with linear
kernels already transposed to (in, out) by the loader.  `apply` returns every
hidden state so the pipeline can select clip-skip layers statically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.core.config import CLIPTextConfig
from stablediffusion_tpu.core.dtypes import Policy, FP32_POLICY
from stablediffusion_tpu.ops import ACTIVATIONS, attention, layer_norm, linear


@dataclass
class CLIPTextOutput:
    last_hidden_state: jax.Array  # [B, S, H] (final_layer_norm applied)
    hidden_states: List[jax.Array]  # L+1 entries: embeddings + each layer out
    pooled_output: jax.Array  # [B, H] eos-token hidden state
    projected_pooled: Optional[jax.Array]  # [B, P] if with_projection

    def skip_layer(self, clip_skip: int) -> jax.Array:
        """hidden_states[-(clip_skip + 2)] — SDXL clip-skip convention
        (penultimate layer at clip_skip=0)."""
        return self.hidden_states[-(clip_skip + 2)]


def _attn_block(p: dict, x: jax.Array, mask: jax.Array, cfg: CLIPTextConfig):
    B, S, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    q = linear(p["q_proj"], x).reshape(B, S, nh, hd)
    k = linear(p["k_proj"], x).reshape(B, S, nh, hd)
    v = linear(p["v_proj"], x).reshape(B, S, nh, hd)
    out = attention(q, k, v, mask=mask)
    return linear(p["out_proj"], out.reshape(B, S, H))


def _mlp(p: dict, x: jax.Array, cfg: CLIPTextConfig):
    act = ACTIVATIONS[cfg.hidden_act]
    return linear(p["fc2"], act(linear(p["fc1"], x)))


def apply(
    params: dict,
    config: CLIPTextConfig,
    input_ids: jax.Array,
    policy: Policy = FP32_POLICY,
) -> CLIPTextOutput:
    """input_ids [B, S] int32 -> CLIPTextOutput.

    Matches the reference stack's behavior: causal mask, no padding mask (pad
    tokens participate causally, as in the SD pipelines)."""
    tm = params["text_model"]
    emb = tm["embeddings"]
    x = jnp.take(emb["token_embedding"]["weight"], input_ids, axis=0)
    S = input_ids.shape[1]
    x = x + emb["position_embedding"]["weight"][:S]
    x = x.astype(policy.compute_dtype)

    causal = jnp.where(
        jnp.tril(jnp.ones((S, S), bool)), 0.0, -jnp.inf
    )[None, None].astype(jnp.float32)

    hidden_states = [x]
    for i in range(config.num_hidden_layers):
        lp = tm["encoder"]["layers"][str(i)]
        h = layer_norm(lp["layer_norm1"], x, eps=config.layer_norm_eps)
        x = x + _attn_block(lp["self_attn"], h, causal, config)
        h = layer_norm(lp["layer_norm2"], x, eps=config.layer_norm_eps)
        x = x + _mlp(lp["mlp"], h, config)
        hidden_states.append(x)

    last = layer_norm(tm["final_layer_norm"], x, eps=config.layer_norm_eps)

    # pooled = hidden state at the first EOS position
    eos_pos = jnp.argmax((input_ids == config.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0]

    projected = None
    if config.with_projection:
        projected = linear(params["text_projection"], pooled)

    return CLIPTextOutput(
        last_hidden_state=last,
        hidden_states=hidden_states,
        pooled_output=pooled,
        projected_pooled=projected,
    )


def final_layer_norm(params: dict, config: CLIPTextConfig, x: jax.Array) -> jax.Array:
    """Re-apply final_layer_norm — SD1.5 clip-skip convention
    (ref: sd_unified_pipeline.py:604-609)."""
    return layer_norm(
        params["text_model"]["final_layer_norm"], x, eps=config.layer_norm_eps
    )


# ---------------------------------------------------------------------------
# init (tests / training-from-scratch)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, config: CLIPTextConfig, dtype=jnp.float32) -> dict:
    """Random init with the same tree structure the loader produces."""
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
    params = {
        "text_model": {
            "embeddings": {
                "token_embedding": {
                    "weight": jax.random.normal(next(k), (config.vocab_size, H), dtype)
                    * 0.02
                },
                "position_embedding": {
                    "weight": jax.random.normal(
                        next(k), (config.max_position_embeddings, H), dtype
                    )
                    * 0.02
                },
            },
            "encoder": {"layers": layers},
            "final_layer_norm": ln(),
        }
    }
    if config.with_projection:
        params["text_projection"] = lin(H, config.projection_dim, bias=False)
    return params
