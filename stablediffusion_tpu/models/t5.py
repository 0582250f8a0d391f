"""T5 encoder stack (T5EncoderModel) — SD3's third text tower.

Beyond-parity (the reference repo has CLIP towers only).  Param tree mirrors
the transformers T5EncoderModel checkpoint keys (encoder.block.N.layer.{0,1},
shared, encoder.final_layer_norm), validated layer-by-layer in
tests/test_sd3.py.  T5 quirks honored: NO attention scaling (scale=1),
additive relative-position bias computed once in block 0 and shared,
RMSNorm (no bias, no mean subtraction), gated-gelu FFN (v1.1 family),
and weights kept (in, out) by the standard converter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.ops import attention, linear


@dataclass(frozen=True)
class T5Config:
    """t5-v1_1 family; defaults are the tiny test config, SD3 uses
    T5_XXL below."""

    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dense_act_fn: str = "gelu_new"  # gated-gelu (v1.1) | "relu" (v1.0)

    @classmethod
    def from_diffusers_dict(cls, d: dict) -> "T5Config":
        import dataclasses

        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


T5_XXL = T5Config(
    vocab_size=32128, d_model=4096, d_kv=64, d_ff=10240,
    num_layers=24, num_heads=64,
)


def tiny_t5_config() -> T5Config:
    return T5Config(
        vocab_size=512, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
    )


def _rms_norm(p: dict, x: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    h = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (p["weight"].astype(jnp.float32) * h).astype(x.dtype)


def _relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional bucket mapping (transformers T5Attention semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


def compute_position_bias(
    rel_attn_bias_table: jax.Array,  # [num_buckets, heads] (embedding table)
    seq_len: int,
    config: T5Config,
) -> jax.Array:
    """-> [1, heads, S, S] additive logits bias."""
    pos = np.arange(seq_len, dtype=np.int64)
    rel = pos[None, :] - pos[:, None]  # memory - query
    buckets = _relative_position_bucket(
        rel,
        config.relative_attention_num_buckets,
        config.relative_attention_max_distance,
    )
    bias = jnp.take(rel_attn_bias_table, jnp.asarray(buckets), axis=0)
    return bias.transpose(2, 0, 1)[None]  # [1, H, S, S]


def _self_attn(p: dict, x: jax.Array, bias: jax.Array, cfg: T5Config):
    B, S, _ = x.shape
    H, dk = cfg.num_heads, cfg.d_kv
    q = linear(p["q"], x).reshape(B, S, H, dk)
    k = linear(p["k"], x).reshape(B, S, H, dk)
    v = linear(p["v"], x).reshape(B, S, H, dk)
    # T5: no 1/sqrt(d) scaling; position bias rides the additive mask slot
    o = attention(q, k, v, mask=bias, scale=1.0).reshape(B, S, H * dk)
    return linear(p["o"], o)


def _ffn(p: dict, x: jax.Array, cfg: T5Config):
    if cfg.dense_act_fn in ("gelu_new", "gelu"):  # gated (v1.1)
        h = jax.nn.gelu(linear(p["wi_0"], x), approximate=True) * linear(
            p["wi_1"], x
        )
    else:  # relu (v1.0): single wi
        h = jax.nn.relu(linear(p["wi"], x))
    return linear(p["wo"], h)


def apply(
    params: dict,
    config: T5Config,
    input_ids: jax.Array,  # [B, S] int32
    attention_mask: Optional[jax.Array] = None,  # [B, S] 1=keep
) -> jax.Array:
    """-> last hidden state [B, S, d_model]."""
    x = jnp.take(params["shared"]["weight"], input_ids, axis=0)
    S = input_ids.shape[1]
    enc = params["encoder"]
    bias = compute_position_bias(
        enc["block"]["0"]["layer"]["0"]["SelfAttention"][
            "relative_attention_bias"
        ]["weight"],
        S,
        config,
    ).astype(jnp.float32)
    if attention_mask is not None:
        big_neg = jnp.asarray(-1e9, jnp.float32)
        bias = bias + jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, big_neg
        )
    eps = config.layer_norm_epsilon
    for i in range(config.num_layers):
        lp = enc["block"][str(i)]["layer"]
        h = _rms_norm(lp["0"]["layer_norm"], x, eps)
        x = x + _self_attn(lp["0"]["SelfAttention"], h, bias, config)
        h = _rms_norm(lp["1"]["layer_norm"], x, eps)
        x = x + _ffn(lp["1"]["DenseReluDense"], h, config)
    return _rms_norm(enc["final_layer_norm"], x, eps)


# ---------------------------------------------------------------------------
# init (tests)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, config: T5Config, dtype=jnp.float32) -> dict:
    k = iter(jax.random.split(key, 10_000))
    D, dkv, H = config.d_model, config.d_kv, config.num_heads

    def lin(ci, co):
        return {
            "weight": jax.random.normal(next(k), (ci, co), dtype) * (ci**-0.5)
        }

    def ln():
        return {"weight": jnp.ones((D,), dtype)}

    blocks = {}
    for i in range(config.num_layers):
        sa = {
            "q": lin(D, H * dkv),
            "k": lin(D, H * dkv),
            "v": lin(D, H * dkv),
            "o": lin(H * dkv, D),
        }
        if i == 0:
            sa["relative_attention_bias"] = {
                "weight": jax.random.normal(
                    next(k), (config.relative_attention_num_buckets, H), dtype
                )
                * 0.1
            }
        ff = (
            {"wi_0": lin(D, config.d_ff), "wi_1": lin(D, config.d_ff),
             "wo": lin(config.d_ff, D)}
            if config.dense_act_fn in ("gelu_new", "gelu")
            else {"wi": lin(D, config.d_ff), "wo": lin(config.d_ff, D)}
        )
        blocks[str(i)] = {
            "layer": {
                "0": {"SelfAttention": sa, "layer_norm": ln()},
                "1": {"DenseReluDense": ff, "layer_norm": ln()},
            }
        }
    return {
        "shared": {
            "weight": jax.random.normal(next(k), (config.vocab_size, D), dtype)
        },
        "encoder": {"block": blocks, "final_layer_norm": ln()},
    }
