"""Fast host-side random params for benches/compile checks.

Full-size init via jax.random issues hundreds of separate device programs
(one per differently-shaped leaf), which is pathologically slow through this
environment's remote-compile TPU tunnel.  For benchmarking and compile
checks the values don't matter — generate on host with numpy in one pass and
transfer once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_params_like(shape_tree, dtype=jnp.bfloat16, scale: float = 0.02, seed: int = 0):
    """Shape tree (e.g. from jax.eval_shape) -> numpy-initialized params."""
    rng = np.random.default_rng(seed)

    def make(leaf):
        shape = tuple(leaf.shape)
        if len(shape) == 1:  # norm scales / biases: ones keep norms sane
            arr = np.ones(shape, np.float32)
        else:
            fan_in = shape[-2] if len(shape) == 2 else int(np.prod(shape[:-1]))
            arr = rng.standard_normal(shape).astype(np.float32) * min(
                scale, fan_in**-0.5
            )
        return jnp.asarray(arr, dtype)

    return jax.tree_util.tree_map(make, shape_tree)


def random_model_params(init_fn, config, dtype=jnp.bfloat16, seed: int = 0):
    shapes = jax.eval_shape(lambda k: init_fn(k, config), jax.random.key(0))
    return random_params_like(shapes, dtype=dtype, seed=seed)


def bench_tokenizer(pad_token_id=None):
    """Minimal char-level CLIPTokenizer with the REAL special ids (bos 49406,
    eos 49407) so full-size text encoders pool at the true EOS position.
    Values are random-weight benches' concern, not linguistics."""
    from stablediffusion_tpu.tokenizer.clip_bpe import CLIPTokenizer

    chars = "abcdefghijklmnopqrstuvwxyz0123456789.,!?'-"
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = 49406
    vocab["<|endoftext|>"] = 49407
    return CLIPTokenizer(vocab, [], pad_token_id=pad_token_id)


def random_full_model(name: str, dtype=jnp.bfloat16):
    """Full-size SD1.5 / SDXL SDModel with host-random weights — FLOPs and
    memory traffic identical to real checkpoints (no hub access in this
    environment).  For perf/approximation benches that need the WHOLE
    pipeline surface (tokenize -> encode -> denoise -> decode)."""
    from stablediffusion_tpu.core.config import (
        SD15_TEXT_ENCODER,
        SD15_UNET,
        SD15_VAE,
        SDXL_TEXT_ENCODER,
        SDXL_TEXT_ENCODER_2,
        SDXL_UNET,
        SDXL_VAE,
        SchedulerConfig,
    )
    from stablediffusion_tpu.models import clip, unet, vae
    from stablediffusion_tpu.models.wrapper import SDModel

    sdxl = name == "sdxl"
    ucfg = SDXL_UNET if sdxl else SD15_UNET
    vcfg = SDXL_VAE if sdxl else SD15_VAE
    tcfg = SDXL_TEXT_ENCODER if sdxl else SD15_TEXT_ENCODER
    kwargs = {}
    if sdxl:
        kwargs.update(
            text_encoder_2_config=SDXL_TEXT_ENCODER_2,
            text_encoder_2_params=random_model_params(
                clip.init_params, SDXL_TEXT_ENCODER_2, dtype=jnp.float32
            ),
            tokenizer_2=bench_tokenizer(pad_token_id=0),
        )
    return SDModel(
        model_type=name,
        unet_config=ucfg,
        unet_params=random_model_params(unet.init_params, ucfg, dtype=dtype),
        vae_config=vcfg,
        vae_params=random_model_params(
            vae.init_params, vcfg, dtype=jnp.float32 if sdxl else dtype
        ),
        text_encoder_config=tcfg,
        text_encoder_params=random_model_params(
            clip.init_params, tcfg, dtype=jnp.float32
        ),
        tokenizer=bench_tokenizer(),
        scheduler_config=SchedulerConfig(
            timestep_spacing="leading" if sdxl else "leading"
        ),
        scheduler_name="DDIM",
        **kwargs,
    )
