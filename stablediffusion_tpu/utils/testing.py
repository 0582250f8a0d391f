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


def bench_t5_tokenizer(extra_ids: int = 100):
    """Char-level SentencePiece-unigram tokenizer with the REAL T5 special
    layout (<pad>=0, </s>=1, <unk>=2, sentinels at the id-space tail) so
    full-size T5 benches exercise the true encode contract.  ids stay far
    below the 32128-entry embedding table; values are random-weight
    benches' concern, not linguistics.  save_pretrained round-trips it."""
    from stablediffusion_tpu.tokenizer.sentencepiece_unigram import (
        METASPACE,
        SentencePieceUnigramTokenizer,
    )

    chars = "abcdefghijklmnopqrstuvwxyz0123456789.,!?'-"
    vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)]
    vocab.append((METASPACE, -1.0))
    vocab += [(c, -2.0) for c in chars]
    vocab += [(METASPACE + c, -1.5) for c in chars]
    return SentencePieceUnigramTokenizer(
        vocab, unk_id=2, eos_id=1, pad_id=0, extra_ids=extra_ids
    )


def random_full_model(name: str, dtype=jnp.bfloat16, with_t5: bool = False):
    """Full-size SD1.5 / SDXL SDModel — or SD3-medium SD3Model — with
    host-random weights; FLOPs and memory traffic identical to real
    checkpoints (no hub access in this environment).  For perf/approximation
    benches that need the WHOLE pipeline surface (tokenize -> encode ->
    denoise -> decode).  name="sd3" defaults to the T5-free serving
    configuration (diffusers' documented drop-T5 mode, load_sd3_model's
    optional text_encoder_3); with_t5=True adds the full 4.7B T5-XXL tower
    plus a fabricated-unigram tokenizer_3."""
    if name == "sd3":
        return _random_full_sd3(dtype=dtype, with_t5=with_t5)
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


def _random_full_sd3(dtype=jnp.bfloat16, with_t5: bool = False):
    import dataclasses

    from stablediffusion_tpu.core.config import (
        SD3_MEDIUM,
        SD3_VAE,
        SDXL_TEXT_ENCODER,
        SDXL_TEXT_ENCODER_2,
        SchedulerConfig,
    )
    from stablediffusion_tpu.models import clip, mmdit, t5, vae
    from stablediffusion_tpu.pipelines.sd3 import SD3Model

    # SD3 checkpoints ship CLIP-L/bigG as *WithProjection* towers (pooled
    # 768+1280 = the MM-DiT's pooled_projection_dim 2048)
    te_cfg = dataclasses.replace(SDXL_TEXT_ENCODER, with_projection=True)
    te2_cfg = SDXL_TEXT_ENCODER_2
    kwargs = {}
    if with_t5:
        kwargs.update(
            text_encoder_3_config=t5.T5_XXL,
            text_encoder_3_params=random_model_params(
                t5.init_params, t5.T5_XXL, dtype=dtype
            ),
            tokenizer_3=bench_t5_tokenizer(),
        )
    return SD3Model(
        transformer_config=SD3_MEDIUM,
        transformer_params=random_model_params(
            mmdit.init_params, SD3_MEDIUM, dtype=dtype
        ),
        # real SD3 fp16 folders ship EVERY tower at 2 bytes/param — keep the
        # on-disk bytes representative for bench_coldstart (values are
        # random; fp32 fidelity is irrelevant here, unlike tiny parity tests)
        vae_config=SD3_VAE,
        vae_params=random_model_params(
            vae.init_params, SD3_VAE, dtype=dtype
        ),
        text_encoder_config=te_cfg,
        text_encoder_params=random_model_params(
            clip.init_params, te_cfg, dtype=dtype
        ),
        tokenizer=bench_tokenizer(),
        text_encoder_2_config=te2_cfg,
        text_encoder_2_params=random_model_params(
            clip.init_params, te2_cfg, dtype=dtype
        ),
        tokenizer_2=bench_tokenizer(pad_token_id=0),
        scheduler_config=SchedulerConfig(shift=3.0),
        **kwargs,
    )
