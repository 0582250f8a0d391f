"""Shared test fixtures: tiny SDModel factory (sd15 / sdxl / inpaint)."""

import json

import jax
import numpy as np

from stablediffusion_tpu.core.config import (
    SchedulerConfig,
    tiny_clip_config,
    tiny_unet_config,
    tiny_vae_config,
)
from stablediffusion_tpu.models import clip, unet, vae
from stablediffusion_tpu.models.wrapper import SDModel
from stablediffusion_tpu.tokenizer.clip_bpe import CLIPTokenizer


def tiny_tokenizer(pad_token_id=None) -> CLIPTokenizer:
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789.,!?'- ")
    vocab = {}
    for c in chars:
        if c != " ":
            vocab[c] = len(vocab)
    for c in chars:
        if c != " ":
            vocab[c + "</w>"] = len(vocab)
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = 999  # matches tiny_clip_config eos
    return CLIPTokenizer(vocab, merges, pad_token_id=pad_token_id)


def make_tiny_model(
    model_type="sd15",
    in_channels=4,
    scheduler_name="DDIM",
    seed=0,
) -> SDModel:
    keys = jax.random.split(jax.random.key(seed), 8)
    sdxl = model_type == "sdxl"
    ucfg = tiny_unet_config(in_channels=in_channels, sdxl=sdxl)
    vcfg = tiny_vae_config()
    tcfg = tiny_clip_config()

    kwargs = {}
    if sdxl:
        # encoder 2 with projection; cross_attention_dim = hidden + hidden2
        t2cfg = tiny_clip_config(with_projection=True)
        ucfg = tiny_unet_config(
            in_channels=in_channels,
            sdxl=True,
            cross_attention_dim=tcfg.hidden_size + t2cfg.hidden_size,
        )
        # pooled comes from encoder 2 projection
        import dataclasses

        ucfg = dataclasses.replace(
            ucfg,
            projection_class_embeddings_input_dim=t2cfg.projection_dim + 6 * 8,
        )
        kwargs.update(
            text_encoder_2_config=t2cfg,
            text_encoder_2_params=clip.init_params(keys[3], t2cfg),
            tokenizer_2=tiny_tokenizer(pad_token_id=0),
        )

    return SDModel(
        model_type=model_type,
        unet_config=ucfg,
        unet_params=unet.init_params(keys[0], ucfg),
        vae_config=vcfg,
        vae_params=vae.init_params(keys[1], vcfg),
        text_encoder_config=tcfg,
        text_encoder_params=clip.init_params(keys[2], tcfg),
        tokenizer=tiny_tokenizer(),
        scheduler_config=SchedulerConfig(),
        scheduler_name=scheduler_name,
        **kwargs,
    )
