"""Core config / rng / mesh tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.core import (
    SD15_UNET,
    SDXL_UNET,
    SD15_VAE,
    UNetConfig,
)
from stablediffusion_tpu.core.rng import as_key, randn, split_for_batch
from stablediffusion_tpu.parallel import make_mesh, shard_batch


def test_unet_config_from_diffusers_dict_sd15_quirk():
    # SD1.x abuses attention_head_dim for head count (SURVEY.md §2.9 D1)
    d = {
        "attention_head_dim": 8,
        "down_block_types": list(SD15_UNET.down_block_types),
        "up_block_types": list(SD15_UNET.up_block_types),
        "block_out_channels": [320, 640, 1280, 1280],
        "cross_attention_dim": 768,
    }
    cfg = UNetConfig.from_diffusers_dict(d)
    assert cfg.num_attention_heads == 8
    assert cfg.time_embed_dim == 1280


def test_sdxl_config():
    assert SDXL_UNET.heads_for_block(2) == 20
    assert SDXL_UNET.tf_layers_for_block(2) == 10
    assert SDXL_UNET.projection_class_embeddings_input_dim == 2816
    assert SD15_VAE.vae_scale_factor == 8


def test_rng_seed_determinism():
    a = randn(as_key(42), (2, 4, 8, 8))
    b = randn(as_key(42), (2, 4, 8, 8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = randn(as_key(43), (2, 4, 8, 8))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_rng_per_sample_keys():
    keys = split_for_batch(as_key(7), 4)
    x = randn(None, (4, 3, 3), per_sample_keys=keys)
    assert x.shape == (4, 3, 3)
    # distinct streams per sample
    assert np.abs(np.asarray(x[0]) - np.asarray(x[1])).max() > 0


def test_mesh_and_batch_sharding():
    assert jax.device_count() == 8
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "tensor": 1}
    batch = {"x": jnp.ones((16, 4)), "y": jnp.zeros((16,))}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["x"].sharding.device_set) == 8

    mesh2 = make_mesh(tensor=2)
    assert mesh2.shape == {"data": 4, "tensor": 2}
