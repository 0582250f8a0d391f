"""VAE and UNet structural/behavioral tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_tpu.core.config import (
    SD15_UNET,
    tiny_unet_config,
    tiny_vae_config,
)
from stablediffusion_tpu.models import unet, vae


@pytest.fixture(scope="module")
def vae_setup():
    cfg = tiny_vae_config()
    params = vae.init_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def unet_setup():
    cfg = tiny_unet_config()
    params = unet.init_params(jax.random.key(1), cfg)
    return cfg, params


def test_vae_shapes_and_roundtrip(vae_setup):
    cfg, params = vae_setup
    img = jax.random.normal(jax.random.key(2), (2, 32, 32, 3)) * 0.5
    mean, logvar = vae.encode(params, cfg, img)
    f = cfg.vae_scale_factor
    assert f == 2
    assert mean.shape == (2, 16, 16, cfg.latent_channels)
    assert logvar.shape == mean.shape
    z = vae.sample_latent(mean, logvar, jax.random.key(3))
    out = vae.decode(params, cfg, z)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_vae_logvar_clipped(vae_setup):
    cfg, params = vae_setup
    img = jnp.ones((1, 32, 32, 3)) * 100.0  # extreme input
    _, logvar = vae.encode(params, cfg, img)
    lv = np.asarray(logvar)
    assert lv.min() >= -30.0 and lv.max() <= 20.0


def test_unet_sd15_shape(unet_setup):
    cfg, params = unet_setup
    x = jax.random.normal(jax.random.key(4), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(5), (2, 77, cfg.cross_attention_dim))
    t = jnp.asarray([10, 900])
    out = unet.apply(params, cfg, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_timestep_sensitivity(unet_setup):
    cfg, params = unet_setup
    x = jax.random.normal(jax.random.key(4), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(5), (1, 77, cfg.cross_attention_dim))
    a = unet.apply(params, cfg, x, jnp.asarray([10]), ctx)
    b = unet.apply(params, cfg, x, jnp.asarray([900]), ctx)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_unet_context_sensitivity(unet_setup):
    cfg, params = unet_setup
    x = jax.random.normal(jax.random.key(4), (1, 16, 16, 4))
    c1 = jax.random.normal(jax.random.key(5), (1, 77, cfg.cross_attention_dim))
    c2 = jax.random.normal(jax.random.key(6), (1, 77, cfg.cross_attention_dim))
    a = unet.apply(params, cfg, x, jnp.asarray([10]), c1)
    b = unet.apply(params, cfg, x, jnp.asarray([10]), c2)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_unet_sdxl_added_cond():
    cfg = tiny_unet_config(sdxl=True)
    params = unet.init_params(jax.random.key(7), cfg)
    x = jax.random.normal(jax.random.key(8), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(9), (2, 77, cfg.cross_attention_dim))
    added = {
        "text_embeds": jax.random.normal(
            jax.random.key(10), (2, cfg.cross_attention_dim)
        ),
        "time_ids": jnp.tile(
            jnp.asarray([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]]), (2, 1)
        ),
    }
    out = unet.apply(params, cfg, x, jnp.asarray([500, 100]), ctx, added_cond=added)
    assert out.shape == (2, 16, 16, 4)
    # micro-conditioning must matter
    added2 = dict(added, time_ids=added["time_ids"] * 2.0)
    out2 = unet.apply(params, cfg, x, jnp.asarray([500, 100]), ctx, added_cond=added2)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-5
    # SDXL UNet without added_cond must be rejected
    with pytest.raises(AssertionError):
        unet.apply(params, cfg, x, jnp.asarray([500, 100]), ctx)


def test_unet_inpaint_9ch():
    cfg = tiny_unet_config(in_channels=9)
    params = unet.init_params(jax.random.key(11), cfg)
    x = jax.random.normal(jax.random.key(12), (1, 16, 16, 9))
    ctx = jax.random.normal(jax.random.key(13), (1, 77, cfg.cross_attention_dim))
    out = unet.apply(params, cfg, x, jnp.asarray([10]), ctx)
    assert out.shape == (1, 16, 16, 4)


def test_unet_full_sd15_structure_tree():
    """Real SD1.5 config param tree: verify key structure + parameter count
    against the well-known 859.5M total for SD1.5's UNet."""
    params = jax.eval_shape(lambda k: unet.init_params(k, SD15_UNET), jax.random.key(0))
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    assert n_params == 859_520_964, n_params  # exact diffusers SD1.5 UNet count
    # spot-check canonical diffusers key paths exist
    assert "time_emb_proj" in params["down_blocks"]["0"]["resnets"]["0"]
    assert "proj" in params["down_blocks"]["0"]["attentions"]["0"][
        "transformer_blocks"
    ]["0"]["ff"]["net"]["0"]
    assert params["conv_in"]["weight"].shape == (3, 3, 4, 320)
    assert params["down_blocks"]["0"]["attentions"]["0"]["proj_in"][
        "weight"
    ].shape == (1, 1, 320, 320)  # SD1.5: conv projection


def test_unet_full_sdxl_structure_tree():
    from stablediffusion_tpu.core.config import SDXL_UNET

    params = jax.eval_shape(lambda k: unet.init_params(k, SDXL_UNET), jax.random.key(0))
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    assert n_params == 2_567_463_684, n_params  # exact diffusers SDXL UNet count
    assert params["add_embedding"]["linear_1"]["weight"].shape == (2816, 1280)
    # SDXL: linear projection
    assert params["down_blocks"]["1"]["attentions"]["0"]["proj_in"][
        "weight"
    ].shape == (640, 640)
