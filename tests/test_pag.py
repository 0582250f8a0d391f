"""PAG — Perturbed-Attention Guidance (arXiv 2403.17377): identity
self-attention anchor, pipeline/serving plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_model

from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline

KW = dict(prompt="a cat", height=32, width=32, num_inference_steps=2, seed=4)


def test_identity_attention_anchor_seqlen_one():
    """At sequence length 1 softmax over a single key is exactly 1, so REAL
    self-attention equals identity attention — the perturbed block must
    reproduce the unperturbed one bit-for-bit there."""
    from stablediffusion_tpu.models import unet as unet_model

    m = make_tiny_model("sd15")
    p = m.unet_params["down_blocks"]["0"]["attentions"]["0"][
        "transformer_blocks"]["0"]
    heads = m.unet_config.heads_for_block(0)
    x = jax.random.normal(jax.random.key(0),
                          (2, 1, m.unet_config.block_out_channels[0]))
    ctx = jax.random.normal(jax.random.key(1),
                            (2, 77, m.unet_config.cross_attention_dim))
    a = unet_model._transformer_block(p, x, ctx, heads)
    b = unet_model._transformer_block(p, x, ctx, heads, perturb_self=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_pag_perturb_changes_selected_groups_only():
    from stablediffusion_tpu.models import unet as unet_model

    m = make_tiny_model("sd15")
    lat = jax.random.normal(jax.random.key(0), (1, 16, 16, 4))
    ctx = jax.random.normal(
        jax.random.key(1), (1, 77, m.unet_config.cross_attention_dim))

    def run(pag):
        return np.asarray(unet_model.apply(
            m.unet_params, m.unet_config, lat, jnp.asarray(500), ctx,
            pag_perturb=pag))

    base = run(None)
    assert not np.array_equal(run(("mid",)), base)
    assert not np.array_equal(run(("down", "mid", "up")), base)
    # empty tuple is falsy -> no perturbation
    np.testing.assert_array_equal(run(()), base)


def test_pipeline_pag():
    m = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    off = pipe(m, **KW).images
    zero = pipe(m, pag_scale=0.0, **KW).images
    np.testing.assert_array_equal(off, zero)
    on = pipe(m, pag_scale=3.0, **KW).images
    assert not np.array_equal(on, off)
    on2 = pipe(m, pag_scale=3.0, **KW).images
    np.testing.assert_array_equal(on, on2)
    # layer selection recompiles but runs; different layers, different image
    up = pipe(m, pag_scale=3.0, pag_applied_layers=("up",), **KW).images
    assert not np.array_equal(up, on)


def test_pipeline_pag_no_cfg():
    """PAG alone (guidance off): the branch guides away from the perturbed
    conditional without an uncond half."""
    m = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=False)
    off = pipe(m, **KW).images
    on = pipe(m, pag_scale=3.0, **KW).images
    assert on.shape == off.shape
    assert not np.array_equal(on, off)


def test_pipeline_pag_inpaint_and_freeu_compose():
    m = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    img = np.full((32, 32, 3), 0.5, np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe(m, image=img, mask_image=mask, pag_scale=2.0, freeu=True,
               **KW).images
    assert out.shape == (1, 32, 32, 3)


def test_pag_validation():
    m = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    with pytest.raises(ValueError, match="pag_applied_layers"):
        pipe(m, pag_scale=2.0, pag_applied_layers=("bogus",), **KW)
    with pytest.raises(ValueError, match="cache_interval"):
        pipe(m, pag_scale=2.0, cache_interval=2, **KW)


def test_serving_pag_keys():
    from stablediffusion_tpu.serve.handler import Handler

    h = Handler(model=make_tiny_model("sd15"))
    off = h(dict(KW), "p0")
    assert "error" not in off, off.get("traceback")
    on = h({**KW, "pag_scale": 3.0}, "p1")
    assert "error" not in on, on.get("traceback")
    assert on["images"] != off["images"]
    layers = h({**KW, "pag_scale": 3.0, "pag_applied_layers": ["mid", "up"]},
               "p2")
    assert "error" not in layers, layers.get("traceback")


def test_build_ui_request_pag():
    from stablediffusion_tpu.serve.webapp import build_ui_request

    req = build_ui_request("txt2img", "a cat", pag_scale=2.5)
    assert req["pag_scale"] == 2.5
    assert "pag_scale" not in build_ui_request("txt2img", "a cat")
