"""FreeU (ops/freeu.py): Fourier filter anchored vs numpy, neutral-params
identity, pipeline/serving plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_model

from stablediffusion_tpu.ops.freeu import (
    SD15_DEFAULTS,
    SDXL_DEFAULTS,
    apply_freeu,
    fourier_filter,
)


def _np_fourier_filter(x, threshold, scale):
    """Independent numpy mirror of the diffusers fourier_filter (channels
    moved last to match our NHWC layout)."""
    B, H, W, C = x.shape
    xf = np.fft.fftn(x.astype(np.complex64), axes=(1, 2))
    xf = np.fft.fftshift(xf, axes=(1, 2))
    mask = np.ones((B, H, W, C), np.float32)
    crow, ccol = H // 2, W // 2
    mask[:, max(crow - threshold, 0): crow + threshold,
         max(ccol - threshold, 0): ccol + threshold, :] = scale
    xf = xf * mask
    xf = np.fft.ifftshift(xf, axes=(1, 2))
    return np.fft.ifftn(xf, axes=(1, 2)).real.astype(x.dtype)


def test_fourier_filter_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 12, 5)).astype(np.float32)
    for thr, s in [(1, 0.2), (1, 0.9), (2, 0.5)]:
        got = np.asarray(fourier_filter(jnp.asarray(x), thr, s))
        want = _np_fourier_filter(x, thr, s)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_fourier_filter_scale_one_is_identity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
    got = np.asarray(fourier_filter(jnp.asarray(x), 1, 1.0))
    np.testing.assert_allclose(got, x, atol=1e-5)


def test_apply_freeu_passthrough_outside_deep_blocks():
    x = jnp.ones((1, 4, 4, 8))
    s = jnp.ones((1, 4, 4, 8))
    for idx in (2, 3):
        a, b = apply_freeu(x, s, idx, SD15_DEFAULTS)
        assert a is x and b is s


def test_unet_freeu_neutral_params_identity():
    m = make_tiny_model("sd15")
    from stablediffusion_tpu.models import unet

    lat = jax.random.normal(jax.random.key(0), (1, 16, 16, 4))
    ctx = jax.random.normal(
        jax.random.key(1), (1, 77, m.unet_config.cross_attention_dim))
    base = unet.apply(m.unet_params, m.unet_config, lat, jnp.asarray(500), ctx)
    neutral = unet.apply(
        m.unet_params, m.unet_config, lat, jnp.asarray(500), ctx,
        freeu=(1.0, 1.0, 1.0, 1.0))
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(neutral), atol=1e-4)
    # real params change the output
    on = unet.apply(
        m.unet_params, m.unet_config, lat, jnp.asarray(500), ctx,
        freeu=SD15_DEFAULTS)
    assert float(np.abs(np.asarray(on) - np.asarray(base)).max()) > 1e-4


@pytest.mark.parametrize("model_type", ["sd15", "sdxl"])
def test_pipeline_freeu(model_type):
    """freeu=True resolves to per-family defaults, runs jitted end-to-end,
    is deterministic, and actually changes the image."""
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
        _resolve_freeu,
    )

    want = SDXL_DEFAULTS if model_type == "sdxl" else SD15_DEFAULTS
    assert _resolve_freeu(True, model_type) == want
    assert _resolve_freeu([1, 2, 3, 4], model_type) == (1.0, 2.0, 3.0, 4.0)
    assert _resolve_freeu(None, model_type) is None
    with pytest.raises(ValueError):
        _resolve_freeu((1.0, 2.0), model_type)

    m = make_tiny_model(model_type)
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    kw = dict(prompt="a cat", height=32, width=32, num_inference_steps=2,
              seed=3)
    off = pipe(m, **kw).images
    on = pipe(m, freeu=True, **kw).images
    on2 = pipe(m, freeu=list(want), **kw).images
    assert not np.array_equal(on, off)
    np.testing.assert_array_equal(on, on2)


def test_pipeline_freeu_with_deepcache():
    """freeu composes with cache_interval (the shallow cached steps skip the
    deep blocks where FreeU acts; the full steps apply it)."""
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    m = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    kw = dict(prompt="a cat", height=32, width=32, num_inference_steps=4,
              cache_interval=2, seed=3)
    off = pipe(m, **kw).images
    on = pipe(m, freeu=True, **kw).images
    assert on.shape == off.shape
    assert not np.array_equal(on, off)


def test_serving_freeu_key():
    """`freeu` rides the request schema (INFERENCE_ARG_KEYS) end-to-end."""
    from stablediffusion_tpu.serve.handler import Handler

    h = Handler(model=make_tiny_model("sd15"))
    args = dict(prompt="a cat", height=32, width=32, num_inference_steps=2,
                seed=9)
    off = h(dict(args), "f0")
    assert "error" not in off, off.get("traceback")
    on = h({**args, "freeu": True}, "f1")
    assert "error" not in on, on.get("traceback")
    assert on["images"] != off["images"]
    lst = h({**args, "freeu": [1.3, 1.4, 0.9, 0.2]}, "f2")
    assert "error" not in lst, lst.get("traceback")


def test_build_ui_request_freeu():
    from stablediffusion_tpu.serve.webapp import build_ui_request

    req = build_ui_request("txt2img", "a cat", freeu=True)
    assert req["freeu"] is True
    assert "freeu" not in build_ui_request("txt2img", "a cat")
