"""InstructPix2Pix mode (image_guidance_scale): 3-branch CFG anchored by a
hand-rolled denoise loop, mode/validation coverage, serving plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_model

from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline


@pytest.fixture(scope="module")
def m8():
    return make_tiny_model("sd15", in_channels=8)


def test_ip2p_matches_handrolled_loop(m8):
    """Pipeline vs a direct loop written from the published update rule
    (Brooks et al. 2022): three branches (text+image, uncond+image,
    uncond+zeros), pred = u + g*(t - i) + gi*(i - u), image latents ride
    the UNet's channels 4:8 unscaled."""
    from stablediffusion_tpu.models import unet as unet_model

    N, g, gi = 4, 7.5, 1.5
    rng = np.random.default_rng(0)
    D = m8.unet_config.cross_attention_dim
    pos = rng.standard_normal((1, 77, D)).astype(np.float32)
    neg = rng.standard_normal((1, 77, D)).astype(np.float32)
    lat0 = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    il = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)

    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    out = pipe(
        m8, prompt_embeds=jnp.asarray(pos),
        negative_prompt_embeds=jnp.asarray(neg),
        latents=jnp.asarray(lat0), image=jnp.asarray(il),
        image_guidance_scale=gi, guidance_scale=g,
        height=32, width=32, num_inference_steps=N, seed=0,
        output_type="latents",
    ).latents

    sched = m8.scheduler
    plan = sched.plan(N)
    lat = jnp.asarray(lat0) * plan.init_noise_sigma
    state = sched.init_state(plan, lat.shape)
    emb3 = jnp.concatenate([pos, neg, neg], axis=0)
    il3 = jnp.concatenate(
        [il, il, np.zeros_like(il)], axis=0).astype(jnp.float32)
    for i in range(N):
        x3 = jnp.concatenate([lat] * 3, axis=0)
        x3 = sched.scale_model_input(plan, x3, jnp.asarray(i))
        x3 = jnp.concatenate([x3, il3], axis=-1)
        pred = unet_model.apply(
            m8.unet_params, m8.unet_config, x3,
            plan.timesteps[i], emb3)
        t, im, un = jnp.split(pred, 3, axis=0)
        pred = un + g * (t - im) + gi * (im - un)
        lat, state = sched.step(plan, state, jnp.asarray(i), pred, lat)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(lat, np.float32), atol=2e-4)


def test_ip2p_pixel_image_runs_and_is_deterministic(m8):
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    img = np.full((32, 32, 3), 0.4, np.float32)
    kw = dict(prompt="make it a cat", image=img, image_guidance_scale=1.5,
              height=32, width=32, num_inference_steps=2, seed=7)
    a = pipe(m8, **kw).images
    b = pipe(m8, **kw).images
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 32, 32, 3)
    # image CFG strength matters
    c = pipe(m8, **{**kw, "image_guidance_scale": 3.0}).images
    assert not np.array_equal(a, c)


def test_ip2p_validation():
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    img = np.full((32, 32, 3), 0.4, np.float32)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=1)
    m4 = make_tiny_model("sd15")
    with pytest.raises(ValueError, match="8-channel"):
        pipe(m4, prompt="x", image=img, image_guidance_scale=1.5, **kw)
    m8 = make_tiny_model("sd15", in_channels=8)
    with pytest.raises(ValueError, match="needs `image`"):
        pipe(m8, prompt="x", image_guidance_scale=1.5, **kw)
    mask = np.ones((32, 32), np.float32)
    with pytest.raises(ValueError, match="no mask"):
        pipe(m8, prompt="x", image=img, mask_image=mask,
             image_guidance_scale=1.5, **kw)
    with pytest.raises(ValueError, match="cannot combine"):
        pipe(m8, prompt="x", image=img, image_guidance_scale=1.5,
             pag_scale=2.0, **kw)
    # an 8-ch model can ONLY run ip2p: plain modes get a clear error,
    # not an XLA conv-shape dump
    with pytest.raises(ValueError, match="InstructPix2Pix"):
        pipe(m8, prompt="x", **kw)
    with pytest.raises(ValueError, match="InstructPix2Pix"):
        pipe(m8, prompt="x", image=img, strength=0.6, **kw)


def test_ip2p_serving(m8):
    from stablediffusion_tpu.serve.handler import Handler, encode_images_b64

    h = Handler(model=m8)
    img_b64 = encode_images_b64(np.full((1, 32, 32, 3), 0.4, np.float32))[0]
    args = dict(prompt="make it a cat", image=img_b64, height=32, width=32,
                num_inference_steps=2, seed=5, image_guidance_scale=1.5)
    r = h(dict(args), "i0")
    assert "error" not in r, r.get("traceback")
    r2 = h({**args, "image_guidance_scale": 3.0}, "i1")
    assert "error" not in r2, r2.get("traceback")
    assert r["images"] != r2["images"]


def test_build_ui_request_ip2p():
    from stablediffusion_tpu.serve.webapp import build_ui_request

    img = np.zeros((8, 8, 3), np.float32)
    req = build_ui_request("img2img", "x", image=img,
                           image_guidance_scale=1.5)
    assert req["image_guidance_scale"] == 1.5
    assert "strength" not in req  # ip2p runs the full schedule
    plain = build_ui_request("img2img", "x", image=img)
    assert "image_guidance_scale" not in plain and "strength" in plain
