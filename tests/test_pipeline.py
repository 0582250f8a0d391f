"""End-to-end unified pipeline tests (tiny models, CPU).

Mirrors the reference's task dispatch (sd_unified_pipeline.py:137-529):
txt2img / img2img / inpaint for sd15 and sdxl model types, seed semantics,
strength windows, denoising_start/end refiner-style split, scheduler sweep.
"""

import numpy as np
import pytest

from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline

from helpers import make_tiny_model

H = W = 32  # tiny VAE scale factor is 2 -> latents 16x16 (= tiny unet sample size)


@pytest.fixture(scope="module")
def sd15():
    return make_tiny_model("sd15")


@pytest.fixture(scope="module")
def sdxl():
    return make_tiny_model("sdxl")


@pytest.fixture(scope="module")
def pipe():
    return StableDiffusionUnifiedPipeline(do_cfg=True)


def test_txt2img_sd15(pipe, sd15):
    out = pipe(
        sd15, prompt="a cat", height=H, width=W, num_inference_steps=4, seed=42
    )
    assert out.images.shape == (1, H, W, 3)
    assert out.seed == 42
    assert np.isfinite(out.images).all()
    assert 0.0 <= out.images.min() and out.images.max() <= 1.0


def test_txt2img_determinism_and_seed_sensitivity(pipe, sd15):
    a = pipe(sd15, prompt="a cat", height=H, width=W, num_inference_steps=3, seed=1)
    b = pipe(sd15, prompt="a cat", height=H, width=W, num_inference_steps=3, seed=1)
    c = pipe(sd15, prompt="a cat", height=H, width=W, num_inference_steps=3, seed=2)
    np.testing.assert_array_equal(a.images, b.images)
    assert np.abs(a.images - c.images).max() > 1e-4


def test_txt2img_batch_and_num_images(pipe, sd15):
    out = pipe(
        sd15,
        prompt=["a cat", "a dog"],
        negative_prompt="bad",
        num_images_per_prompt=2,
        height=H,
        width=W,
        num_inference_steps=2,
        seed=0,
    )
    assert out.images.shape == (4, H, W, 3)


def test_txt2img_auto_seed_echo(pipe, sd15):
    out = pipe(sd15, prompt="a cat", height=H, width=W, num_inference_steps=2)
    assert isinstance(out.seed, int) and 0 <= out.seed < 2**31


def test_guidance_scale_and_rescale(pipe, sd15):
    base = pipe(sd15, prompt="cat", height=H, width=W, num_inference_steps=3, seed=5)
    hi = pipe(
        sd15,
        prompt="cat",
        height=H,
        width=W,
        num_inference_steps=3,
        seed=5,
        guidance_scale=12.0,
    )
    res = pipe(
        sd15,
        prompt="cat",
        height=H,
        width=W,
        num_inference_steps=3,
        seed=5,
        guidance_scale=12.0,
        guidance_rescale=0.7,
    )
    assert np.abs(base.images - hi.images).max() > 1e-5
    assert np.abs(hi.images - res.images).max() > 1e-6


def test_clip_skip(pipe, sd15):
    a = pipe(sd15, prompt="cat", height=H, width=W, num_inference_steps=2, seed=3)
    b = pipe(
        sd15, prompt="cat", height=H, width=W, num_inference_steps=2, seed=3,
        clip_skip=1,
    )
    assert np.abs(a.images - b.images).max() > 1e-6


def test_img2img(pipe, sd15, rng):
    init = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    out = pipe(
        sd15,
        prompt="a cat",
        image=init,
        strength=0.5,
        num_inference_steps=4,
        height=H,
        width=W,
        seed=7,
    )
    assert out.images.shape == (1, H, W, 3)
    # strength=0.5 of 4 steps -> 2 steps actually run; low strength keeps
    # output closer to init than strength=1
    far = pipe(
        sd15, prompt="a cat", image=init, strength=1.0,
        num_inference_steps=4, height=H, width=W, seed=7,
    )
    d_near = np.abs(out.images - init).mean()
    d_far = np.abs(far.images - init).mean()
    assert d_near < d_far


def test_img2img_latents_passthrough(pipe, sd15, rng):
    lat = rng.standard_normal((1, H // 2, W // 2, 4)).astype(np.float32)
    out = pipe(
        sd15, prompt="cat", image=lat, strength=0.5, num_inference_steps=4, seed=1
    )
    assert out.images.shape == (1, H, W, 3)


def test_inpaint_blend4(pipe, sd15, rng):
    init = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    mask = np.zeros((H, W), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe(
        sd15,
        prompt="a cat",
        image=init,
        mask_image=mask,
        strength=1.0,
        num_inference_steps=4,
        height=H,
        width=W,
        seed=9,
    )
    assert out.images.shape == (1, H, W, 3)
    assert np.isfinite(out.images).all()


def test_inpaint_9ch_concat(rng):
    model = make_tiny_model("sd15", in_channels=9)
    pipe = StableDiffusionUnifiedPipeline()
    init = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    mask = np.zeros((H, W), np.float32)
    mask[0:16, :] = 1.0
    out = pipe(
        model,
        prompt="dog",
        image=init,
        mask_image=mask,
        num_inference_steps=3,
        height=H,
        width=W,
        seed=2,
    )
    assert out.images.shape == (1, H, W, 3)
    assert np.isfinite(out.images).all()


def test_inpaint_padding_mask_crop(pipe, sd15, rng):
    init = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    mask = np.zeros((H, W), np.float32)
    mask[12:20, 12:20] = 1.0
    out = pipe(
        sd15,
        prompt="cat",
        image=init,
        mask_image=mask,
        num_inference_steps=2,
        height=H,
        width=W,
        seed=4,
        padding_mask_crop=4,
    )
    assert out.images.shape == (1, H, W, 3)
    # unmasked corner must be exactly the original (pasted back)
    np.testing.assert_allclose(out.images[0, :4, :4], init[0, :4, :4], atol=1e-5)


def test_sdxl_txt2img(pipe, sdxl):
    out = pipe(
        sdxl,
        prompt="a cat",
        prompt_2="a feline",
        negative_prompt="blurry",
        height=H,
        width=W,
        num_inference_steps=3,
        seed=11,
    )
    assert out.images.shape == (1, H, W, 3)
    assert np.isfinite(out.images).all()


def test_sdxl_refiner_style_split(pipe, sdxl):
    # base: txt2img stopped at 60%, latents out
    base = pipe(
        sdxl,
        prompt="a cat",
        height=H,
        width=W,
        num_inference_steps=6,
        denoising_end=0.6,
        output_type="latents",
        seed=13,
    )
    assert base.latents is not None
    # "refiner": img2img continuing from 60%
    final = pipe(
        sdxl,
        prompt="a cat",
        image=np.asarray(base.latents),
        num_inference_steps=6,
        denoising_start=0.6,
        height=H,
        width=W,
        seed=13,
    )
    assert final.images.shape == (1, H, W, 3)


@pytest.mark.parametrize(
    "name", ["DDIM", "euler", "euler_a", "DPM++ 2M", "DPM++ 2M SDE Karras", "PNDM", "uni_pc"]
)
def test_all_schedulers_through_pipeline(sd15, name, pipe):
    sd15.set_scheduler(name)
    try:
        out = pipe(
            sd15, prompt="cat", height=H, width=W, num_inference_steps=4, seed=1
        )
        assert np.isfinite(out.images).all()
    finally:
        sd15.set_scheduler("DDIM")


def test_output_type_latents(pipe, sd15):
    out = pipe(
        sd15, prompt="cat", height=H, width=W, num_inference_steps=2, seed=1,
        output_type="latents",
    )
    assert out.images is None
    assert out.latents.shape == (1, H // 2, W // 2, 4)


def test_output_type_uint8_matches_float_path(pipe, sd15):
    """output_type='uint8' (serving fetch path: device-side quantize) must
    agree with the float path's to_uint8 quantization to the rounding tie."""
    kw = dict(prompt="cat", height=H, width=W, num_inference_steps=2, seed=3)
    f = pipe(sd15, **kw)
    u = pipe(sd15, **kw, output_type="uint8")
    assert u.images.dtype == np.uint8
    assert u.images.shape == f.images.shape
    ref = (f.images * 255).round().astype(np.int16)
    assert np.abs(ref - u.images.astype(np.int16)).max() <= 1


def test_output_type_uint8_device_matches_uint8(pipe, sd15):
    """output_type='uint8_device' (batcher overlap path) returns the
    UN-fetched device array — bit-identical to 'uint8' after np.asarray,
    so the serving postprocess thread sees exactly the serial bytes."""
    import jax
    import jax.numpy as jnp

    kw = dict(prompt="cat", height=H, width=W, num_inference_steps=2, seed=3)
    u = pipe(sd15, **kw, output_type="uint8")
    d = pipe(sd15, **kw, output_type="uint8_device")
    assert isinstance(d.images, jax.Array)
    assert d.images.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(d.images), u.images)


def test_negative_prompt_batch_mismatch(pipe, sd15):
    with pytest.raises(ValueError):
        pipe(
            sd15,
            prompt=["a", "b"],
            negative_prompt=["x"],
            height=H,
            width=W,
            num_inference_steps=1,
        )


def test_refiner_path(pipe):
    """Refiner UNet: encoder-2-only conditioning + aesthetic-score time ids."""
    import dataclasses

    import jax

    from stablediffusion_tpu.core.config import tiny_unet_config
    from stablediffusion_tpu.models import unet as unet_model

    model = make_tiny_model("sdxl")
    t2 = model.text_encoder_2_config
    rcfg = tiny_unet_config(sdxl=True, cross_attention_dim=t2.hidden_size)
    rcfg = dataclasses.replace(
        rcfg,
        # refiner convention: pooled + 5 ids (orig, crop, aesthetic score)
        projection_class_embeddings_input_dim=t2.projection_dim + 5 * 8,
    )
    model.refiner_config = rcfg
    model.refiner_params = unet_model.init_params(jax.random.key(42), rcfg)

    base = pipe(
        model, prompt="a cat", height=H, width=W, num_inference_steps=4,
        denoising_end=0.5, output_type="latents", seed=21,
    )
    out = pipe(
        model,
        prompt="a cat",
        image=np.asarray(base.latents),
        num_inference_steps=4,
        denoising_start=0.5,
        height=H,
        width=W,
        seed=21,
        use_refiner=True,
    )
    assert out.images.shape == (1, H, W, 3)
    assert np.isfinite(out.images).all()


def test_use_refiner_without_loading_raises(pipe, sdxl):
    with pytest.raises(ValueError):
        pipe(sdxl, prompt="x", height=H, width=W, num_inference_steps=1,
             use_refiner=True)


def test_sd21_style_model(pipe):
    """SD2.1-style: single encoder, linear transformer projections,
    v-prediction scheduler."""
    import dataclasses

    import jax

    from stablediffusion_tpu.core.config import SchedulerConfig, tiny_unet_config
    from stablediffusion_tpu.models import unet as unet_model

    model = make_tiny_model("sd15")
    cfg = dataclasses.replace(
        tiny_unet_config(), use_linear_projection=True
    )
    model.unet_config = cfg
    model.unet_params = unet_model.init_params(jax.random.key(9), cfg)
    model.scheduler_config = SchedulerConfig(prediction_type="v_prediction")
    model._scheduler = None  # rebuild with the new config
    out = pipe(model, prompt="a cat", height=H, width=W,
               num_inference_steps=3, seed=17)
    assert out.images.shape == (1, H, W, 3)
    assert np.isfinite(out.images).all()


def test_multichip_batch_sharding(sd15):
    """Throughput serving: batch sharded over the 8-device CPU mesh."""
    from stablediffusion_tpu.parallel import make_mesh

    mesh = make_mesh()
    pipe_sharded = StableDiffusionUnifiedPipeline(mesh=mesh)
    pipe_single = StableDiffusionUnifiedPipeline()
    kw = dict(
        prompt=["a cat"] * 4,
        num_images_per_prompt=2,  # total batch 8 = mesh size
        height=H,
        width=W,
        num_inference_steps=2,
        seed=3,
    )
    a = pipe_sharded(sd15, **kw)
    b = pipe_single(sd15, **kw)
    assert a.images.shape == (8, H, W, 3)
    # sharded and single-device execution must agree numerically
    np.testing.assert_allclose(a.images, b.images, atol=2e-4)


def test_deepcache_interval(pipe, sd15):
    """Opt-in DeepCache acceleration: runs, differs slightly from exact,
    stays close (the deep features change slowly)."""
    kw = dict(prompt="a cat", height=H, width=W, num_inference_steps=6, seed=19)
    exact = pipe(sd15, **kw)
    turbo = pipe(sd15, **kw, cache_interval=2)
    turbo3 = pipe(sd15, **kw, cache_interval=3)  # non-divisible: tail steps full
    for out in (turbo, turbo3):
        assert out.images.shape == exact.images.shape
        assert np.isfinite(out.images).all()
        diff = np.abs(out.images - exact.images).mean()
        assert 0 < diff < 0.2, diff  # approximate but close


def test_tensor_parallel_params(sd15):
    """Optional TP: attention/MLP kernels sharded over the tensor axis;
    output identical to replicated execution."""
    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.models import unet as unet_model
    from stablediffusion_tpu.parallel import make_mesh
    from stablediffusion_tpu.parallel.tp import shard_params_tp

    mesh = make_mesh(data=4, tensor=2)
    sharded = shard_params_tp(sd15.unet_params, mesh)
    # q/k/v kernels actually sharded over tensor
    w = sharded["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"][
        "0"
    ]["attn1"]["to_q"]["weight"]
    assert not w.sharding.is_fully_replicated
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(1), (4, 77, sd15.unet_config.cross_attention_dim))
    a = unet_model.apply(sd15.unet_params, sd15.unet_config, x, jnp.asarray(500), ctx)
    b = unet_model.apply(sharded, sd15.unet_config, x, jnp.asarray(500), ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_concurrent_http_requests(sd15):
    """Two simultaneous POSTs serialize on the model lock and both succeed."""
    import http.client
    import json as _json
    import threading as _t
    from http.server import ThreadingHTTPServer

    import stablediffusion_tpu.serve.worker as worker
    from stablediffusion_tpu.serve.handler import Handler

    worker.HANDLER = Handler(model=sd15)
    server = ThreadingHTTPServer(("127.0.0.1", 0), worker._HTTPHandler)
    port = server.server_address[1]
    _t.Thread(target=server.serve_forever, daemon=True).start()
    results = [None, None]

    def post(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = _json.dumps({"id": f"c{i}", "input": {
            "prompt": "cat", "height": H, "width": W,
            "num_inference_steps": 2, "seed": i}})
        conn.request("POST", "/", body=body)
        results[i] = _json.loads(conn.getresponse().read())

    threads = [_t.Thread(target=post, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.shutdown()
    for r in results:
        assert r and "error" not in r, r
    assert results[0]["seed"] == 0 and results[1]["seed"] == 1


def test_controlnet(pipe, sd15, rng):
    """ControlNet runtime: zero-init net is an exact no-op; trained-ish
    (nonzero) weights steer the output; scale works."""
    import jax

    from stablediffusion_tpu.models import controlnet

    kw = dict(prompt="a cat", height=H, width=W, num_inference_steps=3, seed=23)
    base = pipe(sd15, **kw)

    sd15.controlnet_config = sd15.unet_config
    sd15.controlnet_params = controlnet.init_params(
        jax.random.key(3), sd15.unet_config
    )
    control = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    try:
        zero = pipe(sd15, **kw, control_image=control)
        # zero-init control convs -> identical to no controlnet
        np.testing.assert_allclose(zero.images, base.images, atol=1e-5)

        # make the zero convs nonzero -> output must change with the control
        p = sd15.controlnet_params
        p["controlnet_mid_block"]["weight"] = (
            jax.random.normal(jax.random.key(4),
                              p["controlnet_mid_block"]["weight"].shape) * 0.1
        )
        steered = pipe(sd15, **kw, control_image=control)
        assert np.abs(steered.images - base.images).max() > 1e-4
        # conditioning scale 0 -> back to baseline
        off = pipe(sd15, **kw, control_image=control,
                   controlnet_conditioning_scale=0.0)
        np.testing.assert_allclose(off.images, base.images, atol=1e-5)
    finally:
        sd15.controlnet_params = None
        sd15.controlnet_config = None


def test_control_image_without_controlnet_raises(pipe, sd15, rng):
    with pytest.raises(ValueError):
        pipe(sd15, prompt="x", height=H, width=W, num_inference_steps=1,
             control_image=rng.uniform(size=(1, H, W, 3)).astype(np.float32))


def test_sdxl_img2img_and_inpaint(pipe, sdxl, rng):
    init = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    out = pipe(sdxl, prompt="a cat", image=init, strength=0.6,
               num_inference_steps=4, height=H, width=W, seed=27)
    assert out.images.shape == (1, H, W, 3)
    mask = np.zeros((H, W), np.float32)
    mask[8:24, 8:24] = 1.0
    out2 = pipe(sdxl, prompt="a cat", image=init, mask_image=mask,
                num_inference_steps=3, height=H, width=W, seed=28)
    assert out2.images.shape == (1, H, W, 3)
    assert np.isfinite(out2.images).all()


def test_inpaint_bf16_dtype(sd15, rng):
    """Regression: the inpaint blend must not promote bf16 scan carries to
    f32 (only reproduced on the bf16 serving path; caught on real TPU)."""
    import jax.numpy as jnp

    pipe_bf16 = StableDiffusionUnifiedPipeline(dtype=jnp.bfloat16)
    init = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    mask = np.zeros((H, W), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe_bf16(sd15, prompt="cat", image=init, mask_image=mask,
                    num_inference_steps=2, height=H, width=W, seed=3)
    assert np.isfinite(out.images).all()


def test_precomputed_prompt_embeds(pipe, sd15):
    """prompt_embeds passthrough (the reference raises for this) matches
    text-encoding the same prompt."""
    import jax.numpy as jnp

    kw = dict(height=H, width=W, num_inference_steps=2, seed=6)
    ref = pipe(sd15, prompt="a cat", negative_prompt="bad", **kw)
    e, ne, _, _ = pipe.encode_prompt(
        sd15, "a cat", negative_prompt="bad", do_cfg=True
    )
    out = pipe(sd15, prompt=None, prompt_embeds=e,
               negative_prompt_embeds=ne, **kw)
    np.testing.assert_allclose(out.images, ref.images, atol=1e-5)


def test_edge_single_step(pipe, sd15):
    out = pipe(sd15, prompt="cat", height=H, width=W, num_inference_steps=1, seed=1)
    assert np.isfinite(out.images).all()


def test_edge_denoising_window_combo(pipe, sd15, rng):
    # start+end window inside img2img (refiner-style middle slice)
    lat = rng.standard_normal((1, H // 2, W // 2, 4)).astype(np.float32)
    out = pipe(sd15, prompt="cat", image=lat, num_inference_steps=8,
               denoising_start=0.25, denoising_end=0.75,
               height=H, width=W, seed=2, output_type="latents")
    assert out.latents.shape == (1, H // 2, W // 2, 4)
    with pytest.raises(ValueError):
        pipe(sd15, prompt="cat", image=lat, num_inference_steps=8,
             denoising_start=0.8, denoising_end=0.5, height=H, width=W)


def test_edge_num_images_with_batch_prompts(pipe, sd15):
    out = pipe(sd15, prompt=["a", "b", "c"], num_images_per_prompt=2,
               height=H, width=W, num_inference_steps=1, seed=3)
    assert out.images.shape == (6, H, W, 3)


def test_edge_do_cfg_false(sd15):
    p = StableDiffusionUnifiedPipeline(do_cfg=False)
    out = p(sd15, prompt="cat", height=H, width=W, num_inference_steps=2, seed=4)
    assert np.isfinite(out.images).all()
    # guidance_scale <= 1 also disables CFG on a cfg pipeline
    p2 = StableDiffusionUnifiedPipeline(do_cfg=True)
    out2 = p2(sd15, prompt="cat", height=H, width=W, num_inference_steps=2,
              seed=4, guidance_scale=1.0)
    np.testing.assert_array_equal(out.images, out2.images)


@pytest.mark.parametrize("name", ["euler", "DPM++ 2M", "uni_pc"])
def test_edge_img2img_sigma_schedulers(sd15, name, pipe, rng):
    """strength slicing must keep sigma tables aligned for sigma-families."""
    sd15.set_scheduler(name)
    try:
        init = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
        out = pipe(sd15, prompt="cat", image=init, strength=0.6,
                   num_inference_steps=5, height=H, width=W, seed=5)
        assert np.isfinite(out.images).all()
    finally:
        sd15.set_scheduler("DDIM")


@pytest.mark.parametrize("name", ["DDIM", "euler_a", "DPM++ 2M", "PNDM", "uni_pc", "LCM"])
def test_schedulers_bf16_pipeline(sd15, name):
    """Scan-carry dtype stability on the bf16 serving path for every
    stateful scheduler family (fp32 CPU tests can't catch promotions)."""
    import jax.numpy as jnp

    sd15.set_scheduler(name)
    try:
        pipe_bf16 = StableDiffusionUnifiedPipeline(dtype=jnp.bfloat16)
        out = pipe_bf16(sd15, prompt="cat", height=H, width=W,
                        num_inference_steps=3, seed=1)
        assert np.isfinite(out.images).all()
    finally:
        sd15.set_scheduler("DDIM")


def test_custom_schedule_through_pipeline(pipe, sd15):
    """P4 end-to-end: a user sigma list drives DPM++ 2M through __call__
    (overriding num_inference_steps), and a user timestep list drives DDIM;
    both must differ from the default grid's output and passing both must
    raise (the reference's retrieve_timesteps contract)."""
    sd15.set_scheduler("DPM++ 2M")
    kw = dict(prompt="a cat", height=H, width=W, seed=3)
    try:
        default = pipe(sd15, num_inference_steps=4, **kw)
        sigmas = [10.0, 3.0, 0.9, 0.2]
        custom = pipe(sd15, num_inference_steps=50, sigmas=sigmas, **kw)
        assert custom.images.shape == default.images.shape
        assert np.isfinite(custom.images).all()
        assert np.abs(custom.images - default.images).max() > 1e-6

        sd15.set_scheduler("DDIM")
        ts = [801, 534, 267, 1]
        custom_ts = pipe(sd15, num_inference_steps=50, timesteps=ts, **kw)
        assert np.isfinite(custom_ts.images).all()

        with pytest.raises(ValueError, match="only one of"):
            pipe(sd15, num_inference_steps=4, timesteps=ts, sigmas=sigmas, **kw)
    finally:
        sd15.set_scheduler("DDIM")


def test_per_sample_seed_list(pipe, sd15):
    """seed=[s0, s1] gives each batch element its own noise stream: sample i
    depends only on seed i (diffusers generator-list parity,
    ref sd_unified_pipeline.py:771-781)."""
    kw = dict(prompt=["a cat", "a dog"], height=H, width=W,
              num_inference_steps=2)
    pair = pipe(sd15, seed=[11, 22], **kw)
    assert pair.seed == [11, 22]
    swapped = pipe(sd15, seed=[33, 22], **kw)
    # sample 1 identical (same per-sample seed), sample 0 differs
    np.testing.assert_array_equal(pair.images[1], swapped.images[1])
    assert np.abs(pair.images[0] - swapped.images[0]).max() > 1e-6

    with pytest.raises(ValueError, match="seed list length"):
        pipe(sd15, seed=[1, 2, 3], **kw)


def test_per_sample_seed_img2img(pipe, sd15):
    img = np.tile(np.linspace(0, 1, 32, dtype=np.float32)[None, :, None],
                  (32, 1, 3))
    kw = dict(prompt=["a cat", "a dog"], image=[img, img], strength=0.6,
              num_inference_steps=3)
    a = pipe(sd15, seed=[5, 6], **kw)
    b = pipe(sd15, seed=[7, 6], **kw)
    np.testing.assert_array_equal(a.images[1], b.images[1])
    assert np.abs(a.images[0] - b.images[0]).max() > 1e-6


def test_per_sample_seed_ancestral_steps(pipe, sd15):
    """Ancestral schedulers draw per-STEP noise too; with a seed list that
    noise must also be per-sample: changing seed 0 cannot touch sample 1,
    even under euler_a (review finding: k_steps was seed_list[0]-global)."""
    sd15.set_scheduler("euler_a")
    try:
        kw = dict(prompt=["a cat", "a dog"], height=H, width=W,
                  num_inference_steps=3)
        a = pipe(sd15, seed=[11, 22], **kw)
        b = pipe(sd15, seed=[33, 22], **kw)
        np.testing.assert_array_equal(a.images[1], b.images[1])
        assert np.abs(a.images[0] - b.images[0]).max() > 1e-6
    finally:
        sd15.set_scheduler("DDIM")


def test_vae_tiling_wiring(sd15):
    """vae_tiling=True routes decode through models/vae.tiled_decode with
    the same latent normalization; at tiny sizes that's the early-return
    path, so the output matches the untiled pipeline to jit-vs-eager ULPs
    (the tiled branch runs the decoder eagerly)."""
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(num_inference_steps=2, height=32, width=32, seed=3)
    a = pipe(sd15, "a cat", **kw)
    b = pipe(sd15, "a cat", vae_tiling=True, **kw)
    np.testing.assert_allclose(a.images, b.images, atol=1e-6)


def test_vae_tiling_img2img_wiring(sd15):
    """vae_tiling also routes the img2img encode through tiled_encode
    (early-return at tiny sizes — exact same latents, ULP-level output)."""
    pipe = StableDiffusionUnifiedPipeline()
    init = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    kw = dict(image=init, strength=0.5, num_inference_steps=2,
              height=32, width=32, seed=4)
    a = pipe(sd15, "a cat", **kw)
    b = pipe(sd15, "a cat", vae_tiling=True, **kw)
    np.testing.assert_allclose(a.images, b.images, atol=1e-6)


def test_turbo_few_step_no_cfg(pipe, sd15):
    """SD-Turbo / SDXL-Turbo serving recipe (1–4 steps, trailing timesteps,
    guidance_scale=0): no CFG batch doubling, explicit `timesteps=` honored,
    single-step generation works end to end."""
    one = pipe(sd15, "a cat", height=H, width=W, num_inference_steps=1,
               guidance_scale=0.0, timesteps=[999], seed=5)
    assert one.images.shape == (1, H, W, 3)
    assert np.isfinite(one.images).all()

    sd15.set_scheduler("euler_a")
    four = pipe(sd15, "a cat", height=H, width=W, num_inference_steps=4,
                guidance_scale=0.0, timesteps=[999, 749, 499, 249], seed=5)
    assert np.isfinite(four.images).all()
    # CFG off means the negative prompt cannot change the output
    neg = pipe(sd15, "a cat", negative_prompt="dog", height=H, width=W,
               num_inference_steps=4, guidance_scale=0.0,
               timesteps=[999, 749, 499, 249], seed=5)
    np.testing.assert_allclose(four.images, neg.images, atol=1e-6)
