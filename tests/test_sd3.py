"""SD3 family: T5 parity vs transformers, flow-match scheduler oracle,
MMDiT pipeline e2e (the MMDiT forward anchor lives in test_torch_mirror)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_tpu.core.config import (
    SchedulerConfig,
    tiny_clip_config,
    tiny_sd3_config,
    tiny_vae_config,
)
from stablediffusion_tpu.models import clip, mmdit, t5, vae
from stablediffusion_tpu.pipelines.sd3 import SD3Model, StableDiffusion3Pipeline
from stablediffusion_tpu.schedulers import FlowMatchEulerScheduler
from tests.helpers import tiny_tokenizer


# ---------------------------------------------------------------------------
# T5 encoder vs transformers
# ---------------------------------------------------------------------------


class TestT5Parity:
    @pytest.fixture(scope="class")
    def pair(self):
        import torch
        from transformers import T5Config as HFT5Config
        from transformers import T5EncoderModel

        cfg = t5.tiny_t5_config()
        hf_cfg = HFT5Config(
            vocab_size=cfg.vocab_size,
            d_model=cfg.d_model,
            d_kv=cfg.d_kv,
            d_ff=cfg.d_ff,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            relative_attention_num_buckets=cfg.relative_attention_num_buckets,
            relative_attention_max_distance=cfg.relative_attention_max_distance,
            dense_act_fn="gelu_new",
            is_gated_act=True,
            feed_forward_proj="gated-gelu",
            dropout_rate=0.0,
        )
        torch.manual_seed(0)
        model = T5EncoderModel(hf_cfg).eval()
        from stablediffusion_tpu.io.torch_convert import convert_state_dict

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_state_dict(sd)
        return model, params, cfg

    def test_last_hidden_matches(self, pair):
        import torch

        model, params, cfg = pair
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(ids.astype(np.int64)))
        out = t5.apply(params, cfg, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(out), ref.last_hidden_state.numpy(), atol=1e-4, rtol=1e-4
        )

    def test_attention_mask(self, pair):
        import torch

        model, params, cfg = pair
        rng = np.random.default_rng(1)
        ids = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)
        mask = np.ones((2, 12), np.int32)
        mask[0, 8:] = 0
        mask[1, 5:] = 0
        with torch.no_grad():
            ref = model(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
            )
        out = t5.apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        # compare only unmasked positions (masked rows differ by convention)
        for b in range(2):
            keep = mask[b].astype(bool)
            np.testing.assert_allclose(
                np.asarray(out)[b][keep],
                ref.last_hidden_state.numpy()[b][keep],
                atol=1e-4,
                rtol=1e-4,
            )


# ---------------------------------------------------------------------------
# flow-match scheduler
# ---------------------------------------------------------------------------


class TestFlowMatchScheduler:
    def test_sigma_table(self):
        s = FlowMatchEulerScheduler(SchedulerConfig(shift=3.0))
        # shifted sigma_max is exactly 1 (pure-noise start)
        assert s.sigma_max == pytest.approx(1.0)
        plan = s.plan(10)
        sig = np.asarray(plan.sigmas)
        assert sig[0] == pytest.approx(1.0)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0)
        assert float(plan.init_noise_sigma) == pytest.approx(1.0)
        # timesteps = sigma * T
        np.testing.assert_allclose(
            np.asarray(plan.timesteps), sig[:-1] * 1000.0, rtol=1e-6
        )

    @pytest.mark.parametrize("steps", [1, 4, 28])
    def test_linear_flow_oracle(self, steps):
        """With the EXACT velocity v = eps - x0 (straight rectified path),
        Euler integration must land on x0 precisely for ANY step count."""
        s = FlowMatchEulerScheduler(SchedulerConfig(shift=3.0))
        plan = s.plan(steps)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
        eps = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
        x = (1.0 - plan.sigmas[0]) * x0 + plan.sigmas[0] * eps
        state = s.init_state(plan, x.shape)
        v = eps - x0
        for i in range(plan.num_steps):
            x, state = s.step(plan, state, i, v, x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-5)

    def test_add_noise_index_matches_formula(self):
        s = FlowMatchEulerScheduler(SchedulerConfig())
        plan = s.plan(8)
        x0 = jnp.ones((1, 2, 2, 4))
        eps = jnp.full((1, 2, 2, 4), 2.0)
        for i in (0, 3):
            sigma = float(plan.sigmas[i])
            got = s.add_noise_index(plan, x0, eps, i)
            np.testing.assert_allclose(
                np.asarray(got), (1 - sigma) * 1.0 + sigma * 2.0, rtol=1e-6
            )

    def test_custom_sigmas(self):
        s = FlowMatchEulerScheduler(SchedulerConfig(shift=1.0))
        plan = s.plan(0, sigmas=[0.8, 0.5, 0.2])
        np.testing.assert_allclose(
            np.asarray(plan.sigmas), [0.8, 0.5, 0.2, 0.0], atol=1e-6
        )
        assert plan.num_steps == 3


# ---------------------------------------------------------------------------
# pipeline e2e (tiny)
# ---------------------------------------------------------------------------


def _t5_tokenizer(texts, max_length=16):
    if isinstance(texts, str):
        texts = [texts]
    out = np.zeros((len(texts), max_length), np.int32)
    for i, t in enumerate(texts):
        ids = [(ord(c) % 500) + 2 for c in t][: max_length - 1] + [1]
        out[i, : len(ids)] = ids
    return out


def make_tiny_sd3_model(seed=0) -> SD3Model:
    keys = jax.random.split(jax.random.key(seed), 8)
    tf_cfg = tiny_sd3_config()
    vae_cfg = tiny_vae_config()
    # CLIP towers: L-like (proj 12) and G-like (proj 12); joint padding checks
    te_cfg = dataclasses.replace(
        tiny_clip_config(with_projection=True), projection_dim=12
    )
    te2_cfg = dataclasses.replace(
        tiny_clip_config(with_projection=True), projection_dim=8
    )
    t5_cfg = dataclasses.replace(t5.tiny_t5_config(), d_model=tf_cfg.joint_attention_dim)
    assert te_cfg.projection_dim + te2_cfg.projection_dim == (
        tf_cfg.pooled_projection_dim
    )
    return SD3Model(
        transformer_config=tf_cfg,
        transformer_params=mmdit.init_params(keys[0], tf_cfg),
        vae_config=vae_cfg,
        vae_params=vae.init_params(keys[1], vae_cfg),
        text_encoder_config=te_cfg,
        text_encoder_params=clip.init_params(keys[2], te_cfg),
        tokenizer=tiny_tokenizer(),
        text_encoder_2_config=te2_cfg,
        text_encoder_2_params=clip.init_params(keys[3], te2_cfg),
        tokenizer_2=tiny_tokenizer(pad_token_id=0),
        text_encoder_3_config=t5_cfg,
        text_encoder_3_params=t5.init_params(keys[4], t5_cfg),
        tokenizer_3=_t5_tokenizer,
        scheduler_config=SchedulerConfig(shift=3.0),
    )


class TestSD3Pipeline:
    @pytest.fixture(scope="class")
    def model(self):
        return make_tiny_sd3_model()

    def test_txt2img(self, model):
        pipe = StableDiffusion3Pipeline()
        out = pipe(
            model, prompt="a cat", num_inference_steps=3, height=16, width=16,
            seed=7, max_sequence_length=16,
        )
        assert out.images.shape == (1, 16, 16, 3)
        assert np.isfinite(out.images).all()
        again = pipe(
            model, prompt="a cat", num_inference_steps=3, height=16, width=16,
            seed=7, max_sequence_length=16,
        )
        np.testing.assert_allclose(out.images, again.images, atol=1e-6)

    def test_output_type_uint8(self, model):
        pipe = StableDiffusion3Pipeline()
        kw = dict(prompt="a cat", num_inference_steps=2, height=16, width=16,
                  seed=7, max_sequence_length=16)
        f = pipe(model, **kw)
        u = pipe(model, **kw, output_type="uint8")
        assert u.images.dtype == np.uint8
        ref = (f.images * 255).round().astype(np.int16)
        assert np.abs(ref - u.images.astype(np.int16)).max() <= 1

    def test_txt2img_no_t5(self, model):
        """The T5-free serving configuration (text_encoder_3=None)."""
        m = dataclasses.replace(
            model, text_encoder_3_config=None, text_encoder_3_params=None,
            tokenizer_3=None,
        )
        pipe = StableDiffusion3Pipeline()
        out = pipe(
            m, prompt="a dog", num_inference_steps=2, height=16, width=16,
            seed=3, max_sequence_length=16,
        )
        assert out.images.shape == (1, 16, 16, 3)
        assert np.isfinite(out.images).all()

    def test_img2img(self, model):
        pipe = StableDiffusion3Pipeline()
        init = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
        out = pipe(
            model, prompt="a cat", image=init, strength=0.6,
            num_inference_steps=4, height=16, width=16, seed=5,
            max_sequence_length=16,
        )
        assert out.images.shape == (1, 16, 16, 3)
        assert np.isfinite(out.images).all()

    def test_inpaint(self, model):
        """SD3 inpaint = per-step latent blend (no 9-ch MM-DiT variant).
        diffusers StableDiffusion3InpaintPipeline semantics."""
        pipe = StableDiffusion3Pipeline()
        rng = np.random.default_rng(0)
        init = rng.random((16, 16, 3)).astype(np.float32)
        mask = np.zeros((16, 16), np.float32)
        mask[:, 8:] = 1.0  # repaint the right half
        out = pipe(
            model, prompt="a cat", image=init, mask_image=mask,
            strength=1.0, num_inference_steps=4, height=16, width=16,
            seed=5, max_sequence_length=16,
        )
        assert out.images.shape == (1, 16, 16, 3)
        assert np.isfinite(out.images).all()
        # mask requires the image
        with pytest.raises(ValueError, match="mask_image"):
            pipe(model, prompt="x", mask_image=mask, height=16, width=16,
                 num_inference_steps=2, max_sequence_length=16)

    def test_inpaint_blend_semantics(self, model):
        """Blend rule at the _denoise_sd3 level: an all-zeros mask returns
        the original-image latents EXACTLY (last step assigns them); an
        all-ones mask equals the unmasked denoise exactly."""
        from stablediffusion_tpu.pipelines.sd3 import _denoise_sd3

        cfg = model.transformer_config
        B, h, w = 1, 2, 2
        lc = model.vae_config.latent_channels
        key = jax.random.key(0)
        lat = jax.random.normal(key, (B, h, w, lc), jnp.float32)
        il = jax.random.normal(jax.random.key(1), lat.shape, jnp.float32)
        nz = jax.random.normal(jax.random.key(2), lat.shape, jnp.float32)
        embeds = jax.random.normal(
            jax.random.key(3), (B, 8, cfg.joint_attention_dim), jnp.float32
        )
        pooled = jax.random.normal(
            jax.random.key(4), (B, cfg.pooled_projection_dim), jnp.float32
        )
        sched = model.scheduler
        plan = sched.plan(3)
        kw = dict(config=cfg, scheduler=sched, do_cfg=False)
        args = (model.transformer_params, lat, embeds, pooled, plan,
                jnp.asarray(1.0, jnp.float32))
        base = _denoise_sd3(*args, None, None, None, **kw)
        keep_all = _denoise_sd3(*args, jnp.zeros((B, h, w, 1)), il, nz, **kw)
        np.testing.assert_array_equal(np.asarray(keep_all), np.asarray(il))
        repaint_all = _denoise_sd3(*args, jnp.ones((B, h, w, 1)), il, nz, **kw)
        np.testing.assert_array_equal(
            np.asarray(repaint_all), np.asarray(base)
        )

    def test_negative_prompt_and_batch(self, model):
        pipe = StableDiffusion3Pipeline()
        out = pipe(
            model, prompt=["a cat", "a dog"], negative_prompt="ugly",
            num_inference_steps=2, height=16, width=16, seed=5,
            num_images_per_prompt=2, max_sequence_length=16,
        )
        assert out.images.shape == (4, 16, 16, 3)


class TestSD3VAE:
    def test_quantconv_free_roundtrip(self):
        cfg = dataclasses.replace(
            tiny_vae_config(), use_quant_conv=False, use_post_quant_conv=False,
            shift_factor=0.1, scaling_factor=1.5,
        )
        params = vae.init_params(jax.random.key(0), cfg)
        assert "quant_conv" not in params and "post_quant_conv" not in params
        from stablediffusion_tpu.pipelines.sd3 import (
            _sd3_vae_decode,
            _sd3_vae_encode,
        )

        img = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 16, 16, 3)) * 0.5,
            jnp.float32,
        )
        z = _sd3_vae_encode(params, img, jax.random.key(1), config=cfg)
        assert z.shape[-1] == cfg.latent_channels
        out = _sd3_vae_decode(params, z, config=cfg)
        assert out.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_sd3_multichip_batch_sharding():
    """SD3 DP inference: batch sharded over the 8-device CPU mesh must match
    single-device execution exactly (same pattern as the unified pipeline's
    test_multichip_batch_sharding)."""
    from stablediffusion_tpu.parallel import make_mesh

    model = make_tiny_sd3_model()
    kw = dict(
        prompt=["a cat"] * 4,
        num_images_per_prompt=2,  # total batch 8 = mesh size
        height=16,
        width=16,
        num_inference_steps=2,
        seed=9,
        max_sequence_length=16,
    )
    a = StableDiffusion3Pipeline(mesh=make_mesh())(model, **kw)
    b = StableDiffusion3Pipeline()(model, **kw)
    assert a.images.shape == (8, 16, 16, 3)
    np.testing.assert_allclose(a.images, b.images, atol=2e-4)


def test_sd3_tensor_parallel_params():
    """TP sharding generalizes to the MM-DiT: both streams' attention/MLP
    kernels shard over the tensor axis; output identical to replicated."""
    from stablediffusion_tpu.models import mmdit
    from stablediffusion_tpu.parallel import make_mesh
    from stablediffusion_tpu.parallel.tp import shard_params_tp

    model = make_tiny_sd3_model()
    mesh = make_mesh(data=4, tensor=2)
    sharded = shard_params_tp(model.transformer_params, mesh)
    blk = sharded["transformer_blocks"]["0"]["attn"]
    assert not blk["to_q"]["weight"].sharding.is_fully_replicated
    assert not blk["add_k_proj"]["weight"].sharding.is_fully_replicated
    assert not blk["to_add_out"]["weight"].sharding.is_fully_replicated

    cfg = model.transformer_config
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(
        jax.random.key(1), (2, 9, cfg.joint_attention_dim)
    )
    pooled = jax.random.normal(
        jax.random.key(2), (2, cfg.pooled_projection_dim)
    )
    t = jnp.asarray([500.0, 20.0])
    a = mmdit.apply(model.transformer_params, cfg, x, t, ctx, pooled)
    b = mmdit.apply(sharded, cfg, x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sd3_vae_tiling_wiring():
    """vae_tiling routes SD3 decode through models/vae.tiled_decode with the
    shift/scale normalization; tiny sizes take the early-return path so the
    output matches the untiled pipeline to jit-vs-eager ULPs."""
    model = make_tiny_sd3_model()
    pipe = StableDiffusion3Pipeline()
    kw = dict(num_inference_steps=2, height=16, width=16, seed=5,
              max_sequence_length=16)
    a = pipe(model, "a cat", **kw)
    b = pipe(model, "a cat", vae_tiling=True, **kw)
    np.testing.assert_allclose(a.images, b.images, atol=1e-6)


def test_sd3_vae_tiling_img2img_wiring():
    """vae_tiling also routes the SD3 img2img encode through tiled_encode
    (early-return at tiny sizes — output matches untiled to jit/eager ULPs)."""
    model = make_tiny_sd3_model()
    pipe = StableDiffusion3Pipeline()
    init = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    kw = dict(image=init, strength=0.6, num_inference_steps=2, height=16,
              width=16, seed=5, max_sequence_length=16)
    a = pipe(model, "a cat", **kw)
    b = pipe(model, "a cat", vae_tiling=True, **kw)
    np.testing.assert_allclose(a.images, b.images, atol=1e-6)


def test_sd3_save_load_roundtrip(tmp_path):
    """save_sd3_model ⇄ load_sd3_model: T5-free pipeline outputs identical;
    with-T5 param trees byte-identical and tokenizer_3 loads first-party."""
    import dataclasses as _dc
    import json as _json
    import os as _os

    from stablediffusion_tpu.io.loader import load_sd3_model, save_sd3_model
    from tests.test_loader import _write_tokenizer_files
    from tests.test_t5_tokenizer import _write_spiece_model, make_vocab

    src = make_tiny_sd3_model()

    # --- T5-free round trip: identical generations -----------------------
    free = _dc.replace(
        src, text_encoder_3_config=None, text_encoder_3_params=None,
        tokenizer_3=None,
    )
    d = str(tmp_path / "sd3-free")
    save_sd3_model(free, d)
    _write_tokenizer_files(_os.path.join(d, "tokenizer"))
    _write_tokenizer_files(_os.path.join(d, "tokenizer_2"))
    loaded = load_sd3_model(d, variant=None)
    assert loaded.text_encoder_3_params is None
    assert loaded.transformer_config == src.transformer_config
    pipe = StableDiffusion3Pipeline()
    kw = dict(num_inference_steps=2, height=16, width=16, seed=3,
              max_sequence_length=16)
    a = pipe(free, "a cat", **kw)
    b = pipe(loaded, "a cat", **kw)
    np.testing.assert_allclose(a.images, b.images, atol=1e-5)

    # --- with T5: params round-trip + first-party tokenizer_3 ------------
    d2 = str(tmp_path / "sd3-full")
    save_sd3_model(src, d2)
    _write_tokenizer_files(_os.path.join(d2, "tokenizer"))
    _write_tokenizer_files(_os.path.join(d2, "tokenizer_2"))
    _os.makedirs(_os.path.join(d2, "tokenizer_3"))
    _write_spiece_model(
        _os.path.join(d2, "tokenizer_3", "spiece.model"), make_vocab()
    )
    loaded2 = load_sd3_model(d2, variant=None)
    from stablediffusion_tpu.tokenizer.sentencepiece_unigram import (
        SentencePieceUnigramTokenizer,
    )

    assert isinstance(loaded2.tokenizer_3, SentencePieceUnigramTokenizer)
    flat_src = jax.tree_util.tree_leaves(src.text_encoder_3_params)
    flat_new = jax.tree_util.tree_leaves(loaded2.text_encoder_3_params)
    assert len(flat_src) == len(flat_new)
    for a_, b_ in zip(flat_src, flat_new):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))


def test_sd3_self_loading_folder(tmp_path):
    """save_sd3_model writes the tokenizer folders itself when the attached
    tokenizers can serialize (first-party CLIP BPE save_pretrained +
    SentencePieceUnigramTokenizer.save_pretrained): the folder loads with
    NO manual tokenizer copying, T5 ids round-trip exactly through the
    written tokenizer.json, and the loaded pipeline reproduces the source.
    This is the bench_coldstart --model sd3 prep path."""
    from stablediffusion_tpu.io.loader import load_sd3_model, save_sd3_model
    from stablediffusion_tpu.tokenizer.sentencepiece_unigram import (
        SentencePieceUnigramTokenizer,
    )
    from stablediffusion_tpu.utils.testing import bench_t5_tokenizer

    src = dataclasses.replace(
        make_tiny_sd3_model(), tokenizer_3=bench_t5_tokenizer(extra_ids=4)
    )
    d = str(tmp_path / "sd3-auto")
    save_sd3_model(src, d)
    for sub in ("tokenizer", "tokenizer_2", "tokenizer_3"):
        assert os.path.isdir(os.path.join(d, sub)), sub
    loaded = load_sd3_model(d, variant=None)
    assert isinstance(loaded.tokenizer_3, SentencePieceUnigramTokenizer)
    text = "a photograph of an astronaut riding a horse <extra_id_0>"
    np.testing.assert_array_equal(
        src.tokenizer_3(text, max_length=24),
        loaded.tokenizer_3(text, max_length=24),
    )
    assert loaded.tokenizer_3.vocab_size == src.tokenizer_3.vocab_size
    pipe = StableDiffusion3Pipeline()
    kw = dict(num_inference_steps=2, height=16, width=16, seed=5,
              max_sequence_length=16)
    a = pipe(src, "an astronaut", **kw)
    b = pipe(loaded, "an astronaut", **kw)
    np.testing.assert_allclose(a.images, b.images, atol=1e-5)
