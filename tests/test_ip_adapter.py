"""IP-Adapter runtime: vision tower parity vs transformers, attn-index
mapping, weight fuse/strip, decoupled-attention forward, pipeline e2e."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_tpu.core.config import (
    SD15_UNET,
    SDXL_UNET,
    tiny_clip_vision_config,
    tiny_unet_config,
)
from stablediffusion_tpu.models import clip_vision, unet
from stablediffusion_tpu.models.ip_adapter import (
    ImageProjConfig,
    IPAdapter,
    cross_attn_paths,
    fuse_ip_weights,
    image_proj_apply,
    infer_image_proj_config,
    convert_image_proj,
    resampler_apply,
    strip_ip_weights,
)
from tests.helpers import make_tiny_model


# ---------------------------------------------------------------------------
# CLIP vision tower vs transformers
# ---------------------------------------------------------------------------


class TestCLIPVisionParity:
    @pytest.fixture(scope="class")
    def torch_pair(self):
        import torch
        from transformers import CLIPVisionConfig as HFConfig
        from transformers import CLIPVisionModelWithProjection

        cfg = tiny_clip_vision_config()
        hf_cfg = HFConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            projection_dim=cfg.projection_dim,
            hidden_act="gelu",
        )
        torch.manual_seed(0)
        model = CLIPVisionModelWithProjection(hf_cfg).eval()
        from stablediffusion_tpu.io.torch_convert import convert_state_dict

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_state_dict(sd)
        return model, params, cfg

    def test_image_embeds_match(self, torch_pair):
        import torch

        model, params, cfg = torch_pair
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = model(pixel_values=torch.from_numpy(pixels),
                        output_hidden_states=True)
        out = clip_vision.apply(
            params, cfg, jnp.asarray(pixels.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(
            np.asarray(out.image_embeds), ref.image_embeds.numpy(),
            atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out.last_hidden_state), ref.last_hidden_state.numpy(),
            atol=1e-4, rtol=1e-4,
        )
        # penultimate hidden states (IP-Adapter-Plus conditioning)
        np.testing.assert_allclose(
            np.asarray(out.penultimate()), ref.hidden_states[-2].numpy(),
            atol=1e-4, rtol=1e-4,
        )


# ---------------------------------------------------------------------------
# attn2 enumeration (diffusers attn_processors order)
# ---------------------------------------------------------------------------


class TestCrossAttnPaths:
    def test_sd15_count(self):
        paths = cross_attn_paths(SD15_UNET)
        assert len(paths) == 16  # diffusers SD1.5: ip keys 1..31 odd
        assert paths[0][:2] == ("down_blocks", "0")
        assert paths[-1][0] == "mid_block"  # mid enumerates last

    def test_sdxl_count(self):
        paths = cross_attn_paths(SDXL_UNET)
        assert len(paths) == 70  # diffusers SDXL: ip keys 1..139 odd
        # down: 2*2 + 2*10 = 24; up: 3*10 + 3*2 = 36; mid: 10
        down = [p for p in paths if p[0] == "down_blocks"]
        up = [p for p in paths if p[0] == "up_blocks"]
        mid = [p for p in paths if p[0] == "mid_block"]
        assert (len(down), len(up), len(mid)) == (24, 36, 10)
        assert paths.index(mid[0]) == 60  # after all down+up

    def test_tiny_order(self):
        cfg = tiny_unet_config()
        paths = cross_attn_paths(cfg)
        assert [p[0] for p in paths] == [
            "down_blocks", "up_blocks", "up_blocks", "mid_block",
        ]


# ---------------------------------------------------------------------------
# fuse / strip / forward
# ---------------------------------------------------------------------------


def _make_ip_sd(cfg, rng, inner_by_path=None):
    """Synthetic torch-layout ip_adapter dict matching a UNet config."""
    paths = cross_attn_paths(cfg)
    sd = {}
    ch = cfg.block_out_channels
    n_blocks = len(ch)
    for i, p in enumerate(paths):
        if p[0] == "down_blocks":
            c = ch[int(p[1])]
        elif p[0] == "up_blocks":
            c = tuple(reversed(ch))[int(p[1])]
        else:
            c = ch[-1]
        key_id = 2 * i + 1
        sd[f"{key_id}.to_k_ip.weight"] = rng.standard_normal(
            (c, cfg.cross_attention_dim)
        ).astype(np.float32) * 0.05
        sd[f"{key_id}.to_v_ip.weight"] = rng.standard_normal(
            (c, cfg.cross_attention_dim)
        ).astype(np.float32) * 0.05
    return sd


class TestFuseForward:
    def test_fuse_strip_roundtrip(self):
        cfg = tiny_unet_config()
        params = unet.init_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(1)
        ip_sd = _make_ip_sd(cfg, rng)
        fused = fuse_ip_weights(params, cfg, ip_sd)
        # every attn2 node gained ip kernels, converted to (in, out)
        for path in cross_attn_paths(cfg):
            node = fused
            for p in path:
                node = node[p]
            assert node["to_k_ip"]["weight"].shape[0] == cfg.cross_attention_dim
        # base untouched
        for path in cross_attn_paths(cfg):
            node = params
            for p in path:
                node = node[p]
            assert "to_k_ip" not in node
        stripped = strip_ip_weights(fused)
        assert jax.tree_util.tree_structure(stripped) == (
            jax.tree_util.tree_structure(params)
        )

    def test_incomplete_checkpoint_raises(self):
        cfg = tiny_unet_config()
        params = unet.init_params(jax.random.key(0), cfg)
        ip_sd = _make_ip_sd(cfg, np.random.default_rng(1))
        ip_sd.pop("1.to_k_ip.weight")
        with pytest.raises(ValueError, match="matched"):
            fuse_ip_weights(params, cfg, ip_sd)

    def test_forward_scale_semantics(self):
        cfg = tiny_unet_config()
        params = unet.init_params(jax.random.key(0), cfg)
        fused = fuse_ip_weights(
            params, cfg, _make_ip_sd(cfg, np.random.default_rng(1))
        )
        x = jax.random.normal(jax.random.key(2), (1, 8, 8, 4))
        t = jnp.asarray(10)
        ctx = jax.random.normal(jax.random.key(3), (1, 7, cfg.cross_attention_dim))
        ip_tokens = jax.random.normal(
            jax.random.key(4), (1, 4, cfg.cross_attention_dim)
        )
        base_out = unet.apply(params, cfg, x, t, ctx)
        # scale 0 == no adapter influence
        zero = unet.apply(
            fused, cfg, x, t, ctx, ip_hidden_states=ip_tokens, ip_scale=0.0
        )
        np.testing.assert_allclose(
            np.asarray(zero), np.asarray(base_out), atol=1e-5
        )
        # no tokens == base even with fused weights
        none_out = unet.apply(fused, cfg, x, t, ctx)
        np.testing.assert_allclose(
            np.asarray(none_out), np.asarray(base_out), atol=0
        )
        # scale 1 changes the output
        one = unet.apply(
            fused, cfg, x, t, ctx, ip_hidden_states=ip_tokens, ip_scale=1.0
        )
        assert not np.allclose(np.asarray(one), np.asarray(base_out), atol=1e-4)


# ---------------------------------------------------------------------------
# image projection models
# ---------------------------------------------------------------------------


class TestImageProj:
    def test_standard_proj_matches_numpy(self):
        rng = np.random.default_rng(0)
        clip_dim, xdim, tokens = 12, 8, 4
        sd = {
            "proj.weight": rng.standard_normal((tokens * xdim, clip_dim)).astype(np.float32),
            "proj.bias": rng.standard_normal(tokens * xdim).astype(np.float32),
            "norm.weight": rng.standard_normal(xdim).astype(np.float32),
            "norm.bias": rng.standard_normal(xdim).astype(np.float32),
        }
        cfg = infer_image_proj_config(sd)
        assert cfg == ImageProjConfig(
            kind="proj", num_tokens=tokens, cross_attention_dim=xdim
        )
        params = convert_image_proj(sd)
        embeds = rng.standard_normal((2, clip_dim)).astype(np.float32)
        out = image_proj_apply(params, cfg, jnp.asarray(embeds))
        assert out.shape == (2, tokens, xdim)
        # manual: linear -> reshape -> layernorm
        h = embeds @ sd["proj.weight"].T + sd["proj.bias"]
        h = h.reshape(2, tokens, xdim)
        mu = h.mean(-1, keepdims=True)
        var = h.var(-1, keepdims=True)
        ref = (h - mu) / np.sqrt(var + 1e-5) * sd["norm.weight"] + sd["norm.bias"]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_resampler_infer_and_shapes(self):
        rng = np.random.default_rng(0)
        dim, embed_dim, out_dim, heads, dim_head = 16, 24, 8, 2, 64
        inner = heads * dim_head
        depth, nq = 2, 4
        sd = {
            "latents": rng.standard_normal((1, nq, dim)).astype(np.float32),
            "proj_in.weight": rng.standard_normal((dim, embed_dim)).astype(np.float32),
            "proj_in.bias": np.zeros(dim, np.float32),
            "proj_out.weight": rng.standard_normal((out_dim, dim)).astype(np.float32),
            "proj_out.bias": np.zeros(out_dim, np.float32),
            "norm_out.weight": np.ones(out_dim, np.float32),
            "norm_out.bias": np.zeros(out_dim, np.float32),
        }
        for d in range(depth):
            p = f"layers.{d}"
            sd[f"{p}.0.norm1.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.0.norm1.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.0.norm2.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.0.norm2.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.0.to_q.weight"] = rng.standard_normal((inner, dim)).astype(np.float32) * 0.05
            sd[f"{p}.0.to_kv.weight"] = rng.standard_normal((2 * inner, dim)).astype(np.float32) * 0.05
            sd[f"{p}.0.to_out.weight"] = rng.standard_normal((dim, inner)).astype(np.float32) * 0.05
            sd[f"{p}.1.0.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.1.0.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.1.1.weight"] = rng.standard_normal((4 * dim, dim)).astype(np.float32) * 0.05
            sd[f"{p}.1.3.weight"] = rng.standard_normal((dim, 4 * dim)).astype(np.float32) * 0.05
        cfg = infer_image_proj_config(sd)
        assert cfg.kind == "resampler"
        assert (cfg.num_tokens, cfg.depth, cfg.heads) == (nq, depth, heads)
        assert cfg.cross_attention_dim == out_dim
        assert cfg.embedding_dim == embed_dim
        params = convert_image_proj(sd)
        hidden = rng.standard_normal((2, 10, embed_dim)).astype(np.float32)
        out = resampler_apply(params, cfg, jnp.asarray(hidden))
        assert out.shape == (2, nq, out_dim)
        assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# wrapper + pipeline e2e
# ---------------------------------------------------------------------------


class TestPipelineE2E:
    def _save_ip_checkpoint(self, tmp_path, model):
        from stablediffusion_tpu.io.safetensors_io import save_safetensors

        rng = np.random.default_rng(7)
        cfg = model.unet_config
        ip_sd = _make_ip_sd(cfg, rng)
        clip_dim = 16
        flat = {f"ip_adapter.{k}": v for k, v in ip_sd.items()}
        tokens = 4
        flat["image_proj.proj.weight"] = rng.standard_normal(
            (tokens * cfg.cross_attention_dim, clip_dim)
        ).astype(np.float32) * 0.05
        flat["image_proj.proj.bias"] = np.zeros(
            tokens * cfg.cross_attention_dim, np.float32
        )
        flat["image_proj.norm.weight"] = np.ones(cfg.cross_attention_dim, np.float32)
        flat["image_proj.norm.bias"] = np.zeros(cfg.cross_attention_dim, np.float32)
        path = str(tmp_path / "ip_adapter.safetensors")
        save_safetensors(flat, path)
        return path, clip_dim

    def test_load_set_scale_unload(self, tmp_path):
        model = make_tiny_model()
        path, clip_dim = self._save_ip_checkpoint(tmp_path, model)
        base_tree = jax.tree_util.tree_structure(model.unet_params)
        model.load_ip_adapter(path)
        assert model.ip_adapter is not None
        assert model.ip_adapter.num_tokens == 4
        model.set_ip_adapter_scale(0.6)
        assert model.ip_scale == 0.6
        model.unload_ip_adapter()
        assert model.ip_adapter is None
        assert jax.tree_util.tree_structure(model.unet_params) == base_tree

    def test_pipeline_with_embeds(self, tmp_path):
        from stablediffusion_tpu.pipelines import StableDiffusionUnifiedPipeline

        model = make_tiny_model()
        path, clip_dim = self._save_ip_checkpoint(tmp_path, model)
        model.load_ip_adapter(path)
        pipe = StableDiffusionUnifiedPipeline()
        xdim = model.unet_config.cross_attention_dim
        tokens = np.random.default_rng(3).standard_normal((1, 4, xdim)).astype(
            np.float32
        )
        out = pipe(
            model,
            prompt="a cat",
            num_inference_steps=2,
            height=16,
            width=16,
            seed=42,
            ip_adapter_image_embeds=tokens,
        )
        assert out.images.shape == (1, 16, 16, 3)
        # scale 0 reproduces the no-adapter image
        out0 = pipe(
            model,
            prompt="a cat",
            num_inference_steps=2,
            height=16,
            width=16,
            seed=42,
            ip_adapter_image_embeds=tokens,
            ip_adapter_scale=0.0,
        )
        model.unload_ip_adapter()
        ref = pipe(
            model, prompt="a cat", num_inference_steps=2, height=16, width=16,
            seed=42,
        )
        np.testing.assert_allclose(out0.images, ref.images, atol=2e-3)
        assert not np.allclose(out.images, ref.images, atol=2e-3)

    def test_pipeline_with_image_and_encoder(self, tmp_path):
        """Full path: CLIP-vision encode -> project -> decoupled attention."""
        from stablediffusion_tpu.pipelines import StableDiffusionUnifiedPipeline

        model = make_tiny_model()
        # tiny vision tower: clip_dim must match image_proj input (16)
        vcfg = dataclasses.replace(
            tiny_clip_vision_config(), projection_dim=16
        )
        model.image_encoder_config = vcfg
        model.image_encoder_params = clip_vision.init_params(
            jax.random.key(9), vcfg
        )
        path, _ = self._save_ip_checkpoint(tmp_path, model)
        model.load_ip_adapter(path)
        pipe = StableDiffusionUnifiedPipeline()
        image = np.random.default_rng(5).random((32, 32, 3)).astype(np.float32)
        out = pipe(
            model,
            prompt="a cat",
            num_inference_steps=2,
            height=16,
            width=16,
            seed=42,
            ip_adapter_image=image,
        )
        assert out.images.shape == (1, 16, 16, 3)
        assert np.isfinite(out.images).all()


def test_pipeline_with_embeds_sdxl(tmp_path):
    """IP-Adapter on the SDXL variant (uneven per-block heads, dual towers):
    fuse + generate + scale-0 reproduces the no-adapter image."""
    from stablediffusion_tpu.io.safetensors_io import save_safetensors
    from stablediffusion_tpu.pipelines import StableDiffusionUnifiedPipeline

    model = make_tiny_model("sdxl")
    cfg = model.unet_config
    rng = np.random.default_rng(11)
    flat = {f"ip_adapter.{k}": v for k, v in _make_ip_sd(cfg, rng).items()}
    tokens_n, clip_dim = 4, 16
    flat["image_proj.proj.weight"] = rng.standard_normal(
        (tokens_n * cfg.cross_attention_dim, clip_dim)
    ).astype(np.float32) * 0.05
    flat["image_proj.proj.bias"] = np.zeros(
        tokens_n * cfg.cross_attention_dim, np.float32
    )
    flat["image_proj.norm.weight"] = np.ones(cfg.cross_attention_dim, np.float32)
    flat["image_proj.norm.bias"] = np.zeros(cfg.cross_attention_dim, np.float32)
    path = str(tmp_path / "ip_sdxl.safetensors")
    save_safetensors(flat, path)

    model.load_ip_adapter(path)
    pipe = StableDiffusionUnifiedPipeline()
    xdim = cfg.cross_attention_dim
    tokens = rng.standard_normal((1, 4, xdim)).astype(np.float32)
    kw = dict(prompt="a cat", num_inference_steps=2, height=16, width=16,
              seed=42)
    out = pipe(model, ip_adapter_image_embeds=tokens, **kw)
    assert out.images.shape == (1, 16, 16, 3)
    out0 = pipe(model, ip_adapter_image_embeds=tokens, ip_adapter_scale=0.0, **kw)
    model.unload_ip_adapter()
    ref = pipe(model, **kw)
    np.testing.assert_allclose(out0.images, ref.images, atol=2e-3)
    assert not np.allclose(out.images, ref.images, atol=2e-3)
