"""Textual inversion (beyond-parity; diffusers load_textual_inversion
analog): format handling (diffusers/A1111 .pt/emb_params/SDXL dual-tower),
tokenizer trigger expansion, embedding-table append + LoRA-base consistency,
unload restore, pipeline effect, serving model-block."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from helpers import make_tiny_model, tiny_tokenizer


def _hidden(model, comp="text_encoder"):
    cfg = (model.text_encoder_config if comp == "text_encoder"
           else model.text_encoder_2_config)
    return cfg.hidden_size


def _table(model, comp="text_encoder"):
    p = (model.text_encoder_params if comp == "text_encoder"
         else model.text_encoder_2_params)
    return p["text_model"]["embeddings"]["token_embedding"]["weight"]


def test_tokenizer_added_tokens_expand_and_clear():
    tok = tiny_tokenizer()
    base = tok.tokenize("a cat")
    tok.add_tokens({"<thing>": [501, 502]})
    got = tok.tokenize("a <thing> cat")
    assert got == base[:1] + [501, 502] + base[1:]
    # longest-match wins
    tok.add_tokens({"<thing>x": [900]})
    assert tok.tokenize("<thing>x") == [900]
    tok.clear_added_tokens()
    assert tok.tokenize("a cat") == base


def test_load_diffusers_format_single_vector():
    model = make_tiny_model("sd15")
    H = _hidden(model)
    rows0 = _table(model).shape[0]
    vec = np.random.default_rng(0).standard_normal((1, H)).astype(np.float32)
    trig = model.load_textual_inversion({"<concept>": vec})
    assert trig == "<concept>"
    assert _table(model).shape[0] == rows0 + 1
    np.testing.assert_allclose(np.asarray(_table(model)[rows0]), vec[0],
                               rtol=1e-6)
    assert model.tokenizer.tokenize("<concept>") == [rows0]
    model.unload_textual_inversion()
    assert _table(model).shape[0] == rows0
    assert model.tokenizer.added_tokens == {}


def test_load_a1111_pt_multivector(tmp_path):
    model = make_tiny_model("sd15")
    H = _hidden(model)
    rows0 = _table(model).shape[0]
    vec = torch.randn(3, H, requires_grad=True)  # grad-carrying, as saved
    f = tmp_path / "myconcept.pt"
    torch.save({"string_to_param": {"*": vec}, "name": "myconcept"}, f)
    trig = model.load_textual_inversion(str(f))
    assert trig == "myconcept"
    assert _table(model).shape[0] == rows0 + 3
    assert model.tokenizer.tokenize("a myconcept") == (
        model.tokenizer.tokenize("a") + [rows0, rows0 + 1, rows0 + 2]
    )


def test_load_sdxl_dual_tower():
    model = make_tiny_model("sdxl")
    h1, h2 = _hidden(model), _hidden(model, "text_encoder_2")
    r1 = _table(model).shape[0]
    r2 = _table(model, "text_encoder_2").shape[0]
    rng = np.random.default_rng(1)
    state = {
        "clip_l": rng.standard_normal((2, h1)).astype(np.float32),
        "clip_g": rng.standard_normal((2, h2)).astype(np.float32),
    }
    model.load_textual_inversion(state, token="<xlthing>")
    assert _table(model).shape[0] == r1 + 2
    assert _table(model, "text_encoder_2").shape[0] == r2 + 2
    assert model.tokenizer.tokenize("<xlthing>") == [r1, r1 + 1]
    assert model.tokenizer_2.tokenize("<xlthing>") == [r2, r2 + 1]
    model.unload_textual_inversion()
    assert _table(model).shape[0] == r1
    assert _table(model, "text_encoder_2").shape[0] == r2


def test_sd15_single_tower_file_on_sdxl_raises():
    model = make_tiny_model("sdxl")
    vec = np.zeros((1, _hidden(model)), np.float32)
    with pytest.raises(ValueError, match="clip_g"):
        model.load_textual_inversion({"<c>": vec})


def test_wrong_hidden_dim_raises():
    model = make_tiny_model("sd15")
    with pytest.raises(ValueError, match="hidden"):
        model.load_textual_inversion({"<c>": np.zeros((1, 9999), np.float32)})


def test_pipeline_uses_concept_and_survives_lora_refuse():
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    model = make_tiny_model("sd15")
    H = _hidden(model)
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(height=32, width=32, num_inference_steps=2, seed=11)
    base = pipe(model, prompt="a cat <concept>", **kw)
    vec = np.random.default_rng(2).standard_normal((1, H)).astype(np.float32)
    model.load_textual_inversion({"<concept>": vec})
    with_ti = pipe(model, prompt="a cat <concept>", **kw)
    assert np.abs(with_ti.images - base.images).max() > 1e-7

    # adapter set/delete re-fuses from the pristine base — the TI rows must
    # survive (they were appended to the base too)
    import jax

    from stablediffusion_tpu.lora.core import UNET_TARGET_SUFFIXES, init_lora

    adapter = {"unet": init_lora(jax.random.key(0), model.unet_params, rank=2,
                                 suffixes=UNET_TARGET_SUFFIXES)}
    model.load_lora_weights("t", adapter)
    model.set_adapters({"t": 0.0})
    refused = pipe(model, prompt="a cat <concept>", **kw)
    np.testing.assert_allclose(refused.images, with_ti.images, atol=1e-5)
    model.delete_adapters()
    model.unload_textual_inversion()
    restored = pipe(model, prompt="a cat <concept>", **kw)
    np.testing.assert_array_equal(restored.images, base.images)


def test_serving_model_block(tmp_path):
    from stablediffusion_tpu.serve.handler import Handler

    model = make_tiny_model("sd15")
    H = _hidden(model)
    rows0 = _table(model).shape[0]
    vec = torch.randn(1, H)
    f = tmp_path / "thing.pt"
    torch.save({"string_to_param": {"*": vec}, "name": "thing"}, f)

    h = Handler(model=model)
    req = {"prompt": "a thing", "height": 32, "width": 32,
           "num_inference_steps": 2, "seed": 3,
           "model": {"textual_inversion": [str(f)]}}
    r1 = h(dict(req))
    assert "images" in r1, r1
    assert _table(h.model).shape[0] == rows0 + 1
    # empty list unloads (declarative)
    r2 = h({**req, "model": {"textual_inversion": []}})
    assert "images" in r2, r2
    assert _table(h.model).shape[0] == rows0
    assert r1["images"][0] != r2["images"][0]


def test_trigger_respects_word_boundaries():
    tok = tiny_tokenizer()
    tok.add_tokens({"thing": [700]})
    assert 700 in tok.tokenize("a thing here")
    assert 700 not in tok.tokenize("something else")
    assert 700 in tok.tokenize("(thing)")


def test_tokenizerless_model_raises_before_mutation():
    model = make_tiny_model("sd15")
    rows0 = _table(model).shape[0]
    model.tokenizer = None
    with pytest.raises(ValueError, match="tokenizer"):
        model.load_textual_inversion(
            {"<c>": np.zeros((1, _hidden(model)), np.float32)}
        )
    assert _table(model).shape[0] == rows0  # nothing half-applied
