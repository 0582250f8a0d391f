"""Diffusers-layout save/load roundtrip + training CLI end-to-end (offline)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from stablediffusion_tpu.io.loader import load_sd_model, resolve_checkpoint, save_sd_model
from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline

from helpers import make_tiny_model, tiny_tokenizer


def _write_tokenizer_files(d, pad_token="<|endoftext|>"):
    os.makedirs(d, exist_ok=True)
    tok = tiny_tokenizer()
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(tok.vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(
            f"{a} {b}" for (a, b), _ in sorted(tok.bpe_ranks.items(), key=lambda kv: kv[1])
        ))
    with open(os.path.join(d, "special_tokens_map.json"), "w") as f:
        json.dump({"pad_token": pad_token}, f)


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt") / "tiny-sd15")
    model = make_tiny_model("sd15")
    save_sd_model(model, d)
    _write_tokenizer_files(os.path.join(d, "tokenizer"))
    return d


def test_roundtrip_identical_outputs(checkpoint_dir):
    src = make_tiny_model("sd15")
    loaded = load_sd_model(checkpoint_dir, variant=None)
    assert loaded.model_type == "sd15"
    assert not loaded.is_sdxl
    assert loaded.unet_config == src.unet_config
    assert loaded.vae_config == src.vae_config

    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(prompt="a cat", height=32, width=32, num_inference_steps=2, seed=4)
    a = pipe(src, **kw)
    b = pipe(loaded, **kw)
    np.testing.assert_allclose(a.images, b.images, atol=1e-5)


def test_sdxl_roundtrip(tmp_path):
    d = str(tmp_path / "tiny-sdxl")
    model = make_tiny_model("sdxl")
    save_sd_model(model, d)
    _write_tokenizer_files(os.path.join(d, "tokenizer"))
    _write_tokenizer_files(os.path.join(d, "tokenizer_2"), pad_token="!")
    loaded = load_sd_model(d, variant=None)
    assert loaded.is_sdxl
    assert loaded.tokenizer_2.pad_token_id == 0  # "!" pad convention
    pipe = StableDiffusionUnifiedPipeline()
    out = pipe(loaded, prompt="x", height=32, width=32, num_inference_steps=2, seed=1)
    assert np.isfinite(out.images).all()


def test_resolve_checkpoint_local(tmp_path, checkpoint_dir, monkeypatch):
    import shutil

    cache = tmp_path / "registry"
    cache.mkdir()
    shutil.copytree(checkpoint_dir, cache / "sd15_MyModel")
    path = resolve_checkpoint("sd15", "MyModel", cache_dir=str(cache))
    assert path.endswith("sd15_MyModel")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("sd15", "Missing", cache_dir=str(cache))


def test_train_cli_end_to_end(checkpoint_dir, tmp_path):
    from stablediffusion_tpu.train.cli import main

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            (rng.uniform(size=(40, 40, 3)) * 255).astype(np.uint8)
        ).save(data / f"{i}.jpg")
        (data / f"{i}.txt").write_text("a cat")

    out = str(tmp_path / "cli-out")
    main([
        "--pretrained_model_name_or_path", checkpoint_dir,
        "--train_data_dir", str(data),
        "--output_dir", out,
        "--resolution", "32",
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--rank", "2",
        "--mixed_precision", "no",
        "--lr_scheduler", "constant",
        "--lr_warmup_steps", "0",
        "--checkpointing_steps", "100",
        "--use_8bit_adam",  # accepted no-op
        "--enable_xformers_memory_efficient_attention",  # accepted no-op
    ])
    assert os.path.exists(os.path.join(out, "pytorch_lora_weights.safetensors"))


def test_model_reload_drops_adapters(checkpoint_dir):
    import jax

    from stablediffusion_tpu.lora.core import linear_module_paths, UNET_TARGET_SUFFIXES
    from stablediffusion_tpu.lora.formats import save_lora_file

    model = load_sd_model(checkpoint_dir, variant=None)
    # register + fuse a random adapter, then reload -> pristine
    paths = linear_module_paths(model.unet_params, UNET_TARGET_SUFFIXES)
    node = model.unet_params
    for part in paths[0].split("."):
        node = node[part]
    before = np.asarray(node["weight"]).copy()
    adapter = {"unet": {paths[0]: {
        "down": jax.random.normal(jax.random.key(0), (node["weight"].shape[0], 2)),
        "up": jax.random.normal(jax.random.key(1), (2, node["weight"].shape[1])),
    }}}
    model.load_lora_weights("x", adapter)
    model.set_adapters({"x": 1.0})
    model.reload()
    assert model.adapters == {}
    node2 = model.unet_params
    for part in paths[0].split("."):
        node2 = node2[part]
    np.testing.assert_array_equal(np.asarray(node2["weight"]), before)


def test_convert_transposes_time_embedding_linears():
    """time_embedding / add_embedding linears are nn.Linear kernels stored
    (out, in) by torch — they MUST transpose; only true embedding *tables*
    (token/position) keep their layout (ADVICE r1, high)."""
    from stablediffusion_tpu.io.torch_convert import convert_tensor, deconvert_tensor

    w = np.arange(1280 * 320, dtype=np.float32).reshape(1280, 320)  # (out, in)
    for key in (
        "time_embedding.linear_1.weight",
        "time_embedding.linear_2.weight",
        "add_embedding.linear_1.weight",
        "class_embedding.linear_1.weight",
    ):
        got = convert_tensor(key, w)
        assert got.shape == (320, 1280), key
        np.testing.assert_array_equal(got, w.T, err_msg=key)
        # deconvert restores torch layout (ecosystem interchange)
        np.testing.assert_array_equal(deconvert_tensor(key, got), w)
    # true tables stay row-per-id
    for key in (
        "text_model.embeddings.token_embedding.weight",
        "text_model.embeddings.position_embedding.weight",
    ):
        got = convert_tensor(key, w)
        assert got.shape == (1280, 320), key
        np.testing.assert_array_equal(got, w)
