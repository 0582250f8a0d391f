"""Textual-inversion TRAINING (Gal et al. 2022): only the placeholder rows
move, everything else frozen; saved learned_embeds round-trips through
load_textual_inversion; CLI flag surface."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline
from stablediffusion_tpu.train.trainer import SDLoRATrainer, SDTrainingArgs

from helpers import make_tiny_model


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ti-data")
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = (rng.uniform(size=(40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.jpg")  # no captions: TI
    return str(d)


def _args(tmp_path, **kw):
    base = dict(
        train_batch_size=2,
        max_train_steps=3,
        resolution=32,
        rank=4,
        train_text_encoder=False,
        learning_rate=5e-3,
        lr_warmup_steps=0,
        lr_scheduler="constant",
        textual_inversion="<thing>",
        ti_initializer_token="cat",
        ti_num_vectors=2,
        output_dir=str(tmp_path / "ti-out"),
        report_to=None,
    )
    base.update(kw)
    return SDTrainingArgs(**base)


def test_ti_train_moves_only_placeholder_rows(data_dir, tmp_path):
    model = make_tiny_model("sd15")
    table_before = np.asarray(
        model.text_encoder_params["text_model"]["embeddings"][
            "token_embedding"]["weight"])
    orig_rows = table_before.shape[0]
    unet_before = jax.tree_util.tree_leaves(model.unet_params)[0].copy()

    trainer = SDLoRATrainer(model, _args(tmp_path), data_dir)
    rows = trainer.train()
    learned = np.asarray(rows["embeddings"])
    assert learned.shape == (2, table_before.shape[1])

    table_after = np.asarray(
        model.text_encoder_params["text_model"]["embeddings"][
            "token_embedding"]["weight"])
    # two new rows appended; trained values written back
    assert table_after.shape[0] == orig_rows + 2
    np.testing.assert_array_equal(table_after[:orig_rows], table_before)
    np.testing.assert_allclose(table_after[orig_rows:], learned, atol=1e-6)
    # the rows actually moved away from the initializer
    init_id = int(np.asarray(model.tokenizer(["cat"]))[0][1])
    init_row = table_before[init_id]
    assert np.abs(learned - init_row[None]).max() > 1e-5
    # UNet untouched
    np.testing.assert_array_equal(
        jax.tree_util.tree_leaves(model.unet_params)[0], unet_before)
    # trigger registered: tokenizer maps the placeholder to the new ids
    ids = np.asarray(model.tokenizer(["a photo of <thing>"]))[0]
    assert orig_rows in ids.tolist() and (orig_rows + 1) in ids.tolist()
    # saved artifact exists
    assert os.path.exists(f"{tmp_path}/ti-out/learned_embeds.safetensors")
    # loss finite and recorded
    assert trainer.history and np.isfinite(trainer.history[-1][1])


def test_ti_roundtrip_into_fresh_model(data_dir, tmp_path):
    model = make_tiny_model("sd15")
    trainer = SDLoRATrainer(model, _args(tmp_path), data_dir)
    trainer.train()

    fresh = make_tiny_model("sd15")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    base_img = pipe(fresh, prompt="a photo of <thing>", **kw).images
    tok = fresh.load_textual_inversion(
        f"{tmp_path}/ti-out/learned_embeds.safetensors")
    assert tok == "<thing>"
    ti_img = pipe(fresh, prompt="a photo of <thing>", **kw).images
    assert not np.array_equal(base_img, ti_img)
    # trained model and fresh+loaded model agree exactly at fixed seed
    trained_img = pipe(model, prompt="a photo of <thing>", **kw).images
    np.testing.assert_array_equal(ti_img, trained_img)


def test_ti_validation_args(data_dir, tmp_path):
    model = make_tiny_model("sd15")
    with pytest.raises(ValueError, match="ti_initializer_token"):
        SDLoRATrainer(
            model, _args(tmp_path, ti_initializer_token=None), data_dir
        ).train()
    with pytest.raises(ValueError, match="single token"):
        SDLoRATrainer(
            model,
            _args(tmp_path, ti_initializer_token="cat dog"),
            data_dir,
        ).train()
    with pytest.raises(ValueError, match="train_text_encoder=False"):
        SDLoRATrainer(
            model, _args(tmp_path, train_text_encoder=True), data_dir
        ).train()


def test_ti_cli_flags(data_dir, tmp_path, monkeypatch):
    """CLI wires --train_textual_inversion through to the trainer."""
    from stablediffusion_tpu.io.loader import save_sd_model
    from stablediffusion_tpu.train import cli

    model_dir = str(tmp_path / "model")
    save_sd_model(make_tiny_model("sd15"), model_dir)
    out = str(tmp_path / "cli-out")
    argv = [
        "--pretrained_model_name_or_path", model_dir,
        "--train_data_dir", data_dir,
        "--resolution", "32",
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--train_textual_inversion", "<cli-thing>",
        "--ti_initializer_token", "cat",
        "--ti_num_vectors", "1",
        "--output_dir", out,
        "--checkpointing_steps", "0",
        "--report_to", "none",
    ]
    cli.main(argv)
    assert os.path.exists(f"{out}/learned_embeds.safetensors")


def test_ti_train_sdxl_dual_tower(data_dir, tmp_path):
    """SDXL TI trains rows in BOTH towers and saves the {clip_l, clip_g}
    dual-tower format load_textual_inversion round-trips."""
    model = make_tiny_model("sdxl")
    out = str(tmp_path / "xl-out")
    args = _args(tmp_path, output_dir=out)
    trainer = SDLoRATrainer(model, args, data_dir)
    rows = trainer.train()
    assert set(rows) == {"embeddings", "embeddings_2"}
    h1 = model.text_encoder_config.hidden_size
    h2 = model.text_encoder_2_config.hidden_size
    assert np.asarray(rows["embeddings"]).shape == (2, h1)
    assert np.asarray(rows["embeddings_2"]).shape == (2, h2)

    fresh = make_tiny_model("sdxl")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    base_img = pipe(fresh, prompt="a photo of <thing>", **kw).images
    tok = fresh.load_textual_inversion(f"{out}/learned_embeds.safetensors",
                                       token="<thing>")
    assert tok == "<thing>"
    ti_img = pipe(fresh, prompt="a photo of <thing>", **kw).images
    assert not np.array_equal(base_img, ti_img)
    trained_img = pipe(model, prompt="a photo of <thing>", **kw).images
    np.testing.assert_array_equal(ti_img, trained_img)
