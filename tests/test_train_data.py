"""HF `datasets` training path + in-training validation/tracker logging
(ref: diffusers_scripts/train_text_to_image_lora.py:594-709 dataset pipeline,
:105-144,928-941 log_validation)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from helpers import make_tiny_model

from test_loader import _write_tokenizer_files  # noqa: F401 (fixture dep)
from test_loader import checkpoint_dir  # noqa: F401


def _make_imagefolder(root, n=4, caption_key="text"):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        name = f"img_{i}.png"
        Image.fromarray(
            (rng.uniform(size=(48, 40, 3)) * 255).astype(np.uint8)
        ).save(os.path.join(root, name))
        rows.append({"file_name": name, caption_key: f"a cat number {i}"})
    with open(os.path.join(root, "metadata.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return root


def test_hf_imagefolder_dataset(tmp_path):
    from stablediffusion_tpu.train.dataset import HFImageCaptionDataset

    root = _make_imagefolder(str(tmp_path / "data"))
    ds = HFImageCaptionDataset(
        data_dir=root, resolution=32, random_flip=False, seed=0
    )
    assert len(ds) == 4
    assert ds.image_column == "image" and ds.caption_column == "text"
    ex = ds[1]
    assert ex.pixel_values.shape == (32, 32, 3)
    assert ex.pixel_values.min() >= -1.0 and ex.pixel_values.max() <= 1.0
    assert ex.caption.startswith("a cat number")
    assert ex.original_size == (48, 40)  # (H, W) native
    assert ex.target_size == (32, 32)

    batch = next(ds.batches(2, shuffle=False))
    assert batch["pixel_values"].shape == (2, 32, 32, 3)
    assert len(batch["captions"]) == 2
    assert batch["original_sizes"].shape == (2, 2)


def test_hf_dataset_column_overrides_and_errors(tmp_path):
    from stablediffusion_tpu.train.dataset import HFImageCaptionDataset

    root = _make_imagefolder(str(tmp_path / "data2"), caption_key="prompt")
    ds = HFImageCaptionDataset(data_dir=root, resolution=32)
    assert ds.caption_column == "prompt"  # resolved from candidates

    with pytest.raises(ValueError, match="caption_column"):
        HFImageCaptionDataset(data_dir=root, caption_column="nope")
    with pytest.raises(ValueError, match="image_column"):
        HFImageCaptionDataset(data_dir=root, image_column="nope")


def test_cli_trains_from_hf_dataset_with_validation(checkpoint_dir, tmp_path):  # noqa: F811
    """--dataset_name (a local imagefolder through datasets.load_dataset),
    per-epoch validation rendering, debug_loss, tensorboard event files."""
    from stablediffusion_tpu.train.cli import main

    data = _make_imagefolder(str(tmp_path / "hfdata"))
    out = str(tmp_path / "hf-out")
    main([
        "--pretrained_model_name_or_path", checkpoint_dir,
        "--dataset_name", "imagefolder",
        "--train_data_dir", data,
        "--output_dir", out,
        "--resolution", "32",
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--rank", "2",
        "--mixed_precision", "no",
        "--lr_scheduler", "constant",
        "--lr_warmup_steps", "0",
        "--validation_prompt", "a cat",
        "--num_validation_images", "1",
        "--validation_epochs", "1",
        "--debug_loss",
    ])
    assert os.path.exists(os.path.join(out, "pytorch_lora_weights.safetensors"))
    # post-training validation images
    assert os.path.exists(os.path.join(out, "validation", "0.png"))
    # tensorboard event files from the in-training tracker
    logdir = os.path.join(out, "logs")
    events = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(logdir)
        for f in fs
        if "tfevents" in f
    ]
    assert events, f"no tensorboard event files under {logdir}"
    assert sum(os.path.getsize(e) for e in events) > 500, (
        "tracker wrote no scalar/image summaries"
    )


def test_trainer_in_training_validation_hook(tmp_path):
    """SDLoRATrainer._log_validation renders with the current LoRA and leaves
    the model's weights untouched afterwards."""
    import jax

    from stablediffusion_tpu.train.trainer import SDLoRATrainer, SDTrainingArgs

    model = make_tiny_model("sd15")
    before = jax.tree_util.tree_leaves(model.unet_params)[0]
    args = SDTrainingArgs(
        validation_prompt="a cat",
        num_validation_images=1,
        validation_inference_steps=2,
        report_to=None,
        output_dir=str(tmp_path / "v-out"),
        rank=2,
    )
    trainer = SDLoRATrainer(model, args, data_dir=str(tmp_path), dataset=object())
    from stablediffusion_tpu.lora.core import UNET_TARGET_SUFFIXES, init_lora

    lora = {
        "unet": init_lora(
            jax.random.key(0), model.unet_params, 2, UNET_TARGET_SUFFIXES,
            store_alpha=False,
        )
    }
    trainer._log_validation(lora, epoch=1, step=2)
    after = jax.tree_util.tree_leaves(model.unet_params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert model.get_list_adapters() == {}
