"""LoRA training: dataset, jitted train step on the 8-device CPU mesh,
checkpoint/resume, saved-adapter interchange with inference."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from stablediffusion_tpu.parallel import make_mesh
from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline
from stablediffusion_tpu.train.dataset import SDLoRADataset
from stablediffusion_tpu.train.train_step import compute_snr, min_snr_weight
from stablediffusion_tpu.train.trainer import SDLoRATrainer, SDTrainingArgs

from helpers import make_tiny_model


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for i in range(10):
        arr = (rng.uniform(size=(48, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.jpg")
        (d / f"img{i}.txt").write_text(f"a cat number {i}")
    return str(d)


def test_dataset(data_dir):
    ds = SDLoRADataset(data_dir, resolution=32, seed=1)
    assert len(ds) == 10
    ex = ds[0]
    assert ex.pixel_values.shape == (32, 32, 3)
    assert -1.0 <= ex.pixel_values.min() and ex.pixel_values.max() <= 1.0
    assert ex.original_size == (48, 40)
    assert ex.caption == "a cat number 0"
    batch = next(ds.batches(4))
    assert batch["pixel_values"].shape == (4, 32, 32, 3)
    assert len(batch["captions"]) == 4
    assert batch["original_sizes"].shape == (4, 2)


def test_dataset_sharding(data_dir):
    ds = SDLoRADataset(data_dir, resolution=32, seed=1)
    b0 = next(ds.batches(2, shuffle=False, shard_index=0, num_shards=2))
    ds2 = SDLoRADataset(data_dir, resolution=32, seed=1)
    b1 = next(ds2.batches(2, shuffle=False, shard_index=1, num_shards=2))
    assert b0["captions"] != b1["captions"]


def test_min_snr_weight():
    snr = jnp.asarray([0.1, 5.0, 100.0])
    w = min_snr_weight(snr, gamma=5.0, prediction_type="epsilon")
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0, 0.05], rtol=1e-5)
    wv = min_snr_weight(snr, gamma=5.0, prediction_type="v_prediction")
    np.testing.assert_allclose(
        np.asarray(wv), [0.1 / 1.1, 5.0 / 6.0, 5.0 / 101.0], rtol=1e-5
    )


@pytest.mark.parametrize("model_type", ["sd15", "sdxl"])
def test_train_loop_mesh(data_dir, tmp_path, model_type):
    model = make_tiny_model(model_type)
    mesh = make_mesh()  # 8 virtual CPU devices on the data axis
    args = SDTrainingArgs(
        train_batch_size=8,
        rank=2,
        resolution=32,
        max_train_steps=4,
        learning_rate=1e-3,
        lr_scheduler="constant",
        lr_warmup_steps=0,
        mixed_precision="no",
        train_text_encoder=True,
        snr_gamma=5.0,
        output_dir=str(tmp_path / f"out-{model_type}"),
        log_every=1,
        seed=3,
    )
    trainer = SDLoRATrainer(model, args, data_dir, mesh=mesh)
    lora = trainer.train()

    # factors actually moved (up starts at zero)
    up_norm = sum(
        float(jnp.abs(f["up"]).sum()) for f in lora["unet"].values()
    )
    assert up_norm > 0.0
    assert all(np.isfinite(l) for _, l in trainer.history)

    # saved adapter loads back through the inference path and changes output
    f = os.path.join(args.output_dir, "pytorch_lora_weights.safetensors")
    assert os.path.exists(f)
    pipe = StableDiffusionUnifiedPipeline()
    kw = dict(prompt="cat", height=32, width=32, num_inference_steps=2, seed=1)
    base = pipe(model, **kw)
    from stablediffusion_tpu.lora.formats import load_lora_file

    model.load_lora_weights("trained", load_lora_file(f))
    model.set_adapters({"trained": 1.0})
    tuned = pipe(model, **kw)
    model.delete_adapters()
    assert np.abs(base.images - tuned.images).max() > 1e-7


def test_checkpoint_resume(data_dir, tmp_path):
    model = make_tiny_model("sd15")
    out = str(tmp_path / "ckpt")
    common = dict(
        train_batch_size=2,
        rank=2,
        resolution=32,
        learning_rate=1e-3,
        lr_scheduler="constant",
        lr_warmup_steps=0,
        mixed_precision="no",
        train_text_encoder=False,
        output_dir=out,
        checkpointing_steps=2,
        checkpoints_total_limit=2,
        seed=5,
    )
    a1 = SDTrainingArgs(max_train_steps=2, **common)
    SDLoRATrainer(model, a1, data_dir).train()
    from stablediffusion_tpu.train.checkpoint import latest_checkpoint

    found = latest_checkpoint(out)
    assert found is not None and found[0] == 2

    a2 = SDTrainingArgs(
        max_train_steps=4, resume_from_checkpoint="latest", **common
    )
    t2 = SDLoRATrainer(model, a2, data_dir)
    t2.train()
    # resumed from step 2, trained to 4
    assert t2.history[-1][0] == 4


def test_gradient_checkpointing(data_dir, tmp_path):
    model = make_tiny_model("sd15")
    args = SDTrainingArgs(
        train_batch_size=2, rank=2, resolution=32, max_train_steps=2,
        learning_rate=1e-3, lr_scheduler="constant", lr_warmup_steps=0,
        mixed_precision="no", train_text_encoder=False,
        gradient_checkpointing=True,
        output_dir=str(tmp_path / "remat"), seed=8,
    )
    t = SDLoRATrainer(model, args, data_dir)
    lora = t.train()
    assert all(np.isfinite(l) for _, l in t.history)
    up_norm = sum(float(jnp.abs(f["up"]).sum()) for f in lora["unet"].values())
    assert up_norm > 0.0


def test_dataset_threaded_loading_deterministic(data_dir):
    """batches() decodes on a thread pool; the augmentation stream must be
    identical regardless of num_workers (per-item spawned RNGs)."""
    ds1 = SDLoRADataset(data_dir, resolution=32, seed=7)
    ds2 = SDLoRADataset(data_dir, resolution=32, seed=7)
    it1 = ds1.batches(4, epochs=1, num_workers=1)
    it8 = ds2.batches(4, epochs=1, num_workers=8, prefetch=2)
    for b1, b8 in zip(it1, it8):
        np.testing.assert_array_equal(b1["pixel_values"], b8["pixel_values"])
        assert b1["captions"] == b8["captions"]
