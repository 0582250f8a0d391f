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


def _tiny_step_setup(model_type="sdxl", **statics_kw):
    from stablediffusion_tpu.lora.core import UNET_TARGET_SUFFIXES, init_lora
    from stablediffusion_tpu.schedulers import DDPMScheduler
    from stablediffusion_tpu.train.train_step import TrainStatics

    model = make_tiny_model(model_type)
    statics = TrainStatics(
        unet_config=model.unet_config,
        vae_config=model.vae_config,
        text_config=model.text_encoder_config,
        text_config_2=model.text_encoder_2_config if model.is_sdxl else None,
        scheduler_config=model.scheduler_config,
        train_text_encoder=False,
        snr_gamma=None,
        compute_dtype=jnp.float32,
        **statics_kw,
    )
    frozen = {
        "unet": model.unet_params,
        "vae": model.vae_params,
        "text_encoder": model.text_encoder_params,
    }
    if model.is_sdxl:
        frozen["text_encoder_2"] = model.text_encoder_2_params
    lora = {
        "unet": init_lora(
            jax.random.key(0), model.unet_params, 2, UNET_TARGET_SUFFIXES,
            store_alpha=False,
        )
    }
    rng = np.random.default_rng(0)
    B = 2
    batch = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, 32, 32, 3)) * 0.5, jnp.float32
        ),
        "input_ids": jnp.asarray(rng.integers(0, 99, (B, 77)), jnp.int32),
    }
    if model.is_sdxl:
        batch.update(
            input_ids_2=jnp.asarray(rng.integers(0, 99, (B, 77)), jnp.int32),
            original_sizes=jnp.asarray([[32, 32]] * B, jnp.float32),
            crop_top_lefts=jnp.asarray([[0, 0]] * B, jnp.float32),
            target_sizes=jnp.asarray([[32, 32]] * B, jnp.float32),
        )
    return model, statics, frozen, lora, batch, DDPMScheduler(
        model.scheduler_config
    )


@pytest.mark.parametrize("model_type", ["sd15", "sdxl"])
def test_split_encode_exact_equivalence(model_type):
    """make_encode_fn + grad program == the fused single-program step,
    bit-for-bit: feeding encode the fused path's k_sample reproduces the
    identical latents, and the grad program re-derives the same noise /
    timestep keys from the step key."""
    from stablediffusion_tpu.train.train_step import loss_fn, make_encode_fn

    model, statics, frozen, lora, batch, sched = _tiny_step_setup(model_type)
    key = jax.random.key(7)
    fused = loss_fn(lora, frozen, batch, key, statics, sched)

    k_sample = jax.random.split(key, 4)[0]
    enc = make_encode_fn(statics)(frozen, batch, k_sample)
    assert "latents" in enc and "prompt_embeds" in enc
    assert "pixel_values" not in enc and "input_ids" not in enc
    if model.is_sdxl:
        assert "pooled_embeds" in enc and "original_sizes" in enc
    split = loss_fn(lora, frozen, enc, key, statics, sched)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(split), rtol=0, atol=0
    )


@pytest.mark.parametrize("policy", ["full", "dots", "offload"])
def test_remat_policies(policy):
    """Every remat_policy compiles and matches the no-remat loss (remat
    must never change numerics, only the backward's memory schedule)."""
    from stablediffusion_tpu.train.train_step import loss_fn
    import dataclasses as dc

    model, statics, frozen, lora, batch, sched = _tiny_step_setup("sd15")
    key = jax.random.key(3)
    base_loss, base_grads = jax.value_and_grad(loss_fn)(
        lora, frozen, batch, key, statics, sched
    )
    st = dc.replace(statics, remat_policy=policy)
    loss, grads = jax.value_and_grad(loss_fn)(
        lora, frozen, batch, key, st, sched
    )
    np.testing.assert_allclose(np.asarray(loss), np.asarray(base_loss),
                               rtol=1e-6)
    a = jax.tree_util.tree_leaves(base_grads)[0]
    b = jax.tree_util.tree_leaves(grads)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-7)


def test_trainer_cache_latents(data_dir, tmp_path):
    """--cache_latents end-to-end: separate encode program per step, LoRA
    still trains; incompatible with train_text_encoder."""
    model = make_tiny_model("sdxl")
    common = dict(
        train_batch_size=2, rank=2, resolution=32, max_train_steps=2,
        learning_rate=1e-3, lr_scheduler="constant", lr_warmup_steps=0,
        mixed_precision="no", cache_latents=True,
        output_dir=str(tmp_path / "cl"), seed=11,
    )
    args = SDTrainingArgs(train_text_encoder=False, **common)
    t = SDLoRATrainer(model, args, data_dir)
    lora = t.train()
    assert all(np.isfinite(l) for _, l in t.history)
    up_norm = sum(float(jnp.abs(f["up"]).sum()) for f in lora["unet"].values())
    assert up_norm > 0.0

    bad = SDTrainingArgs(train_text_encoder=True, **common)
    with pytest.raises(ValueError, match="cache_latents"):
        SDLoRATrainer(model, bad, data_dir).train()


def test_offload_remat_mesh_guard():
    """offload remat is single-program only: the SPMD partitioner rejects
    its host-placement annotations (measured on this jaxlib), so the step
    factory must refuse a mesh instead of failing deep inside XLA."""
    import dataclasses as dc

    from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
    from stablediffusion_tpu.train.train_step import make_train_step

    _, statics, _, lora, _, sched = _tiny_step_setup("sd15")
    st = dc.replace(statics, remat_policy="offload")
    opt = make_optimizer(make_lr_schedule("constant", 1e-3))
    with pytest.raises(ValueError, match="offload"):
        make_train_step(st, sched, opt, mesh=make_mesh())
