"""SD3 LoRA training: flow-matching loss learns, both attention streams
targeted, trainer e2e with diffusers-format transformer.* export."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.lora.core import init_lora
from stablediffusion_tpu.schedulers.flow_match import FlowMatchEulerScheduler
from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
from stablediffusion_tpu.train.sd3_train import (
    MMDIT_TARGET_SUFFIXES,
    SD3LoRATrainer,
    SD3TrainStatics,
    SD3TrainingArgs,
    sd3_lora_loss_fn,
)
from stablediffusion_tpu.train.train_step import make_train_step
from tests.test_sd3 import make_tiny_sd3_model, _t5_tokenizer


def _batch(model, rng, B=2, res=16):
    return {
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, res, res, 3)) * 0.3, jnp.float32
        ),
        "input_ids": jnp.asarray(model.tokenizer(["a cat"] * B)),
        "input_ids_2": jnp.asarray(model.tokenizer_2(["a cat"] * B)),
        "input_ids_3": jnp.asarray(_t5_tokenizer(["a cat"] * B, 16)),
    }


class TestSD3LoRAStep:
    def test_targets_both_streams(self):
        model = make_tiny_sd3_model()
        lora = init_lora(
            jax.random.key(0), model.transformer_params, 4,
            MMDIT_TARGET_SUFFIXES, store_alpha=False,
        )
        paths = set(lora.keys())
        assert any("attn.to_q" in p for p in paths)
        assert any("add_q_proj" in p for p in paths)
        assert any("to_add_out" in p for p in paths)
        # the LAST block has no to_add_out (context_pre_only)
        last = f"transformer_blocks.{model.transformer_config.num_layers - 1}"
        assert not any(p.startswith(last) and "to_add_out" in p for p in paths)

    def test_loss_decreases(self):
        model = make_tiny_sd3_model()
        rng = np.random.default_rng(0)
        statics = SD3TrainStatics(
            transformer_config=model.transformer_config,
            vae_config=model.vae_config,
            text_config=model.text_encoder_config,
            text_config_2=model.text_encoder_2_config,
            text_config_3=model.text_encoder_3_config,
            scheduler_config=model.scheduler_config,
            compute_dtype=jnp.float32,
        )
        scheduler = FlowMatchEulerScheduler(model.scheduler_config)
        lora = {
            "transformer": init_lora(
                jax.random.key(1), model.transformer_params, 4,
                MMDIT_TARGET_SUFFIXES, store_alpha=False,
            )
        }
        optimizer = make_optimizer(make_lr_schedule("constant", 5e-3))
        opt_state = optimizer.init(lora)
        step_fn = make_train_step(
            statics, scheduler, optimizer, loss=sd3_lora_loss_fn
        )
        frozen = {
            "transformer": model.transformer_params,
            "vae": model.vae_params,
            "text_encoder": model.text_encoder_params,
            "text_encoder_2": model.text_encoder_2_params,
            "text_encoder_3": model.text_encoder_3_params,
        }
        batch = _batch(model, rng)
        losses = []
        for _ in range(8):
            lora, opt_state, m = step_fn(
                lora, opt_state, frozen, batch, jax.random.key(7)
            )
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        assert float(m["grad_norm"]) > 0.0


class TestSD3Trainer:
    def test_trainer_e2e(self, tmp_path):
        from PIL import Image

        model = make_tiny_sd3_model()
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(4):
            Image.fromarray(
                (rng.random((24, 24, 3)) * 255).astype(np.uint8)
            ).save(img_dir / f"{i}.png")
            (img_dir / f"{i}.txt").write_text(f"cat {i}")
        out = str(tmp_path / "out")
        args = SD3TrainingArgs(
            train_batch_size=2,
            max_train_steps=3,
            resolution=16,
            mixed_precision="no",
            max_sequence_length=16,
            output_dir=out,
            log_every=1,
        )
        trainer = SD3LoRATrainer(model, args, data_dir=str(img_dir))
        trainer.train()
        assert trainer.history
        path = os.path.join(out, "pytorch_lora_weights.safetensors")
        assert os.path.exists(path)
        from stablediffusion_tpu.io.safetensors_io import load_safetensors

        flat = load_safetensors(path)
        assert all(k.startswith("transformer.") for k in flat)
        assert any(k.endswith("lora_A.weight") for k in flat)


class TestSD3SplitEncode:
    def _setup(self):
        model = make_tiny_sd3_model()
        rng = np.random.default_rng(3)
        statics = SD3TrainStatics(
            transformer_config=model.transformer_config,
            vae_config=model.vae_config,
            text_config=model.text_encoder_config,
            text_config_2=model.text_encoder_2_config,
            text_config_3=model.text_encoder_3_config,
            scheduler_config=model.scheduler_config,
            compute_dtype=jnp.float32,
        )
        scheduler = FlowMatchEulerScheduler(model.scheduler_config)
        lora = {
            "transformer": init_lora(
                jax.random.key(1), model.transformer_params, 4,
                MMDIT_TARGET_SUFFIXES, store_alpha=False,
            )
        }
        frozen = {
            "transformer": model.transformer_params,
            "vae": model.vae_params,
            "text_encoder": model.text_encoder_params,
            "text_encoder_2": model.text_encoder_2_params,
            "text_encoder_3": model.text_encoder_3_params,
        }
        return model, statics, frozen, lora, _batch(model, rng), scheduler

    def test_split_encode_exact_equivalence(self):
        """make_sd3_encode_fn + grad program == fused single-program loss
        when encode is fed the fused path's k_sample.  Tolerance is 2 ULP,
        not bitwise: the jitted encode program fuses the triple-encoder
        (CLIP+CLIP+T5) differently than the eager reference, reassociating
        one fp32 reduction (measured diff 1.19e-07 on CPU)."""
        from stablediffusion_tpu.train.sd3_train import make_sd3_encode_fn

        model, statics, frozen, lora, batch, sched = self._setup()
        key = jax.random.key(7)
        fused = sd3_lora_loss_fn(lora, frozen, batch, key, statics, sched)

        k_sample = jax.random.split(key, 3)[0]
        enc = make_sd3_encode_fn(statics)(frozen, batch, k_sample)
        assert "latents" in enc and "prompt_embeds" in enc
        assert "pooled_embeds" in enc
        assert "pixel_values" not in enc and "input_ids_3" not in enc
        split = sd3_lora_loss_fn(lora, frozen, enc, key, statics, sched)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(split), rtol=3e-7
        )

    def test_remat_policies_match(self):
        """Every remat_policy compiles for the MM-DiT backward and matches
        the no-remat loss/grads (memory schedule only, never numerics)."""
        import dataclasses as dc

        import pytest

        model, statics, frozen, lora, batch, sched = self._setup()
        key = jax.random.key(5)
        base_loss, base_grads = jax.value_and_grad(sd3_lora_loss_fn)(
            lora, frozen, batch, key, statics, sched
        )
        for policy in ["full", "dots", "offload"]:
            st = dc.replace(statics, remat_policy=policy)
            loss, grads = jax.value_and_grad(sd3_lora_loss_fn)(
                lora, frozen, batch, key, st, sched
            )
            np.testing.assert_allclose(
                np.asarray(loss), np.asarray(base_loss), rtol=1e-6
            )
            a = jax.tree_util.tree_leaves(base_grads)[0]
            b = jax.tree_util.tree_leaves(grads)[0]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )

    def test_trainer_cache_latents(self, tmp_path):
        """cache_latents end-to-end through SD3LoRATrainer."""
        from PIL import Image

        model = make_tiny_sd3_model()
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(4):
            Image.fromarray(
                (rng.random((24, 24, 3)) * 255).astype(np.uint8)
            ).save(img_dir / f"{i}.png")
            (img_dir / f"{i}.txt").write_text(f"cat {i}")
        args = SD3TrainingArgs(
            train_batch_size=2,
            max_train_steps=2,
            resolution=16,
            mixed_precision="no",
            max_sequence_length=16,
            cache_latents=True,
            remat_policy="full",
            output_dir=str(tmp_path / "out"),
            log_every=1,
        )
        trainer = SD3LoRATrainer(model, args, data_dir=str(img_dir))
        lora = trainer.train()
        assert trainer.history
        assert all(np.isfinite(l) for _, l in trainer.history)
        up_norm = sum(
            float(jnp.abs(f["up"]).sum()) for f in lora["transformer"].values()
        )
        assert up_norm > 0.0
