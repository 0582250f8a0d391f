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
