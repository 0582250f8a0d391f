"""ControlNet training: from_unet init no-op property, train step learns,
dataset conditioning pairing, save/load roundtrip, CLI e2e, mesh step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_tpu.models import controlnet as controlnet_model
from stablediffusion_tpu.models import unet as unet_model
from stablediffusion_tpu.train.dataset import SDLoRADataset
from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
from stablediffusion_tpu.train.train_step import (
    TrainStatics,
    controlnet_loss_fn,
    make_train_step,
)
from tests.helpers import make_tiny_model


def _statics(model, **kw):
    defaults = dict(
        unet_config=model.unet_config,
        vae_config=model.vae_config,
        text_config=model.text_encoder_config,
        text_config_2=model.text_encoder_2_config if model.is_sdxl else None,
        scheduler_config=model.scheduler_config,
        train_text_encoder=False,
        snr_gamma=None,
        compute_dtype=jnp.float32,
        controlnet_config=model.unet_config,
    )
    defaults.update(kw)
    return TrainStatics(**defaults)


def _batch(rng, B=2, res=32, sdxl=False):
    b = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, res, res, 3)) * 0.3, jnp.float32
        ),
        "conditioning_pixel_values": jnp.asarray(
            rng.random((B, res, res, 3)), jnp.float32
        ),
        "input_ids": jnp.asarray(rng.integers(0, 900, (B, 77)), jnp.int32),
    }
    if sdxl:
        b["input_ids_2"] = b["input_ids"]
        b["original_sizes"] = jnp.full((B, 2), float(res))
        b["crop_top_lefts"] = jnp.zeros((B, 2))
        b["target_sizes"] = jnp.full((B, 2), float(res))
    return b


class TestFromUnet:
    def test_noop_property(self):
        """A fresh from_unet ControlNet must leave the UNet output EXACTLY
        unchanged (zero convs -> zero residuals)."""
        model = make_tiny_model()
        cfg = model.unet_config
        cn = controlnet_model.init_from_unet(
            jax.random.key(1), model.unet_params, cfg
        )
        x = jax.random.normal(jax.random.key(2), (1, 8, 8, 4))
        t = jnp.asarray(7)
        ctx = jax.random.normal(jax.random.key(3), (1, 77, cfg.cross_attention_dim))
        cond = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3))
        down_res, mid_res = controlnet_model.apply(cn, cfg, x, t, ctx, cond)
        for r in down_res + [mid_res]:
            np.testing.assert_array_equal(np.asarray(r), 0.0)
        base = unet_model.apply(model.unet_params, cfg, x, t, ctx)
        with_cn = unet_model.apply(
            model.unet_params, cfg, x, t, ctx,
            down_block_residuals=down_res, mid_block_residual=mid_res,
        )
        np.testing.assert_allclose(np.asarray(with_cn), np.asarray(base), atol=1e-6)

    def test_trunk_copied(self):
        model = make_tiny_model()
        cn = controlnet_model.init_from_unet(
            jax.random.key(1), model.unet_params, model.unet_config
        )
        np.testing.assert_array_equal(
            np.asarray(cn["conv_in"]["weight"]),
            np.asarray(model.unet_params["conv_in"]["weight"]),
        )
        np.testing.assert_array_equal(
            np.asarray(cn["mid_block"]["resnets"]["0"]["conv1"]["weight"]),
            np.asarray(model.unet_params["mid_block"]["resnets"]["0"]["conv1"]["weight"]),
        )


@pytest.mark.parametrize("model_type", ["sd15", "sdxl"])
class TestTrainStep:
    def test_loss_decreases_and_unet_frozen(self, model_type):
        model = make_tiny_model(model_type)
        rng = np.random.default_rng(0)
        cn = controlnet_model.init_from_unet(
            jax.random.key(1), model.unet_params, model.unet_config
        )
        statics = _statics(model)
        from stablediffusion_tpu.schedulers import DDPMScheduler

        scheduler = DDPMScheduler(model.scheduler_config)
        optimizer = make_optimizer(make_lr_schedule("constant", 1e-3))
        opt_state = optimizer.init(cn)
        step_fn = make_train_step(
            statics, scheduler, optimizer, loss=controlnet_loss_fn
        )
        frozen = {
            "unet": model.unet_params,
            "vae": model.vae_params,
            "text_encoder": model.text_encoder_params,
        }
        if model.is_sdxl:
            frozen["text_encoder_2"] = model.text_encoder_2_params
        batch = _batch(rng, sdxl=model.is_sdxl)
        losses = []
        for i in range(8):
            cn, opt_state, m = step_fn(cn, opt_state, frozen, batch,
                                       jax.random.key(5))  # fixed key: same task
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        assert float(m["grad_norm"]) > 0.0
        # the zero convs must have learned something
        w = cn["controlnet_mid_block"]["weight"]
        assert float(jnp.abs(w).max()) > 0.0


class TestDatasetPairing:
    def test_folder_pair_geometry(self, tmp_path):
        from PIL import Image

        img_dir = tmp_path / "imgs"
        cond_dir = tmp_path / "cond"
        img_dir.mkdir()
        cond_dir.mkdir()
        rng = np.random.default_rng(0)
        # image and conditioning are IDENTICAL pixels -> after the paired
        # transform, cond must equal (img+1)/2 exactly (same crop/flip)
        arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / "a.png")
        Image.fromarray(arr).save(cond_dir / "a.png")
        (img_dir / "a.txt").write_text("caption a")
        ds = SDLoRADataset(
            str(img_dir), resolution=32, random_flip=True, flip_p=1.0,
            conditioning_dir=str(cond_dir), seed=0,
        )
        ex = ds[0]
        assert ex.conditioning_pixel_values is not None
        np.testing.assert_allclose(
            ex.conditioning_pixel_values,
            (ex.pixel_values + 1.0) / 2.0,
            atol=1e-6,
        )
        batch = next(ds.batches(1))
        assert batch["conditioning_pixel_values"].shape == (1, 32, 32, 3)

    def test_missing_conditioning_raises(self, tmp_path):
        from PIL import Image

        img_dir = tmp_path / "imgs"
        cond_dir = tmp_path / "cond"
        img_dir.mkdir()
        cond_dir.mkdir()
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_dir / "a.png")
        with pytest.raises(ValueError, match="no conditioning image"):
            SDLoRADataset(
                str(img_dir), resolution=16, conditioning_dir=str(cond_dir)
            )


class TestSaveLoad:
    def test_roundtrip_through_wrapper(self, tmp_path):
        from stablediffusion_tpu.io.loader import save_controlnet

        model = make_tiny_model()
        cn = controlnet_model.init_from_unet(
            jax.random.key(1), model.unet_params, model.unet_config
        )
        out = str(tmp_path / "cn")
        save_controlnet(cn, model.unet_config, out)
        assert os.path.exists(os.path.join(out, "config.json"))
        model.load_controlnet(out)
        assert model.controlnet_config.block_out_channels == (
            model.unet_config.block_out_channels
        )
        ref = jax.tree_util.tree_leaves(cn)
        got = jax.tree_util.tree_leaves(model.controlnet_params)
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestTrainerE2E:
    def _data(self, tmp_path, n=4):
        from PIL import Image

        img_dir = tmp_path / "imgs"
        cond_dir = tmp_path / "cond"
        img_dir.mkdir()
        cond_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(n):
            Image.fromarray(
                (rng.random((40, 40, 3)) * 255).astype(np.uint8)
            ).save(img_dir / f"{i}.png")
            Image.fromarray(
                (rng.random((40, 40, 3)) * 255).astype(np.uint8)
            ).save(cond_dir / f"{i}.png")
            (img_dir / f"{i}.txt").write_text(f"cat {i}")
        return str(img_dir), str(cond_dir)

    def test_trainer_runs_and_saves(self, tmp_path):
        from stablediffusion_tpu.train.controlnet_trainer import (
            ControlNetTrainer,
            ControlNetTrainingArgs,
        )

        model = make_tiny_model()
        img_dir, cond_dir = self._data(tmp_path)
        out = str(tmp_path / "out")
        args = ControlNetTrainingArgs(
            train_batch_size=2,
            max_train_steps=3,
            resolution=32,
            mixed_precision="no",
            learning_rate=1e-4,
            output_dir=out,
            report_to=None,
            log_every=1,
        )
        trainer = ControlNetTrainer(
            model, args, data_dir=img_dir, conditioning_dir=cond_dir
        )
        cn = trainer.train()
        assert os.path.exists(
            os.path.join(out, "diffusion_pytorch_model.safetensors")
        )
        assert trainer.history
        # trained controlnet loads and drives the pipeline
        model.load_controlnet(out)
        from stablediffusion_tpu.pipelines import StableDiffusionUnifiedPipeline

        pipe = StableDiffusionUnifiedPipeline()
        cond = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
        res = pipe(
            model, prompt="a cat", num_inference_steps=2, height=16, width=16,
            seed=1, control_image=cond,
        )
        assert res.images.shape == (1, 16, 16, 3)

    def test_cli_e2e(self, tmp_path):
        """Drive the CLI main() end-to-end on a tiny saved model."""
        import json

        from stablediffusion_tpu.io.loader import save_sd_model
        from stablediffusion_tpu.train import controlnet_cli
        from tests.helpers import tiny_tokenizer

        model = make_tiny_model()
        ckpt_dir = str(tmp_path / "model")
        save_sd_model(model, ckpt_dir)
        tok = tiny_tokenizer()
        tok_dir = os.path.join(ckpt_dir, "tokenizer")
        os.makedirs(tok_dir, exist_ok=True)
        with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
            json.dump(tok.vocab, f)
        with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
            f.write("#version: 0.2\n" + "\n".join(
                f"{a} {b}"
                for (a, b), _ in sorted(
                    tok.bpe_ranks.items(), key=lambda kv: kv[1]
                )
            ))
        img_dir, cond_dir = self._data(tmp_path)
        out = str(tmp_path / "cli-out")
        controlnet_cli.main([
            "--pretrained_model_name_or_path", ckpt_dir,
            "--train_data_dir", img_dir,
            "--conditioning_data_dir", cond_dir,
            "--resolution", "32",
            "--train_batch_size", "2",
            "--max_train_steps", "2",
            "--mixed_precision", "no",
            "--output_dir", out,
            "--report_to", "none",
            "--checkpointing_steps", "100",
        ])
        assert os.path.exists(
            os.path.join(out, "diffusion_pytorch_model.safetensors")
        )
