"""ControlNetTrainer — full ControlNet fine-tuning (diffusers
train_controlnet.py analog; beyond-parity: the reference repo can only
CONVERT ControlNet checkpoints, not train them).

Procedure: init the ControlNet from the frozen UNet (or resume from an
existing diffusers-layout ControlNet), AdamW over the WHOLE ControlNet tree
(fp32 masters, bf16 compute), paired image/conditioning-image batches, one
jitted step (train_step.controlnet_loss_fn), checkpoint rotation/resume,
final save as a diffusers-layout ControlNet folder.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from stablediffusion_tpu.core.rng import as_key
from stablediffusion_tpu.models import controlnet as controlnet_model
from stablediffusion_tpu.models.wrapper import SDModel
from stablediffusion_tpu.schedulers import DDPMScheduler
from stablediffusion_tpu.train import checkpoint as ckpt
from stablediffusion_tpu.train.dataset import SDLoRADataset
from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
from stablediffusion_tpu.train.train_step import (
    TrainStatics,
    controlnet_loss_fn,
    make_train_step,
)

logger = logging.getLogger(__name__)


@dataclass
class ControlNetTrainingArgs:
    """Defaults mirror diffusers train_controlnet.py."""

    train_batch_size: int = 4
    gradient_accumulation_steps: int = 1
    accum_dtype: str = "fp32"  # "bf16": low-memory accumulator
    mixed_precision: str = "bf16"
    learning_rate: float = 5e-6  # train_controlnet.py default
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    adam_weight_decay: float = 1e-2
    num_train_epochs: int = 1
    max_train_steps: Optional[int] = None
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 500
    resolution: int = 512
    max_grad_norm: float = 1.0
    use_8bit_adam: bool = False
    seed: int = 0
    snr_gamma: Optional[float] = None
    noise_offset: float = 0.0
    random_flip: bool = False  # default off: flips can break cond alignment
    center_crop: bool = False
    gradient_checkpointing: bool = False
    vae_microbatch: int = 8
    checkpointing_steps: Optional[int] = None
    checkpoints_total_limit: Optional[int] = None
    resume_from_checkpoint: Optional[str] = None
    output_dir: str = "controlnet-out"
    log_every: int = 10
    report_to: Optional[str] = "tensorboard"
    logging_dir: Optional[str] = None
    # render validation images every N epochs with the in-training ControlNet
    validation_prompt: Optional[str] = None
    validation_image: Optional[str] = None  # path to a conditioning image
    num_validation_images: int = 4
    validation_epochs: int = 1
    validation_steps: Optional[int] = None  # step-based override (diffusers
    #   train_controlnet --validation_steps); epoch-based otherwise
    validation_inference_steps: int = 25


class ControlNetTrainer:
    def __init__(
        self,
        model: SDModel,
        args: ControlNetTrainingArgs,
        data_dir: Optional[str] = None,
        conditioning_dir: Optional[str] = None,
        controlnet_path: Optional[str] = None,  # resume from diffusers layout
        mesh=None,
        dataset=None,
    ):
        if data_dir is None and dataset is None:
            raise ValueError("need a data_dir or a dataset")
        self.model = model
        self.args = args
        self.data_dir = data_dir
        self.conditioning_dir = conditioning_dir
        self.controlnet_path = controlnet_path
        self.mesh = mesh
        self.dataset = dataset
        self.metrics = None
        if args.report_to == "tensorboard" and jax.process_index() == 0:
            from stablediffusion_tpu.utils.observability import Metrics

            logdir = args.logging_dir or f"{args.output_dir}/logs"
            self.metrics = Metrics(tensorboard_dir=logdir)

    def train(self) -> dict:
        args = self.args
        model = self.model
        key = as_key(args.seed)
        k_init, k_loop = jax.random.split(key)
        dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32

        # trainable ControlNet (fp32 masters)
        if self.controlnet_path:
            model.load_controlnet(self.controlnet_path)
            cn_config = model.controlnet_config
            controlnet = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float32), model.controlnet_params
            )
        else:
            cn_config = model.unet_config
            controlnet = controlnet_model.init_from_unet(
                k_init, model.unet_params, cn_config, dtype=jnp.float32
            )

        dataset = self.dataset or SDLoRADataset(
            self.data_dir,
            resolution=args.resolution,
            random_flip=args.random_flip,
            center_crop=args.center_crop,
            seed=args.seed,
            conditioning_dir=self.conditioning_dir,
        )
        steps_per_epoch = max(len(dataset) // args.train_batch_size, 1)
        total_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch

        schedule = make_lr_schedule(
            args.lr_scheduler, args.learning_rate, args.lr_warmup_steps, total_steps
        )
        optimizer = make_optimizer(
            schedule,
            args.adam_beta1,
            args.adam_beta2,
            args.adam_epsilon,
            args.adam_weight_decay,
            args.max_grad_norm,
            args.gradient_accumulation_steps,
            use_8bit=getattr(args, "use_8bit_adam", False),
            accum_dtype=getattr(args, "accum_dtype", None),
        )
        opt_state = optimizer.init(controlnet)

        scheduler = DDPMScheduler(model.scheduler_config)
        statics = TrainStatics(
            unet_config=model.unet_config,
            vae_config=model.vae_config,
            text_config=model.text_encoder_config,
            text_config_2=model.text_encoder_2_config if model.is_sdxl else None,
            scheduler_config=model.scheduler_config,
            train_text_encoder=False,
            snr_gamma=args.snr_gamma,
            noise_offset=args.noise_offset,
            compute_dtype=dtype,
            gradient_checkpointing=args.gradient_checkpointing,
            vae_microbatch=args.vae_microbatch,
            controlnet_config=cn_config,
        )
        step_fn = make_train_step(
            statics, scheduler, optimizer, mesh=self.mesh,
            loss=controlnet_loss_fn,
        )

        frozen = {
            "unet": model.unet_params,
            "vae": model.vae_params,
            "text_encoder": model.text_encoder_params,
        }
        if model.is_sdxl:
            frozen["text_encoder_2"] = model.text_encoder_2_params

        # resume
        start_step = 0
        if args.resume_from_checkpoint:
            found = ckpt.resolve_resume(
                args.resume_from_checkpoint, args.output_dir
            )
            if found:
                start_step, path = found
                state = ckpt.load_checkpoint(
                    path, {"controlnet": controlnet, "opt_state": opt_state}
                )
                controlnet, opt_state = state["controlnet"], state["opt_state"]
                logger.info("resumed from %s at step %d", path, start_step)

        step = start_step
        t0 = time.time()
        history = []
        batch_iter = dataset.batches(
            args.train_batch_size,
            epochs=None,
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
        )
        try:
          for batch in batch_iter:
            if step >= total_steps:
                break
            jb = self._prepare_batch(batch)
            k_loop, k_step = jax.random.split(k_loop)
            controlnet, opt_state, metrics = step_fn(
                controlnet, opt_state, frozen, jb, k_step
            )
            step += 1
            if step % args.log_every == 0 or step == total_steps:
                loss = float(metrics["loss"])
                history.append((step, loss))
                logger.info(
                    "step %d/%d loss %.5f lr %.2e %.2f s/it",
                    step, total_steps, loss, float(schedule(step)),
                    (time.time() - t0) / max(step - start_step, 1),
                )
                if self.metrics is not None:
                    self.metrics.observe("train/loss", loss, step=step)
                    self.metrics.observe(
                        "train/lr", float(schedule(step)), step=step
                    )
            val_every = args.validation_steps or (
                steps_per_epoch * args.validation_epochs
            )
            if (
                args.validation_prompt
                and args.validation_image
                and step % val_every == 0
                and jax.process_index() == 0
            ):
                self._log_validation(controlnet, cn_config, step)
            if (
                args.checkpointing_steps
                and step % args.checkpointing_steps == 0
                and jax.process_index() == 0
            ):
                ckpt.save_checkpoint(
                    args.output_dir,
                    step,
                    {"controlnet": controlnet, "opt_state": opt_state},
                    args.checkpoints_total_limit,
                )

        finally:
            # deterministic pool shutdown: the generator may be
            # abandoned mid-epoch (max_train_steps break)
            batch_iter.close()
        self.history = history
        self.controlnet = controlnet
        self.controlnet_config = cn_config
        if self.metrics is not None:
            self.metrics.flush()
        if jax.process_index() == 0:
            from stablediffusion_tpu.io.loader import save_controlnet

            save_controlnet(controlnet, cn_config, args.output_dir)
        return controlnet

    def _log_validation(self, controlnet, cn_config, step: int) -> None:
        """Render validation images with the CURRENT ControlNet
        (train_controlnet.py log_validation analog)."""
        args = self.args
        model = self.model
        from stablediffusion_tpu.pipelines.unified import (
            StableDiffusionUnifiedPipeline,
        )

        prev_cfg, prev_params = model.controlnet_config, model.controlnet_params
        try:
            model.controlnet_config = cn_config
            model.controlnet_params = jax.tree_util.tree_map(
                lambda x: x, controlnet
            )
            pipe = StableDiffusionUnifiedPipeline()
            from PIL import Image

            cond = Image.open(args.validation_image)
            out = pipe(
                model,
                prompt=args.validation_prompt,
                num_images_per_prompt=args.num_validation_images,
                num_inference_steps=args.validation_inference_steps,
                height=args.resolution,
                width=args.resolution,
                seed=args.seed,
                control_image=cond,
            )
            if self.metrics is not None:
                self.metrics.images("validation", out.images, step=step)
            logger.info("step %d: rendered %d validation images", step,
                        args.num_validation_images)
        finally:
            model.controlnet_config, model.controlnet_params = prev_cfg, prev_params

    def _prepare_batch(self, batch) -> Dict[str, jax.Array]:
        model = self.model
        if "conditioning_pixel_values" not in batch:
            raise ValueError(
                "ControlNet training needs conditioning images (a "
                "conditioning_dir or a dataset conditioning_image column)"
            )
        jb: Dict[str, Any] = {
            "pixel_values": jnp.asarray(batch["pixel_values"]),
            "conditioning_pixel_values": jnp.asarray(
                batch["conditioning_pixel_values"]
            ),
            "input_ids": jnp.asarray(model.tokenizer(batch["captions"])),
        }
        if model.is_sdxl:
            jb["input_ids_2"] = jnp.asarray(model.tokenizer_2(batch["captions"]))
            jb["original_sizes"] = jnp.asarray(batch["original_sizes"])
            jb["crop_top_lefts"] = jnp.asarray(batch["crop_top_lefts"])
            jb["target_sizes"] = jnp.asarray(batch["target_sizes"])
        if self.mesh is not None:
            from stablediffusion_tpu.parallel import shard_batch

            jb = shard_batch(self.mesh, jb)
        return jb
