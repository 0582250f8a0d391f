"""SDLoRATrainer — in-process LoRA fine-tuning (T1/T3/T4 analog).

Mirrors the reference's 10-step procedure (train_lora_pipeline.py:127-533):
args -> seed -> freeze -> dtype policy -> LoRA injection (UNet to_q/k/v/out,
text encoders q/k/v/out_proj) -> AdamW -> dataloader with micro-conditioning
collation -> LR schedule -> prepare -> jitted loop -> LoRA safetensors save.

TPU-native differences: the "prepare/DDP" stage is a Mesh + NamedSharding and
the whole step is one jitted function (SURVEY.md §3.3); mixed precision is
bf16 with fp32 LoRA factors and an always-fp32 VAE; no GradScaler exists or
is needed.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.core.rng import as_key
from stablediffusion_tpu.lora.core import (
    TEXT_TARGET_SUFFIXES,
    UNET_TARGET_SUFFIXES,
    init_lora,
)
from stablediffusion_tpu.lora.formats import save_lora_file
from stablediffusion_tpu.models.wrapper import SDModel
from stablediffusion_tpu.schedulers import DDPMScheduler
from stablediffusion_tpu.train import checkpoint as ckpt
from stablediffusion_tpu.train.dataset import SDLoRADataset
from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
from stablediffusion_tpu.train.train_step import TrainStatics, make_train_step

logger = logging.getLogger(__name__)


@dataclass
class SDTrainingArgs:
    """Defaults mirror the reference (train_lora_pipeline.py:36-57)."""

    train_batch_size: int = 4
    gradient_accumulation_steps: int = 1
    # "fp32" (optax.MultiSteps) | "bf16" (multi_steps_lowmem: halves the
    # accumulator tree - the 89 MiB that tips SDXL 1024² accum over 16 GB)
    accum_dtype: str = "fp32"
    mixed_precision: str = "bf16"  # "bf16" | "no" (fp16 maps to bf16 on TPU)
    rank: int = 16
    train_text_encoder: bool = True
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    adam_weight_decay: float = 1e-2
    num_train_epochs: int = 100
    max_train_steps: Optional[int] = None
    lr_scheduler: str = "constant_with_warmup"
    lr_warmup_steps: int = 500
    resolution: int = 1024
    max_grad_norm: float = 1.0
    use_8bit_adam: bool = False  # blockwise int8/uint8 moments (optim.scale_by_adam_8bit)
    seed: int = 0
    snr_gamma: Optional[float] = None
    noise_offset: float = 0.0
    random_flip: bool = True
    center_crop: bool = False
    # kohya-style aspect-ratio bucketing (beyond the reference's square
    # crop): batches are drawn from one aspect bucket at ~resolution^2 area;
    # the jitted step recompiles once per bucket shape
    aspect_ratio_bucketing: bool = False
    bucket_step: int = 64
    max_bucket_ar: float = 2.0
    # cap OCCUPIED bucket shapes (one XLA compile each); smallest merge
    # into the nearest aspect (dataset._merge_buckets)
    max_buckets: int = None
    gradient_checkpointing: bool = False
    # "" | "none" | "full" | "dots" | "offload" — see TrainStatics.remat_policy
    remat_policy: str = ""
    # encode VAE latents + text embeds in a SEPARATE jitted program each
    # step (diffusers --cache_latents analog): removes the fp32 VAE encoder
    # and both CLIP towers from the gradient program's memory peak.  This is
    # what fits SDXL 1024^2 LoRA training on one 16G chip.  Requires
    # train_text_encoder=False.
    cache_latents: bool = False
    vae_microbatch: int = 8
    checkpointing_steps: Optional[int] = None
    checkpoints_total_limit: Optional[int] = None
    resume_from_checkpoint: Optional[str] = None  # path | "latest"
    output_dir: str = "lora-out"
    log_every: int = 10
    # in-training validation + tracker logging (ref CLIs' log_validation,
    # train_text_to_image_lora.py:105-144,928-941)
    validation_prompt: Optional[str] = None
    num_validation_images: int = 4
    validation_epochs: int = 1
    validation_inference_steps: int = 25
    report_to: Optional[str] = "tensorboard"
    logging_dir: Optional[str] = None  # default {output_dir}/logs
    debug_loss: bool = False  # per-filename loss rows (_sdxl.py:1196-1198)
    # full-model fine-tuning (diffusers train_text_to_image analog;
    # beyond-parity — the reference ships LoRA training only).  Trains the
    # WHOLE UNet (fp32 masters), text towers frozen; final save is a full
    # diffusers-layout model via save_sd_model.  Pair with use_8bit_adam:
    # SD1.5's fp32 moments alone are ~7G, the 8-bit blocks cut that to ~1.8G.
    full_finetune: bool = False
    use_ema: bool = False  # EMA of the UNet weights, used for the final save
    ema_decay: float = 0.9999
    # ZeRO memory levers on a data mesh (parallel/zero.py): split the Adam
    # moments (ZeRO-1) and/or the frozen+trainable parameter trees (FSDP)
    # over the data axis instead of replicating them on every chip
    shard_opt_state: bool = False
    shard_params: bool = False
    # "peft" (diffusers load_lora_weights) | "kohya" (A1111/kohya-ss webui)
    lora_format: str = "peft"
    # Textual-inversion training (Gal et al. 2022; diffusers
    # textual_inversion.py analog — beyond-parity): train ONLY the
    # placeholder token's new embedding rows; UNet + text towers frozen.
    # Captions come from the paper's templates ("object" | "style"), one
    # drawn per image per step; the folder captions are ignored.
    textual_inversion: Optional[str] = None  # the placeholder token
    ti_initializer_token: Optional[str] = None  # seeds the new rows
    ti_num_vectors: int = 1
    ti_templates: str = "object"  # "object" | "style"
    # DreamBooth (Ruiz et al. 2022; diffusers train_dreambooth analog —
    # beyond-parity).  instance_prompt alone overrides the folder captions
    # ("a photo of sks dog"); with_prior_preservation additionally pairs
    # each batch with class images (auto-generated into class_data_dir by
    # the model itself when fewer than num_class_images exist) and adds
    # prior_loss_weight * class-half MSE.  Composes with LoRA (default)
    # and --full_finetune.
    instance_prompt: Optional[str] = None
    with_prior_preservation: bool = False
    class_data_dir: Optional[str] = None
    class_prompt: Optional[str] = None
    num_class_images: int = 50
    prior_loss_weight: float = 1.0
    sample_batch_size: int = 4


class SDLoRATrainer:
    def __init__(
        self,
        model: SDModel,
        args: SDTrainingArgs,
        data_dir: Optional[str] = None,
        mesh=None,
        dataset=None,
    ):
        """`dataset` (any object with the SDLoRADataset batch interface —
        e.g. HFImageCaptionDataset) overrides the jpg+txt `data_dir`."""
        if data_dir is None and dataset is None:
            raise ValueError("need a data_dir or a dataset")
        self.model = model
        self.args = args
        self.data_dir = data_dir
        self.mesh = mesh
        self.dataset = dataset
        self.metrics = None
        if args.report_to == "tensorboard" and jax.process_index() == 0:
            from stablediffusion_tpu.utils.observability import Metrics

            logdir = args.logging_dir or f"{args.output_dir}/logs"
            self.metrics = Metrics(tensorboard_dir=logdir)

    def train(self) -> Dict[str, Dict[str, dict]]:
        args = self.args
        model = self.model
        key = as_key(args.seed)
        k_unet, k_te, k_te2, k_loop = jax.random.split(key, 4)

        dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32

        if (args.shard_opt_state or args.shard_params) and self.mesh is None:
            raise ValueError(
                "shard_opt_state/shard_params split state over the data "
                "axis — pass a mesh (or --mesh_dp on the CLI)"
            )
        if args.with_prior_preservation:
            if args.textual_inversion:
                raise ValueError(
                    "with_prior_preservation does not combine with "
                    "textual_inversion (the TI paper trains on concept "
                    "images only)")
            if not (args.instance_prompt and args.class_prompt
                    and args.class_data_dir):
                raise ValueError(
                    "with_prior_preservation needs instance_prompt, "
                    "class_prompt and class_data_dir")
            if self.dataset is not None:
                raise ValueError(
                    "with_prior_preservation builds its own paired dataset; "
                    "pass data_dir, not dataset=")
            self._ensure_class_images()

        ti_rows = ti_rows_2 = None
        if args.textual_inversion:
            if args.full_finetune or args.train_text_encoder:
                raise ValueError(
                    "textual_inversion trains ONLY the new embedding rows; "
                    "set full_finetune=False and train_text_encoder=False")
            if not args.ti_initializer_token:
                raise ValueError("textual_inversion needs ti_initializer_token")
            if args.ti_templates not in ("object", "style"):
                raise ValueError("ti_templates must be 'object' or 'style'")
            V = int(args.ti_num_vectors)

            def init_rows(tokenizer, params):
                table = params["text_model"]["embeddings"][
                    "token_embedding"]["weight"]
                init_ids = np.asarray(
                    tokenizer([args.ti_initializer_token]))[0]
                init_id = int(init_ids[1])  # position 0 is BOS
                if int(init_ids[2]) != tokenizer.eos_token_id:
                    raise ValueError(
                        f"ti_initializer_token "
                        f"{args.ti_initializer_token!r} must encode to a "
                        "single token")
                row = np.asarray(table[init_id], np.float32)
                return table.shape[0], np.tile(row[None, :], (V, 1))

            orig_rows, rows0 = init_rows(
                model.tokenizer, model.text_encoder_params)
            if model.is_sdxl:
                # dual-tower (diffusers textual_inversion_sdxl analog):
                # rows in BOTH towers, saved as {clip_l, clip_g}
                orig_rows_2, rows0_2 = init_rows(
                    model.tokenizer_2, model.text_encoder_2_params)
                model.load_textual_inversion(
                    {"clip_l": rows0, "clip_g": rows0_2},
                    token=args.textual_inversion,
                )
                ti_rows_2 = tuple(range(orig_rows_2, orig_rows_2 + V))
            else:
                # appends the rows to live+base tables and registers the
                # placeholder trigger in the tokenizer (inference's path)
                model.load_textual_inversion(
                    {args.textual_inversion: rows0},
                    token=args.textual_inversion,
                )
            ti_rows = tuple(range(orig_rows, orig_rows + V))
            self._ti_placeholder = args.textual_inversion
            from stablediffusion_tpu.train.ti_templates import (
                OBJECT_TEMPLATES,
                STYLE_TEMPLATES,
            )

            self._ti_templates = (
                OBJECT_TEMPLATES if args.ti_templates == "object"
                else STYLE_TEMPLATES
            )
            self._ti_rng = np.random.default_rng(args.seed)

        full = args.full_finetune
        if args.textual_inversion:
            trainable = {"embeddings": jnp.asarray(rows0, jnp.float32)}
            if model.is_sdxl:
                trainable["embeddings_2"] = jnp.asarray(rows0_2, jnp.float32)
        elif full:
            if args.train_text_encoder:
                raise ValueError(
                    "full_finetune trains the UNet only (the upstream "
                    "train_text_to_image never trains text towers); set "
                    "train_text_encoder=False"
                )
            # fp32 masters over the whole UNet
            trainable = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float32), model.unet_params
            )
        else:
            # LoRA factors (fp32 trainables over frozen bases —
            # ref: train_lora_pipeline.py:219-278)
            trainable: Dict[str, dict] = {
                "unet": init_lora(
                    k_unet, model.unet_params, args.rank, UNET_TARGET_SUFFIXES,
                    store_alpha=False,
                )
            }
            if args.train_text_encoder:
                trainable["text_encoder"] = init_lora(
                    k_te, model.text_encoder_params, args.rank,
                    TEXT_TARGET_SUFFIXES, store_alpha=False,
                )
                if model.is_sdxl:
                    trainable["text_encoder_2"] = init_lora(
                        k_te2, model.text_encoder_2_params, args.rank,
                        TEXT_TARGET_SUFFIXES, store_alpha=False,
                    )
        lora = trainable  # loop-local name (historical)

        # data
        if args.with_prior_preservation:
            from stablediffusion_tpu.train.dataset import DreamBoothDataset

            dataset = DreamBoothDataset(
                self.data_dir,
                args.instance_prompt,
                args.class_data_dir,
                args.class_prompt,
                resolution=args.resolution,
                random_flip=args.random_flip,
                center_crop=args.center_crop,
                seed=args.seed,
            )
        else:
            dataset = None
        dataset = dataset or self.dataset or SDLoRADataset(
            self.data_dir,
            resolution=args.resolution,
            random_flip=args.random_flip,
            center_crop=args.center_crop,
            seed=args.seed,
            aspect_ratio_bucketing=args.aspect_ratio_bucketing,
            bucket_step=args.bucket_step,
            max_bucket_ar=args.max_bucket_ar,
            max_buckets=args.max_buckets,
        )
        if args.aspect_ratio_bucketing and not getattr(dataset, "buckets", None):
            raise ValueError(
                "aspect_ratio_bucketing needs the folder dataset "
                "(SDLoRADataset); the provided dataset has no buckets")
        steps_per_epoch = max(len(dataset) // args.train_batch_size, 1)
        total_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch

        # optimizer
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
            use_8bit=args.use_8bit_adam,
            accum_dtype=getattr(args, "accum_dtype", None),
        )
        opt_state = optimizer.init(lora)

        # DDPM forward-diffusion scheduler (training side)
        scheduler = DDPMScheduler(model.scheduler_config)
        statics = TrainStatics(
            unet_config=model.unet_config,
            vae_config=model.vae_config,
            text_config=model.text_encoder_config,
            text_config_2=model.text_encoder_2_config if model.is_sdxl else None,
            scheduler_config=model.scheduler_config,
            train_text_encoder=args.train_text_encoder,
            snr_gamma=args.snr_gamma,
            noise_offset=args.noise_offset,
            compute_dtype=dtype,
            gradient_checkpointing=args.gradient_checkpointing,
            remat_policy=args.remat_policy,
            vae_microbatch=args.vae_microbatch,
            ti_rows=ti_rows,
            ti_rows_2=ti_rows_2,
            prior_loss_weight=(
                float(args.prior_loss_weight)
                if args.with_prior_preservation else None
            ),
        )
        # donate the state buffers to the step (in-place update) — except
        # under EMA, where `ema` starts as an alias of the initial trainable
        # tree and donation would invalidate it out from under the EMA update
        step_kw = dict(
            mesh=self.mesh,
            donate=not args.use_ema,
            shard_opt_state=args.shard_opt_state,
            shard_params=args.shard_params,
        )
        if args.textual_inversion:
            from stablediffusion_tpu.train.train_step import ti_loss_fn

            step_fn = make_train_step(
                statics, scheduler, optimizer, loss=ti_loss_fn, **step_kw
            )
        elif full:
            from stablediffusion_tpu.train.train_step import full_finetune_loss_fn

            step_fn = make_train_step(
                statics, scheduler, optimizer, loss=full_finetune_loss_fn,
                **step_kw
            )
        else:
            step_fn = make_train_step(statics, scheduler, optimizer, **step_kw)
        ema = None
        if args.use_ema:
            if not full:
                raise ValueError("use_ema is a full_finetune option")
            d = float(args.ema_decay)
            ema = trainable  # starts at the initial weights
            self._ema_update = jax.jit(
                lambda e, p: jax.tree_util.tree_map(
                    lambda a, b: a * d + b * (1.0 - d), e, p
                )
            )
        self._encode_fn = None
        if args.cache_latents:
            if args.train_text_encoder:
                raise ValueError(
                    "--cache_latents requires train_text_encoder=False"
                )
            from stablediffusion_tpu.train.train_step import make_encode_fn

            self._encode_fn = make_encode_fn(statics, mesh=self.mesh)

        frozen = {
            "vae": model.vae_params,
            "text_encoder": model.text_encoder_params,
        }
        if not full:
            # full mode: the trainable IS the unet — keeping the pristine
            # copy in the program would double its HBM footprint
            frozen["unet"] = model.unet_params
        if model.is_sdxl:
            frozen["text_encoder_2"] = model.text_encoder_2_params

        # resume
        ckpt_key = (
            "ti" if args.textual_inversion else ("unet" if full else "lora")
        )
        start_step = 0
        if args.resume_from_checkpoint:
            found = ckpt.resolve_resume(
                args.resume_from_checkpoint, args.output_dir
            )
            if found:
                start_step, path = found
                template = {ckpt_key: lora, "opt_state": opt_state}
                if ema is not None:
                    template["ema"] = ema
                state = ckpt.load_checkpoint(path, template)
                lora, opt_state = state[ckpt_key], state["opt_state"]
                ema = state.get("ema", ema)
                logger.info("resumed from %s at step %d", path, start_step)

        # ZeRO placement — after resume so reloaded state gets the same
        # split layout the step's in_shardings expect
        if self.mesh is not None and args.shard_opt_state:
            from stablediffusion_tpu.parallel import zero

            opt_state = zero.shard_tree(opt_state, self.mesh)
        if self.mesh is not None and args.shard_params:
            from stablediffusion_tpu.parallel import zero

            lora = zero.shard_tree(lora, self.mesh)
            frozen = zero.shard_tree(frozen, self.mesh)

        # loop
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
            if self._encode_fn is not None:
                # VAE+text encode as its own XLA program (fresh key: latent
                # sampling stays per-step stochastic like the fused path)
                k_step, k_enc = jax.random.split(k_step)
                jb = self._encode_fn(frozen, jb, k_enc)
            lora, opt_state, metrics = step_fn(lora, opt_state, frozen, jb, k_step)
            # EMA tracks OPTIMIZER updates, not data steps: with grad
            # accumulation the params only move every k-th call (upstream
            # EMAModel convention — decay would otherwise compound k-fold)
            if ema is not None and (
                (step + 1) % args.gradient_accumulation_steps == 0
            ):
                ema = self._ema_update(ema, lora)
            step += 1
            if step % args.log_every == 0 or step == total_steps:
                loss = float(metrics["loss"])
                history.append((step, loss))
                logger.info(
                    "step %d/%d loss %.5f lr %.2e %.2f s/it",
                    step,
                    total_steps,
                    loss,
                    float(schedule(step)),
                    (time.time() - t0) / max(step - start_step, 1),
                )
                if self.metrics is not None:
                    self.metrics.observe("train/loss", loss, step=step)
                    self.metrics.observe(
                        "train/lr", float(schedule(step)), step=step
                    )
                if args.debug_loss and batch.get("filenames"):
                    # reference convention: the batch loss keyed per filename
                    for fname in batch["filenames"]:
                        if self.metrics is not None:
                            self.metrics.observe(
                                f"loss_for_{fname}", loss, step=step
                            )
            # per-epoch validation rendering with the CURRENT LoRA state
            if (
                args.validation_prompt
                and step % (steps_per_epoch * args.validation_epochs) == 0
                and jax.process_index() == 0
            ):
                epoch = step // steps_per_epoch
                if args.textual_inversion:
                    # write the current rows into the live tower(s) (the
                    # trigger is registered) and render normally
                    self._set_ti_rows(
                        ti_rows, np.asarray(lora["embeddings"], np.float32)
                    )
                    if model.is_sdxl:
                        self._set_ti_rows(
                            ti_rows_2,
                            np.asarray(lora["embeddings_2"], np.float32),
                            tower=2,
                        )
                    self._log_validation_full(model.unet_params, epoch, step)
                elif full:
                    self._log_validation_full(lora, epoch, step)
                else:
                    self._log_validation(lora, epoch, step)
            if (
                args.checkpointing_steps
                and step % args.checkpointing_steps == 0
                and jax.process_index() == 0
            ):
                state = {ckpt_key: lora, "opt_state": opt_state}
                if ema is not None:
                    state["ema"] = ema
                ckpt.save_checkpoint(
                    args.output_dir,
                    step,
                    state,
                    args.checkpoints_total_limit,
                )

        finally:
            # deterministic pool shutdown: the generator may be
            # abandoned mid-epoch (max_train_steps break)
            batch_iter.close()
        self.history = history
        self.lora = lora
        if self.metrics is not None:
            self.metrics.flush()
        if args.textual_inversion:
            # write the trained rows into the live model (the rows were
            # appended at setup; the trigger is already registered) and save
            # the diffusers learned_embeds format our loader round-trips
            rows = np.asarray(lora["embeddings"], np.float32)
            self._set_ti_rows(ti_rows, rows)
            payload = {args.textual_inversion: rows}
            if model.is_sdxl:
                rows2 = np.asarray(lora["embeddings_2"], np.float32)
                self._set_ti_rows(ti_rows_2, rows2, tower=2)
                payload = {"clip_l": rows, "clip_g": rows2}
            if jax.process_index() == 0:
                import os

                from stablediffusion_tpu.io.safetensors_io import save_safetensors

                os.makedirs(args.output_dir, exist_ok=True)
                save_safetensors(
                    payload,
                    f"{args.output_dir}/learned_embeds.safetensors",
                )
            return lora
        if full:
            # write the trained (or EMA) weights back into the model and save
            # the FULL diffusers-layout pipeline (train_text_to_image
            # convention: the EMA weights are what ships)
            final = ema if ema is not None else lora
            model.unet_params = final
            if model._base_params is not None:
                model._base_params["unet"] = final
            if jax.process_index() == 0:
                from stablediffusion_tpu.io.loader import save_sd_model

                save_sd_model(model, args.output_dir)
            return final
        # final save in diffusers interchange format
        # (ref: train_lora_pipeline.py:497-528)
        if jax.process_index() == 0:
            import os

            os.makedirs(args.output_dir, exist_ok=True)
            save_lora_file(
                lora,
                f"{args.output_dir}/pytorch_lora_weights.safetensors",
                metadata={"format": "pt", "rank": str(args.rank)},
                format=args.lora_format,
            )
        return lora

    def _ensure_class_images(self) -> None:
        """Top up class_data_dir to num_class_images with the model's own
        renders of class_prompt (the diffusers train_dreambooth
        pre-generation loop)."""
        import os

        args = self.args
        os.makedirs(args.class_data_dir, exist_ok=True)
        exts = (".jpg", ".jpeg", ".png", ".webp")
        have = [
            f for f in os.listdir(args.class_data_dir)
            if f.lower().endswith(exts)
        ]
        missing = int(args.num_class_images) - len(have)
        if missing <= 0:
            return
        if jax.process_index() != 0:
            return  # single-writer; other hosts see the files via shared fs
        from PIL import Image

        from stablediffusion_tpu.pipelines.unified import (
            StableDiffusionUnifiedPipeline,
        )

        logger.info(
            "generating %d class images for %r", missing, args.class_prompt
        )
        pipe = StableDiffusionUnifiedPipeline()
        done = 0
        while done < missing:
            n = min(int(args.sample_batch_size), missing - done)
            out = pipe(
                self.model,
                prompt=args.class_prompt,
                num_images_per_prompt=n,
                num_inference_steps=25,
                seed=args.seed + 7919 + done,
            )
            for im in out.images:
                arr = (np.clip(im, 0.0, 1.0) * 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(
                        args.class_data_dir, f"class-{len(have) + done}.jpg"
                    )
                )
                done += 1

    def _set_ti_rows(self, ti_rows, rows, tower: int = 1) -> None:
        """Write trained embedding rows into the live (and pristine-base)
        text tower so the registered trigger renders with them."""
        model = self.model
        idx = jnp.asarray(ti_rows)

        def put(tree):
            emb = tree["text_model"]["embeddings"]
            w = emb["token_embedding"]["weight"]
            w = w.at[idx].set(jnp.asarray(rows, w.dtype))
            tree = dict(tree)
            tm = dict(tree["text_model"])
            e = dict(tm["embeddings"])
            e["token_embedding"] = {"weight": w}
            tm["embeddings"] = e
            tree["text_model"] = tm
            return tree

        attr = "text_encoder_params" if tower == 1 else "text_encoder_2_params"
        comp = "text_encoder" if tower == 1 else "text_encoder_2"
        setattr(model, attr, put(getattr(model, attr)))
        if model._base_params is not None:
            base = model._base_params.get(comp)
            if base is not None:
                model._base_params[comp] = put(base)

    def _log_validation_full(self, unet_params, epoch: int, step: int) -> None:
        """Validation rendering for full_finetune: swap the live UNet weights
        in, render, restore (the LoRA fuse path does not apply)."""
        args = self.args
        model = self.model
        from stablediffusion_tpu.pipelines.unified import (
            StableDiffusionUnifiedPipeline,
        )

        prev = model.unet_params
        try:
            model.unet_params = unet_params
            out = StableDiffusionUnifiedPipeline()(
                model,
                prompt=args.validation_prompt,
                num_images_per_prompt=args.num_validation_images,
                num_inference_steps=args.validation_inference_steps,
                seed=args.seed,
            )
            if self.metrics is not None:
                self.metrics.images("validation", out.images, step=step)
            logger.info(
                "epoch %d: rendered %d validation images (%r)",
                epoch, args.num_validation_images, args.validation_prompt,
            )
        finally:
            model.unet_params = prev

    def _log_validation(self, lora, epoch: int, step: int) -> None:
        """Render N fixed-seed validation images with the current LoRA state
        and log them to the tracker (the reference's per-epoch log_validation,
        train_text_to_image_lora.py:105-144,928-941).  The adapter is fused
        from pristine bases and removed afterwards, so training state is
        untouched."""
        args = self.args
        model = self.model
        from stablediffusion_tpu.pipelines.unified import (
            StableDiffusionUnifiedPipeline,
        )

        model.load_lora_weights("__validation__", lora)
        try:
            model.set_adapters({"__validation__": 1.0})
            pipe = StableDiffusionUnifiedPipeline()
            out = pipe(
                model,
                prompt=args.validation_prompt,
                num_images_per_prompt=args.num_validation_images,
                num_inference_steps=args.validation_inference_steps,
                seed=args.seed,  # fixed seed: images comparable across epochs
            )
            if self.metrics is not None:
                self.metrics.images("validation", out.images, step=step)
            logger.info(
                "epoch %d: rendered %d validation images (%r)",
                epoch, args.num_validation_images, args.validation_prompt,
            )
        finally:
            model.delete_adapters()

    def _prepare_batch(self, batch) -> Dict[str, jax.Array]:
        model = self.model
        captions = batch["captions"]
        if (
            self.args.instance_prompt
            and not self.args.with_prior_preservation
        ):
            captions = [self.args.instance_prompt] * len(captions)
        if self.args.textual_inversion:
            # TI convention: folder captions are ignored; each image gets a
            # random paper template around the placeholder token
            captions = [
                self._ti_rng.choice(self._ti_templates).format(
                    self._ti_placeholder
                )
                for _ in captions
            ]
        jb: Dict[str, Any] = {
            "pixel_values": jnp.asarray(batch["pixel_values"]),
            "input_ids": jnp.asarray(model.tokenizer(captions)),
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
