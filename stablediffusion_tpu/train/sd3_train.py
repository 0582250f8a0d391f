"""SD3 / MM-DiT LoRA fine-tuning — flow-matching training loop.

Beyond-parity (the reference repo trains SD1.5/SDXL LoRAs only); semantics
mirror diffusers' train_dreambooth_lora_sd3.py: logit-normal timestep-density
sampling over the SHIFTED flow sigma table, x_t = (1-σ)x0 + σε, velocity
target ε - x0, LoRA factors on the MM-DiT attention projections (both
streams), frozen VAE / CLIP / T5.  One jitted step via
train_step.make_train_step(loss=sd3_lora_loss_fn).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from stablediffusion_tpu.core.config import SD3Config, SchedulerConfig, VAEConfig
from stablediffusion_tpu.core.config import CLIPTextConfig
from stablediffusion_tpu.core.rng import as_key
from stablediffusion_tpu.lora.core import init_lora
from stablediffusion_tpu.lora.core import apply_lora_for_training
from stablediffusion_tpu.lora.formats import save_lora_file
from stablediffusion_tpu.models import clip as clip_model
from stablediffusion_tpu.models import mmdit as mmdit_model
from stablediffusion_tpu.models import t5 as t5_model
from stablediffusion_tpu.models import vae as vae_model
from stablediffusion_tpu.pipelines.sd3 import SD3Model
from stablediffusion_tpu.schedulers.flow_match import FlowMatchEulerScheduler
from stablediffusion_tpu.train import checkpoint as ckpt
from stablediffusion_tpu.train.dataset import SDLoRADataset
from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
from stablediffusion_tpu.train.train_step import make_train_step

logger = logging.getLogger(__name__)

# MM-DiT attention projections, both streams (diffusers
# train_dreambooth_lora_sd3 target_modules)
MMDIT_TARGET_SUFFIXES = (
    "to_q", "to_k", "to_v", "to_out.0",
    "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out",
)


@dataclass(frozen=True)
class SD3TrainStatics:
    transformer_config: SD3Config
    vae_config: VAEConfig
    text_config: CLIPTextConfig
    text_config_2: CLIPTextConfig
    text_config_3: Optional[Any]  # t5_model.T5Config
    scheduler_config: SchedulerConfig
    compute_dtype: Any = jnp.bfloat16
    weighting_scheme: str = "logit_normal"  # | "uniform" | "sigma_sqrt"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    gradient_checkpointing: bool = False
    vae_microbatch: int = 0
    # MM-DiT backward remat: "" defers to gradient_checkpointing ("full"
    # when set); none | full | dots | offload (pinned-host residuals) —
    # same policy set as train_step.TrainStatics
    remat_policy: str = ""


def _encode_prompts_train(statics: SD3TrainStatics, frozen, batch):
    """Triple-encoder conditioning (pipelines/sd3.encode_prompt semantics,
    no negatives)."""
    joint = statics.transformer_config.joint_attention_dim
    out1 = clip_model.apply(
        frozen["text_encoder"], statics.text_config, batch["input_ids"]
    )
    out2 = clip_model.apply(
        frozen["text_encoder_2"], statics.text_config_2, batch["input_ids_2"]
    )
    h = jnp.concatenate(
        [out1.hidden_states[-2], out2.hidden_states[-2]], axis=-1
    )
    h = jnp.pad(h, ((0, 0), (0, 0), (0, joint - h.shape[-1])))
    pooled = jnp.concatenate(
        [out1.projected_pooled, out2.projected_pooled], axis=-1
    )
    if statics.text_config_3 is not None and "input_ids_3" in batch:
        t5_h = t5_model.apply(
            frozen["text_encoder_3"], statics.text_config_3, batch["input_ids_3"]
        )
    else:
        t5_h = jnp.zeros((h.shape[0], 77, joint), h.dtype)
    return jnp.concatenate([h, t5_h.astype(h.dtype)], axis=1), pooled


def make_sd3_encode_fn(statics: SD3TrainStatics, mesh=None):
    """Separate jitted VAE + triple-text encode program (the --cache_latents
    split, mirroring train_step.make_encode_fn).  Returns
    ``encode(frozen, batch, key) -> batch'`` replacing pixel_values /
    input_ids* with "latents" (sampled + shift/scale-normalized, fp32) and
    "prompt_embeds"/"pooled_embeds" — so the fp32 VAE encoder and the three
    text towers never share an XLA program with the MM-DiT backward peak."""

    def encode(frozen, batch, key):
        pixels = batch["pixel_values"].astype(jnp.float32)
        mean, logvar = vae_model.encode(frozen["vae"], statics.vae_config, pixels)
        latents = vae_model.sample_latent(mean, logvar, key)
        if statics.vae_config.shift_factor:
            latents = latents - statics.vae_config.shift_factor
        latents = latents * statics.vae_config.scaling_factor
        embeds, pooled = _encode_prompts_train(statics, frozen, batch)
        out = {
            k: v
            for k, v in batch.items()
            if k not in ("pixel_values", "input_ids", "input_ids_2", "input_ids_3")
        }
        out["latents"] = latents
        out["prompt_embeds"] = embeds
        out["pooled_embeds"] = pooled
        return out

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        return jax.jit(encode, in_shardings=(repl, None, repl))
    return jax.jit(encode)


def sd3_lora_loss_fn(
    lora,
    frozen: Dict[str, Any],
    batch: Dict[str, jax.Array],
    key: jax.Array,
    statics: SD3TrainStatics,
    scheduler: FlowMatchEulerScheduler,
):
    k_sample, k_noise, k_t = jax.random.split(key, 3)
    dt = statics.compute_dtype

    # VAE encode (fp32) + SD3 latent normalization — or precomputed
    # "latents" from make_sd3_encode_fn's separate program (the
    # --cache_latents split: keeps the fp32 VAE encoder out of the XLA
    # program holding the MM-DiT backward peak)
    if "latents" in batch:
        latents = batch["latents"].astype(jnp.float32)
    else:
        pixels = batch["pixel_values"].astype(jnp.float32)
        mb = statics.vae_microbatch
        if mb and pixels.shape[0] > mb and pixels.shape[0] % mb == 0:
            chunks = pixels.reshape(pixels.shape[0] // mb, mb, *pixels.shape[1:])
            mean, logvar = jax.lax.map(
                lambda c: vae_model.encode(frozen["vae"], statics.vae_config, c),
                chunks,
            )
            mean = mean.reshape(pixels.shape[0], *mean.shape[2:])
            logvar = logvar.reshape(pixels.shape[0], *logvar.shape[2:])
        else:
            mean, logvar = vae_model.encode(
                frozen["vae"], statics.vae_config, pixels
            )
        latents = vae_model.sample_latent(mean, logvar, k_sample)
        if statics.vae_config.shift_factor:
            latents = latents - statics.vae_config.shift_factor
        latents = latents * statics.vae_config.scaling_factor

    # logit-normal density timestep sampling over the shifted sigma table
    # (diffusers compute_density_for_timestep_sampling)
    B = latents.shape[0]
    T = statics.scheduler_config.num_train_timesteps
    if statics.weighting_scheme == "logit_normal":
        u = jax.nn.sigmoid(
            statics.logit_mean
            + statics.logit_std * jax.random.normal(k_t, (B,), jnp.float32)
        )
    else:
        u = jax.random.uniform(k_t, (B,), jnp.float32)
    idx = jnp.clip((u * T).astype(jnp.int32), 0, T - 1)
    train_sigmas = jnp.asarray(scheduler._train_sigmas, jnp.float32)
    sigmas = train_sigmas[idx]
    timesteps = sigmas * T

    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    sig_b = sigmas[:, None, None, None]
    noisy = (1.0 - sig_b) * latents + sig_b * noise

    if "prompt_embeds" in batch:
        embeds, pooled = batch["prompt_embeds"], batch["pooled_embeds"]
    else:
        embeds, pooled = _encode_prompts_train(statics, frozen, batch)

    params = apply_lora_for_training(frozen["transformer"], lora["transformer"])

    def fwd(p, x, t, ctx, pool):
        return mmdit_model.apply(p, statics.transformer_config, x, t, ctx, pool)

    # remat policy notes: the dots-saveable policy keeps every matmul output
    # alive and at MM-DiT widths that INCREASES peak memory (measured 21.2G
    # vs 16.4G un-remat at batch 16 512px); "full" recomputes everything,
    # "offload" checkpoints residuals to pinned host memory
    from stablediffusion_tpu.train.train_step import _resolve_remat

    fwd = _resolve_remat(statics)(fwd)
    pred = fwd(
        params, noisy.astype(dt), timesteps, embeds.astype(dt), pooled.astype(dt)
    ).astype(jnp.float32)

    target = noise - latents  # flow velocity
    per_sample = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    if statics.weighting_scheme == "sigma_sqrt":
        per_sample = per_sample * (sigmas**-2.0)
    return jnp.mean(per_sample)


@dataclass
class SD3TrainingArgs:
    train_batch_size: int = 1
    gradient_accumulation_steps: int = 1
    accum_dtype: str = "fp32"  # "bf16": low-memory accumulator
    mixed_precision: str = "bf16"
    rank: int = 16
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    adam_weight_decay: float = 1e-2
    num_train_epochs: int = 1
    max_train_steps: Optional[int] = None
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 500
    resolution: int = 1024
    max_grad_norm: float = 1.0
    use_8bit_adam: bool = False
    seed: int = 0
    weighting_scheme: str = "logit_normal"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    max_sequence_length: int = 77
    random_flip: bool = True
    center_crop: bool = False
    gradient_checkpointing: bool = False
    vae_microbatch: int = 0
    remat_policy: str = ""
    cache_latents: bool = False
    checkpointing_steps: Optional[int] = None
    checkpoints_total_limit: Optional[int] = None
    resume_from_checkpoint: Optional[str] = None
    # ZeRO levers (parallel/zero.py; see SDTrainingArgs for semantics)
    shard_opt_state: bool = False
    shard_params: bool = False
    output_dir: str = "sd3-lora-out"
    log_every: int = 10
    report_to: Optional[str] = None


class SD3LoRATrainer:
    def __init__(
        self,
        model: SD3Model,
        args: SD3TrainingArgs,
        data_dir: Optional[str] = None,
        mesh=None,
        dataset=None,
    ):
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

            self.metrics = Metrics(tensorboard_dir=f"{args.output_dir}/logs")

    def train(self):
        args = self.args
        model = self.model
        key = as_key(args.seed)
        k_lora, k_loop = jax.random.split(key)
        dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32

        lora = {
            "transformer": init_lora(
                k_lora, model.transformer_params, args.rank,
                MMDIT_TARGET_SUFFIXES, store_alpha=False,
            )
        }

        dataset = self.dataset or SDLoRADataset(
            self.data_dir,
            resolution=args.resolution,
            random_flip=args.random_flip,
            center_crop=args.center_crop,
            seed=args.seed,
        )
        steps_per_epoch = max(len(dataset) // args.train_batch_size, 1)
        total_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch

        schedule = make_lr_schedule(
            args.lr_scheduler, args.learning_rate, args.lr_warmup_steps, total_steps
        )
        optimizer = make_optimizer(
            schedule, args.adam_beta1, args.adam_beta2, args.adam_epsilon,
            args.adam_weight_decay, args.max_grad_norm,
            args.gradient_accumulation_steps,
            use_8bit=getattr(args, "use_8bit_adam", False),
            accum_dtype=getattr(args, "accum_dtype", None),
        )
        opt_state = optimizer.init(lora)

        scheduler = FlowMatchEulerScheduler(model.scheduler_config)
        statics = SD3TrainStatics(
            transformer_config=model.transformer_config,
            vae_config=model.vae_config,
            text_config=model.text_encoder_config,
            text_config_2=model.text_encoder_2_config,
            text_config_3=model.text_encoder_3_config,
            scheduler_config=model.scheduler_config,
            compute_dtype=dtype,
            weighting_scheme=args.weighting_scheme,
            logit_mean=args.logit_mean,
            logit_std=args.logit_std,
            gradient_checkpointing=args.gradient_checkpointing,
            vae_microbatch=args.vae_microbatch,
            remat_policy=args.remat_policy,
        )
        if (args.shard_opt_state or args.shard_params) and self.mesh is None:
            raise ValueError(
                "shard_opt_state/shard_params split state over the data "
                "axis — pass a mesh"
            )
        step_fn = make_train_step(
            statics, scheduler, optimizer, mesh=self.mesh,
            loss=sd3_lora_loss_fn, donate=True,
            shard_opt_state=args.shard_opt_state,
            shard_params=args.shard_params,
        )
        encode_fn = (
            make_sd3_encode_fn(statics, mesh=self.mesh)
            if args.cache_latents
            else None
        )

        frozen = {
            "transformer": model.transformer_params,
            "vae": model.vae_params,
            "text_encoder": model.text_encoder_params,
            "text_encoder_2": model.text_encoder_2_params,
        }
        if model.text_encoder_3_params is not None:
            frozen["text_encoder_3"] = model.text_encoder_3_params

        start_step = 0
        if args.resume_from_checkpoint:
            found = ckpt.resolve_resume(
                args.resume_from_checkpoint, args.output_dir
            )
            if found:
                start_step, path = found
                state = ckpt.load_checkpoint(
                    path, {"lora": lora, "opt_state": opt_state}
                )
                lora, opt_state = state["lora"], state["opt_state"]
                logger.info("resumed from %s at step %d", path, start_step)

        if self.mesh is not None and args.shard_opt_state:
            from stablediffusion_tpu.parallel import zero

            opt_state = zero.shard_tree(opt_state, self.mesh)
        if self.mesh is not None and args.shard_params:
            from stablediffusion_tpu.parallel import zero

            lora = zero.shard_tree(lora, self.mesh)
            frozen = zero.shard_tree(frozen, self.mesh)

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
            if encode_fn is not None:
                k_step, k_enc = jax.random.split(k_step)
                jb = encode_fn(frozen, jb, k_enc)
            lora, opt_state, metrics = step_fn(lora, opt_state, frozen, jb, k_step)
            step += 1
            if step % args.log_every == 0 or step == total_steps:
                loss = float(metrics["loss"])
                history.append((step, loss))
                logger.info(
                    "step %d/%d loss %.5f %.2f s/it",
                    step, total_steps, loss,
                    (time.time() - t0) / max(step - start_step, 1),
                )
                if self.metrics is not None:
                    self.metrics.observe("train/loss", loss, step=step)
            if (
                args.checkpointing_steps
                and step % args.checkpointing_steps == 0
                and jax.process_index() == 0
            ):
                ckpt.save_checkpoint(
                    args.output_dir, step,
                    {"lora": lora, "opt_state": opt_state},
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
        if jax.process_index() == 0:
            import os

            os.makedirs(args.output_dir, exist_ok=True)
            save_lora_file(
                lora,
                f"{args.output_dir}/pytorch_lora_weights.safetensors",
                metadata={"format": "pt", "rank": str(args.rank)},
            )
        return lora

    def _prepare_batch(self, batch) -> Dict[str, jax.Array]:
        model = self.model
        jb: Dict[str, Any] = {
            "pixel_values": jnp.asarray(batch["pixel_values"]),
            "input_ids": jnp.asarray(model.tokenizer(batch["captions"])),
            "input_ids_2": jnp.asarray(model.tokenizer_2(batch["captions"])),
        }
        if model.tokenizer_3 is not None and model.text_encoder_3_params is not None:
            jb["input_ids_3"] = jnp.asarray(
                model.tokenizer_3(
                    batch["captions"], max_length=self.args.max_sequence_length
                )
            )
        if self.mesh is not None:
            from stablediffusion_tpu.parallel import shard_batch

            jb = shard_batch(self.mesh, jb)
        return jb
