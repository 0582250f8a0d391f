"""Jitted LoRA train step with data-parallel mesh sharding.

The reference's hot loop (train_lora_pipeline.py:408-493; CLI variants with
Min-SNR at train_text_to_image_lora.py:845-862): VAE-encode -> noise + random
timestep -> add_noise -> text encode -> UNet predict -> epsilon/velocity MSE
-> backward/clip/step, with accelerate DDP allreduce.

TPU-native: ONE jitted function containing the whole chain; gradients flow to
the LoRA factors only (base weights are constants re-fused inside the step);
the batch is sharded over the `data` mesh axis so XLA emits the gradient
all-reduce over ICI — there is no explicit collective code (SURVEY.md §5.8).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from stablediffusion_tpu.core.config import (
    CLIPTextConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from stablediffusion_tpu.lora.core import apply_lora_for_training
from stablediffusion_tpu.models import clip as clip_model
from stablediffusion_tpu.models import unet as unet_model
from stablediffusion_tpu.models import vae as vae_model
from stablediffusion_tpu.schedulers.common import BaseScheduler


def compute_snr(alphas_cumprod: jax.Array, timesteps: jax.Array) -> jax.Array:
    """SNR(t) = alpha_bar / (1 - alpha_bar) (diffusers compute_snr analog)."""
    ac = alphas_cumprod[timesteps]
    return ac / (1.0 - ac)


def min_snr_weight(
    snr: jax.Array, gamma: float, prediction_type: str
) -> jax.Array:
    """Min-SNR-gamma loss weighting (arXiv 2303.09556;
    ref: train_text_to_image_lora.py:845-862)."""
    capped = jnp.minimum(snr, gamma)
    if prediction_type == "v_prediction":
        return capped / (snr + 1.0)
    return capped / jnp.maximum(snr, 1e-8)


@dataclass(frozen=True)
class TrainStatics:
    """Hashable static bundle for the jitted step."""

    unet_config: UNetConfig
    vae_config: VAEConfig
    text_config: CLIPTextConfig
    text_config_2: Optional[CLIPTextConfig]
    scheduler_config: SchedulerConfig
    train_text_encoder: bool
    snr_gamma: Optional[float]
    noise_offset: float = 0.0
    compute_dtype: Any = jnp.bfloat16
    # remat the UNet forward during backprop (SURVEY.md D12; the reference's
    # --gradient_checkpointing flag, train_text_to_image_lora.py:560-561)
    gradient_checkpointing: bool = False
    # VAE encode dtype.  fp32 is the reference policy
    # (train_lora_pipeline.py:238); bf16 is range-safe on TPU (bf16 shares
    # fp32's exponent) and halves the fp32 encoder-activation peak — the
    # difference between SDXL 1024px batch-4 training fitting in 16G or not
    vae_dtype: Any = jnp.float32
    # encode pixels through the fp32 VAE in chunks of this many images
    # (0 = whole batch): the fp32 encoder activations at 512^2 are the
    # memory peak and cap the trainable batch size otherwise
    vae_microbatch: int = 0
    # UNet backward rematerialization policy: "" defers to the legacy
    # gradient_checkpointing bool ("full" when set); "none" | "full"
    # (recompute everything) | "dots" (keep matmul outputs) | "offload"
    # (checkpoint residuals to pinned HOST memory during forward, fetch
    # them back in backward — trades HBM peak for host-link traffic,
    # jax.checkpoint_policies.offload_dot_with_no_batch_dims)
    remat_policy: str = ""
    # ControlNet training: architecture of the trainable ControlNet (defaults
    # to the UNet's own block layout, as ControlNetModel.from_unet does)
    controlnet_config: Optional[UNetConfig] = None
    # Textual-inversion training (Gal et al. 2022): the embedding-table row
    # indices of the placeholder token's vectors — the ONLY trainable rows
    # (ti_rows_2: the second SDXL tower's rows)
    ti_rows: Optional[tuple] = None
    ti_rows_2: Optional[tuple] = None
    # DreamBooth prior preservation (Ruiz et al. 2022): batches are
    # [instance | class] halves; the class half's loss gets this weight
    prior_loss_weight: Optional[float] = None

    @property
    def is_sdxl(self) -> bool:
        return self.text_config_2 is not None


def encode_prompt_train(
    statics: TrainStatics,
    text_params,
    text_params_2,
    input_ids,
    input_ids_2,
):
    """Train-time prompt encoding (no negatives/CFG; SDXL penultimate +
    pooled — ref: train_lora_pipeline.py:139-180)."""
    if not statics.is_sdxl:
        out = clip_model.apply(text_params, statics.text_config, input_ids)
        return out.last_hidden_state, None
    out1 = clip_model.apply(text_params, statics.text_config, input_ids)
    out2 = clip_model.apply(text_params_2, statics.text_config_2, input_ids_2)
    embeds = jnp.concatenate(
        [out1.hidden_states[-2], out2.hidden_states[-2]], axis=-1
    )
    return embeds, out2.projected_pooled


def _resolve_remat(statics: "TrainStatics"):
    policy = statics.remat_policy or (
        "full" if statics.gradient_checkpointing else "none"
    )
    if policy == "none":
        return lambda fn: fn
    if policy == "full":
        return jax.checkpoint
    if policy == "dots":
        return lambda fn: jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    if policy == "offload":
        return lambda fn: jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.offload_dot_with_no_batch_dims(
                "device", "pinned_host"
            ),
        )
    raise ValueError(f"unknown remat_policy {policy!r}")


def _prepare_diffusion(
    frozen: Dict[str, Any],
    batch: Dict[str, jax.Array],
    key: jax.Array,
    statics: TrainStatics,
    scheduler: BaseScheduler,
    te=None,
    te2=None,
):
    """Shared forward-diffusion prep for every training mode: VAE encode,
    noise + random timesteps, text encode, SDXL micro-conditioning.
    `te`/`te2` override the frozen text towers (LoRA-fused for
    --train_text_encoder)."""
    k_sample, k_noise, k_t, k_offset = jax.random.split(key, 4)
    dt = statics.compute_dtype

    # 1. VAE encode (fp32 by default — ref dtype policy
    # train_lora_pipeline.py:238; statics.vae_dtype=bf16 halves the
    # encoder-activation peak).  Optionally micro-batched: encoder
    # activations at 512^2+ dominate the memory peak.  A batch carrying
    # "latents" (already sampled+scaled, from make_encode_fn's separate
    # program or a latent cache) skips the encoder entirely — at SDXL
    # 1024^2 this is what keeps the VAE's fp32 activations from ever
    # coexisting with the UNet backward peak in one XLA program.
    if "latents" in batch:
        latents = batch["latents"].astype(jnp.float32)
    else:
        vdt = statics.vae_dtype
        pixels = batch["pixel_values"].astype(vdt)
        vae_params = frozen["vae"]
        if vdt != jnp.float32:
            vae_params = jax.tree_util.tree_map(
                lambda a: a.astype(vdt), vae_params
            )
        mb = statics.vae_microbatch
        if mb and pixels.shape[0] > mb and pixels.shape[0] % mb == 0:
            chunks = pixels.reshape(
                pixels.shape[0] // mb, mb, *pixels.shape[1:]
            )

            def enc(c):
                return vae_model.encode(vae_params, statics.vae_config, c)

            mean, logvar = jax.lax.map(enc, chunks)
            mean = mean.reshape(pixels.shape[0], *mean.shape[2:])
            logvar = logvar.reshape(pixels.shape[0], *logvar.shape[2:])
        else:
            mean, logvar = vae_model.encode(
                vae_params, statics.vae_config, pixels
            )
        latents = vae_model.sample_latent(mean, logvar, k_sample).astype(
            jnp.float32
        )
        latents = latents * statics.vae_config.scaling_factor

    # 2. noise + random timesteps
    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    if statics.noise_offset:
        # offset noise (ref: train_text_to_image_lora.py:812-816)
        B, _, _, C = latents.shape
        noise = noise + statics.noise_offset * jax.random.normal(
            k_offset, (B, 1, 1, C), jnp.float32
        )
    B = latents.shape[0]
    timesteps = jax.random.randint(
        k_t, (B,), 0, statics.scheduler_config.num_train_timesteps
    )
    noisy = scheduler.add_noise(latents, noise, timesteps)

    # 3. text encode (per step, matching T4's no-caching behavior) —
    # or precomputed "prompt_embeds" (+"pooled_embeds") from the separate
    # encode program (incompatible with --train_text_encoder, which needs
    # the towers inside the grad program)
    if "prompt_embeds" in batch:
        embeds = batch["prompt_embeds"]
        pooled = batch.get("pooled_embeds")
    else:
        embeds, pooled = encode_prompt_train(
            statics,
            te if te is not None else frozen["text_encoder"],
            te2 if te2 is not None else frozen.get("text_encoder_2"),
            batch["input_ids"],
            batch.get("input_ids_2"),
        )

    # 4. SDXL micro-conditioning (ref: train_lora_pipeline.py:432-447)
    added_cond = None
    if statics.is_sdxl:
        time_ids = jnp.concatenate(
            [
                batch["original_sizes"],
                batch["crop_top_lefts"],
                batch["target_sizes"],
            ],
            axis=-1,
        )
        added_cond = {"text_embeds": pooled.astype(dt), "time_ids": time_ids}
    return latents, noise, timesteps, noisy, embeds, added_cond


def make_encode_fn(statics: TrainStatics, mesh=None):
    """Separate jitted VAE+text encode program (the diffusers CLIs'
    --cache_latents split, train_text_to_image_lora_sdxl.py).

    Returns `encode(frozen, batch, key) -> batch'` where batch' replaces
    pixel_values/input_ids with "latents" (sampled + scaled, fp32) and
    "prompt_embeds"/"pooled_embeds", and keeps the micro-conditioning keys.
    Because this runs as its OWN XLA program, the fp32 VAE-encoder
    activations (0.5 G per 1024^2 conv layer per image) and both CLIP
    towers are gone from the gradient program — the difference between
    SDXL 1024^2 LoRA training fitting one 16G chip or not.  Not valid with
    train_text_encoder (the towers must live inside the grad program)."""
    if statics.train_text_encoder:
        raise ValueError("cached encode is incompatible with train_text_encoder")

    def encode(frozen, batch, key):
        vdt = statics.vae_dtype
        pixels = batch["pixel_values"].astype(vdt)
        vae_params = frozen["vae"]
        if vdt != jnp.float32:
            vae_params = jax.tree_util.tree_map(
                lambda a: a.astype(vdt), vae_params
            )
        mean, logvar = vae_model.encode(vae_params, statics.vae_config, pixels)
        latents = vae_model.sample_latent(mean, logvar, key).astype(jnp.float32)
        latents = latents * statics.vae_config.scaling_factor
        embeds, pooled = encode_prompt_train(
            statics,
            frozen["text_encoder"],
            frozen.get("text_encoder_2"),
            batch["input_ids"],
            batch.get("input_ids_2"),
        )
        out = {
            k: v
            for k, v in batch.items()
            if k not in ("pixel_values", "input_ids", "input_ids_2")
        }
        out["latents"] = latents
        out["prompt_embeds"] = embeds
        if pooled is not None:
            out["pooled_embeds"] = pooled
        return out

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        return jax.jit(encode, in_shardings=(repl, None, repl))
    return jax.jit(encode)


def _prediction_loss(
    pred, latents, noise, timesteps, statics: TrainStatics, scheduler
):
    """Target (epsilon | velocity) + MSE with optional Min-SNR weighting."""
    if statics.scheduler_config.prediction_type == "v_prediction":
        target = scheduler.get_velocity(latents, noise, timesteps)
    else:
        target = noise
    per_sample = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    if statics.snr_gamma is not None:
        snr = compute_snr(scheduler.alphas_cumprod, timesteps)
        per_sample = per_sample * min_snr_weight(
            snr, statics.snr_gamma, statics.scheduler_config.prediction_type
        )
    if statics.prior_loss_weight is not None:
        # DreamBooth (Ruiz et al. 2022 eq. 2): instance loss + weighted
        # prior loss over the class half of the batch
        half = per_sample.shape[0] // 2
        return jnp.mean(per_sample[:half]) + (
            statics.prior_loss_weight * jnp.mean(per_sample[half:])
        )
    return jnp.mean(per_sample)


def loss_fn(
    lora,
    frozen: Dict[str, Any],  # unet/vae/text_encoder(_2) base params
    batch: Dict[str, jax.Array],
    key: jax.Array,
    statics: TrainStatics,
    scheduler: BaseScheduler,
):
    """Forward diffusion + prediction loss (T4)."""
    dt = statics.compute_dtype
    te = te2 = None
    if statics.train_text_encoder:
        if "text_encoder" in lora:
            te = apply_lora_for_training(
                frozen["text_encoder"], lora["text_encoder"]
            )
        if frozen.get("text_encoder_2") is not None and "text_encoder_2" in lora:
            te2 = apply_lora_for_training(
                frozen["text_encoder_2"], lora["text_encoder_2"]
            )
    latents, noise, timesteps, noisy, embeds, added_cond = _prepare_diffusion(
        frozen, batch, key, statics, scheduler, te=te, te2=te2
    )

    # 5. UNet predict with LoRA-fused weights
    unet_params = apply_lora_for_training(frozen["unet"], lora["unet"])

    def unet_fwd(p, x, t, ctx, added):
        return unet_model.apply(
            p, statics.unet_config, x, t, ctx, added_cond=added
        )

    # full recompute is the legacy gradient_checkpointing default: the
    # dots-saveable policy keeps every matmul output alive, which measurably
    # INCREASES peak memory at SD widths (same finding as the MM-DiT
    # trainer, sd3_train.py); remat_policy overrides ("offload" checkpoints
    # residuals to pinned host memory)
    unet_fwd = _resolve_remat(statics)(unet_fwd)
    pred = unet_fwd(
        unet_params,
        noisy.astype(dt),
        timesteps,
        embeds.astype(dt),
        added_cond,
    ).astype(jnp.float32)

    return _prediction_loss(pred, latents, noise, timesteps, statics, scheduler)


def full_finetune_loss_fn(
    unet_params,  # trainable: the WHOLE UNet tree (fp32 masters)
    frozen: Dict[str, Any],  # vae / text_encoder(_2); no "unet" needed
    batch: Dict[str, jax.Array],
    key: jax.Array,
    statics: TrainStatics,
    scheduler: BaseScheduler,
):
    """Full-model fine-tuning loss (diffusers train_text_to_image analog;
    beyond-parity — the reference only ships LoRA training).  Same forward
    diffusion as loss_fn but the trainable pytree IS the UNet; text towers
    stay frozen (the upstream script never trains them in full mode).
    Pair with use_8bit_adam: fp32 moments for SD1.5's 0.9G params would be
    another 7G of HBM, the 8-bit blocks cut that to ~1.8G."""
    dt = statics.compute_dtype
    latents, noise, timesteps, noisy, embeds, added_cond = _prepare_diffusion(
        frozen, batch, key, statics, scheduler
    )

    def unet_fwd(p, x, t, ctx, added):
        return unet_model.apply(
            p, statics.unet_config, x, t, ctx, added_cond=added
        )

    unet_fwd = _resolve_remat(statics)(unet_fwd)
    pred = unet_fwd(
        unet_params,
        noisy.astype(dt),
        timesteps,
        embeds.astype(dt),
        added_cond,
    ).astype(jnp.float32)
    return _prediction_loss(pred, latents, noise, timesteps, statics, scheduler)


def controlnet_loss_fn(
    controlnet,  # trainable ControlNet param tree (fp32 masters)
    frozen: Dict[str, Any],  # unet/vae/text_encoder(_2) base params
    batch: Dict[str, jax.Array],  # + conditioning_pixel_values [B,H,W,3] in [0,1]
    key: jax.Array,
    statics: TrainStatics,
    scheduler: BaseScheduler,
):
    """ControlNet training loss (diffusers train_controlnet.py analog —
    beyond-parity: the reference can only convert ControlNets).  The whole
    ControlNet is trainable; UNet / VAE / text towers stay frozen."""
    from stablediffusion_tpu.models import controlnet as controlnet_model

    dt = statics.compute_dtype
    latents, noise, timesteps, noisy, embeds, added_cond = _prepare_diffusion(
        frozen, batch, key, statics, scheduler
    )

    # fp32 master weights, bf16 compute (mirrors the LoRA-factor policy)
    cn = jax.tree_util.tree_map(lambda x: x.astype(dt), controlnet)
    cn_config = statics.controlnet_config or statics.unet_config

    # the conditioning embedder downsamples by a fixed 8x; size the control
    # image to latent_res * 8 (same rule as the inference pipeline — only
    # differs from the pixel resolution when vae_scale_factor != 8)
    cond = batch["conditioning_pixel_values"]
    h8, w8 = noisy.shape[1] * 8, noisy.shape[2] * 8
    if cond.shape[1] != h8 or cond.shape[2] != w8:
        cond = jax.image.resize(
            cond, (cond.shape[0], h8, w8, cond.shape[3]), "bilinear"
        )

    def fwd(cn_p, x, t, ctx, cond, added):
        down_res, mid_res = controlnet_model.apply(
            cn_p, cn_config, x, t, ctx, cond, added_cond=added
        )
        return unet_model.apply(
            frozen["unet"], statics.unet_config, x, t, ctx, added_cond=added,
            down_block_residuals=down_res, mid_block_residual=mid_res,
        )

    if statics.remat_policy:
        fwd = _resolve_remat(statics)(fwd)
    elif statics.gradient_checkpointing:
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    pred = fwd(
        cn,
        noisy.astype(dt),
        timesteps,
        embeds.astype(dt),
        cond.astype(dt),
        added_cond,
    ).astype(jnp.float32)

    return _prediction_loss(pred, latents, noise, timesteps, statics, scheduler)


def ti_loss_fn(
    ti,  # trainable: {"embeddings": [num_vectors, hidden] fp32}
    frozen: Dict[str, Any],  # unet/vae/text_encoder base params
    batch: Dict[str, jax.Array],
    key: jax.Array,
    statics: TrainStatics,
    scheduler: BaseScheduler,
):
    """Textual-inversion training loss (Gal et al. 2022, arXiv 2208.01618;
    diffusers textual_inversion.py analog — beyond-parity, the reference
    only ships LoRA training).  The trainable pytree is the placeholder
    token's embedding rows alone; they are spliced into the frozen text
    tower's table at statics.ti_rows each step (the JAX-native equivalent
    of the upstream trick of optimizing the whole table and restoring every
    non-placeholder row after each step)."""
    dt = statics.compute_dtype

    def splice(base, rows_idx, rows):
        emb = base["text_model"]["embeddings"]
        w = emb["token_embedding"]["weight"]
        w = w.at[jnp.asarray(rows_idx)].set(rows.astype(w.dtype))
        tree = dict(base)
        tm = dict(tree["text_model"])
        e = dict(tm["embeddings"])
        e["token_embedding"] = {"weight": w}
        tm["embeddings"] = e
        tree["text_model"] = tm
        return tree

    te = splice(frozen["text_encoder"], statics.ti_rows, ti["embeddings"])
    te2 = None
    if statics.is_sdxl:
        te2 = splice(
            frozen["text_encoder_2"], statics.ti_rows_2, ti["embeddings_2"]
        )

    latents, noise, timesteps, noisy, embeds, added_cond = _prepare_diffusion(
        frozen, batch, key, statics, scheduler, te=te, te2=te2
    )

    def unet_fwd(p, x, t, ctx, added):
        return unet_model.apply(
            p, statics.unet_config, x, t, ctx, added_cond=added
        )

    unet_fwd = _resolve_remat(statics)(unet_fwd)
    pred = unet_fwd(
        frozen["unet"],
        noisy.astype(dt),
        timesteps,
        embeds.astype(dt),
        added_cond,
    ).astype(jnp.float32)
    return _prediction_loss(pred, latents, noise, timesteps, statics, scheduler)


def make_train_step(
    statics: TrainStatics,
    scheduler: BaseScheduler,
    optimizer: optax.GradientTransformation,
    mesh=None,
    loss=loss_fn,
    donate: bool = False,
    shard_opt_state: bool = False,
    shard_params: bool = False,
):
    """Build the jitted train step.  With a mesh, batch inputs are expected
    sharded over the `data` axis and params/opt-state replicated; XLA inserts
    the gradient all-reduce.  `loss` selects the training mode (LoRA default;
    `controlnet_loss_fn` for ControlNet training — same trainable/opt
    signature, different trainable pytree).

    Memory levers (parallel/zero.py):
      * donate=True — donate the trainable/opt-state input buffers to the
        step so XLA updates them in place instead of holding two copies
        (the trainer loop rebinds, so the invalidated inputs are never
        reused; leave False for ad-hoc callers that re-step from the same
        tree).
      * shard_opt_state=True (ZeRO-1) — optimizer moments live split over
        the data axis; callers place them with zero.shard_tree first.
      * shard_params=True (FSDP) — frozen AND trainable params split over
        the data axis; XLA all-gathers each weight at use."""

    import os
    from contextlib import nullcontext

    if mesh is not None and statics.remat_policy == "offload":
        # XLA's SPMD partitioner RET_CHECKs on the offload policy's
        # annotate_device_placement custom-calls (no sharding attached, this
        # jaxlib) — host-offloaded remat is a single-program feature here
        raise ValueError(
            "remat_policy='offload' cannot be used with a mesh: the SPMD "
            "partitioner rejects host-offload placement annotations; run "
            "single-chip or use remat_policy='full'/'dots'"
        )

    def _flash_all():
        # flash attention everywhere in training: XLA's attention backward
        # keeps the fp32 [B,H,S,S] logits alive (8G at SD1.5 batch 16) while
        # the flash backward recomputes in O(S*D); see
        # ops/attention._lib_flash_supported.  The dispatch reads the mode at
        # TRACE time only, and the contextvar override is thread-local, so a
        # concurrent thread tracing inference (in-process serving, validation
        # renders) never sees the training-only D>=32 floor.  An explicit
        # SDTPU_FLASH_ATTN env var still wins (user override).
        from stablediffusion_tpu.ops.attention import flash_attention_mode

        if os.environ.get("SDTPU_FLASH_ATTN") is not None:
            return nullcontext()
        return flash_attention_mode("all")

    def step(trainable, opt_state, frozen, batch, key):
        loss_val, grads = jax.value_and_grad(loss)(
            trainable, frozen, batch, key, statics, scheduler
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if mesh is not None and shard_opt_state:
            opt_state = zero.constrain_tree(opt_state, mesh)
        if mesh is not None and shard_params:
            trainable = zero.constrain_tree(trainable, mesh)
        grad_norm = optax.global_norm(grads)
        return trainable, opt_state, {"loss": loss_val, "grad_norm": grad_norm}

    donate_kw = {"donate_argnums": (0, 1)} if donate else {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from stablediffusion_tpu.parallel import zero

        repl = NamedSharding(mesh, P())
        # None = respect the argument's own placement (zero.shard_tree puts
        # the split layout on the state; jit then keeps it) — forcing `repl`
        # here would silently all-gather the state back every step
        jitted = jax.jit(
            step,
            in_shardings=(
                None if shard_params else repl,
                None if shard_opt_state else repl,
                None if shard_params else repl,
                None,
                repl,
            ),
            out_shardings=(
                None if shard_params else repl,
                None if shard_opt_state else repl,
                repl,
            ),
            **donate_kw,
        )
    else:
        jitted = jax.jit(step, **donate_kw)

    def step_scoped(*args, **kwargs):
        with _flash_all():
            return jitted(*args, **kwargs)

    # benches lower this for XLA FLOPs / MFU accounting (utils/bench_utils)
    step_scoped._jitted = jitted
    step_scoped._flash_all = _flash_all
    return step_scoped
