"""StableDiffusion3Pipeline — MM-DiT txt2img/img2img/inpaint (beyond-parity family).

Mirrors diffusers' StableDiffusion3Pipeline semantics: triple text encoding
(CLIP-L and CLIP-bigG penultimate hidden states concatenated on the channel
axis, zero-padded to the T5 width, then T5-XXL tokens appended on the
sequence axis; pooled = concat of both CLIP projected pooled embeds), flow-
matching Euler sampling (schedulers/flow_match.py), 16-channel VAE with
shift_factor latent normalization.  The denoise loop compiles to ONE
`lax.scan` like the SD1.5/SDXL pipeline.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.core.config import (
    CLIPTextConfig,
    SD3Config,
    SchedulerConfig,
    VAEConfig,
)
from stablediffusion_tpu.core.rng import as_key, randn
from stablediffusion_tpu.models import mmdit as mmdit_model
from stablediffusion_tpu.models import t5 as t5_model
from stablediffusion_tpu.models import vae as vae_model
from stablediffusion_tpu.pipelines.unified import _clip_encode, SDPipelineOutput
from stablediffusion_tpu.schedulers import make_scheduler
from stablediffusion_tpu.schedulers.common import BaseScheduler, Plan
from stablediffusion_tpu.utils import images as img_utils


@dataclass
class SD3Model:
    """Model holder for the SD3 family (wrapper-layer analog of SDModel)."""

    transformer_config: SD3Config
    transformer_params: Any
    vae_config: VAEConfig
    vae_params: Any
    # CLIP-L (with projection in SD3 layouts)
    text_encoder_config: CLIPTextConfig
    text_encoder_params: Any
    tokenizer: Any
    # CLIP-bigG
    text_encoder_2_config: CLIPTextConfig
    text_encoder_2_params: Any
    tokenizer_2: Any
    # T5-XXL (optional: SD3 supports dropping T5 at inference)
    text_encoder_3_config: Optional[t5_model.T5Config] = None
    text_encoder_3_params: Optional[Any] = None
    tokenizer_3: Any = None
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    scheduler_name: str = "FlowMatchEuler"
    path: Optional[str] = None
    model_type: str = "sd3"
    adapters: dict = field(default_factory=dict)

    _scheduler: Optional[BaseScheduler] = field(default=None, repr=False)
    _base_params: Optional[dict] = field(default=None, repr=False)
    _adapter_store: Optional[dict] = field(default=None, repr=False)
    # int8 quantization mode for the MMDiT ("w8" | "w8a8" | None); survives
    # adapter swaps, same contract as SDModel.quant_mode
    quant_mode: Optional[str] = None
    quant_min_size: int = 65536
    # True when loaded from an int8-on-disk checkpoint (no fp base exists;
    # re-quantization / LoRA fusion raise) — see SDModel.quant_frozen
    quant_frozen: bool = False

    @property
    def scheduler(self) -> BaseScheduler:
        if self._scheduler is None:
            self._scheduler = make_scheduler(
                self.scheduler_name, self.scheduler_config
            )
        return self._scheduler

    def set_scheduler(self, name: str) -> None:
        """Idempotent scheduler switch (SDModel.set_scheduler analog)."""
        if name == self.scheduler_name and self._scheduler is not None:
            return
        self._scheduler = make_scheduler(name, self.scheduler_config)
        self.scheduler_name = name

    @property
    def vae_scale_factor(self) -> int:
        return self.vae_config.vae_scale_factor

    @property
    def joint_dim(self) -> int:
        return self.transformer_config.joint_attention_dim

    # -- LoRA adapter management (SDModel analog; components here are the
    # MM-DiT "transformer" plus the two CLIP towers — T5 is never LoRA'd,
    # matching diffusers SD3LoraLoaderMixin) -------------------------------

    def _ensure_base(self):
        if self._base_params is None:
            self._base_params = {
                "transformer": self.transformer_params,
                "text_encoder": self.text_encoder_params,
                "text_encoder_2": self.text_encoder_2_params,
            }
        if self._adapter_store is None:
            self._adapter_store = {}

    def _check_not_frozen(self, op: str) -> None:
        if self.quant_frozen:
            raise ValueError(
                f"{op} requires fp weights, but this model was loaded from "
                "an int8-quantized checkpoint (no fp base on disk); load "
                "the original fp checkpoint instead")

    def load_lora_weights(self, name: str, adapter: dict):
        self._check_not_frozen("LoRA fusion")
        self._ensure_base()
        self._adapter_store[name] = adapter

    def set_adapters(self, weights: dict):
        """Re-fuse the named adapters from pristine base params (no drift)."""
        from stablediffusion_tpu.lora.core import fuse

        self._check_not_frozen("LoRA fusion")
        self._ensure_base()
        unknown = [n for n in weights if n not in self._adapter_store]
        if unknown:
            raise ValueError(
                f"unknown adapters {unknown}; loaded: "
                f"{sorted(self._adapter_store)}"
            )
        for component, attr in (
            ("transformer", "transformer_params"),
            ("text_encoder", "text_encoder_params"),
            ("text_encoder_2", "text_encoder_2_params"),
        ):
            base = self._base_params[component]
            if base is None:
                continue
            comp_adapters = {
                n: self._adapter_store[n][component]
                for n in weights
                if component in self._adapter_store[n]
            }
            fused = fuse(base, comp_adapters, weights) if comp_adapters else base
            if component == "transformer":
                fused = self._maybe_quantize(fused)
            setattr(self, attr, fused)
        self.adapters = dict(weights)

    def delete_adapters(self):
        if self._base_params is not None:
            self.transformer_params = self._maybe_quantize(
                self._base_params["transformer"])
            self.text_encoder_params = self._base_params["text_encoder"]
            self.text_encoder_2_params = self._base_params["text_encoder_2"]
        self._adapter_store = {}
        self.adapters = {}

    # -- int8 quantization (ops/quant.py; same lifecycle as SDModel) --------
    # MMDiT-specific skip list: the AdaLN modulation linears live under
    # norm* keys (caught by "norm"), the conditioning embedders and the
    # patch/pos projections are input boundaries, proj_out is the output
    # boundary.  NOTE: unlike the UNet, "proj_out" here is ONLY the final
    # pixel head (the attention blocks use to_out/to_add_out), so skipping
    # it does not touch the hot path.
    _QUANT_SKIP = ("norm", "embedder", "pos_embed", "proj_out")

    def quantize(self, mode: Optional[str] = "w8a8",
                 min_size: Optional[int] = None,
                 expected_batch: int = 1) -> None:
        """Opt-in int8 MMDiT quantization ("auto" | "w8a8" | "w8" |
        "w8a8:N" mixed | None to revert); see SDModel.quantize /
        ops/quant.py for semantics ("auto" resolves against
        `expected_batch` and quant_mode stores the concrete string)."""
        from stablediffusion_tpu.ops.quant import (
            resolve_quant_mode,
            validate_quant_mode,
        )

        self._check_not_frozen("quantize()")
        validate_quant_mode(mode)  # before any state mutation
        mode = resolve_quant_mode(mode, expected_batch)
        self._ensure_base()
        self.quant_mode = mode
        if min_size is not None:
            self.quant_min_size = int(min_size)
        if self.adapters:
            self.set_adapters(dict(self.adapters))
        else:
            self.transformer_params = self._maybe_quantize(
                self._base_params["transformer"])

    def _maybe_quantize(self, tree):
        if self.quant_mode is None:
            return tree
        from stablediffusion_tpu.ops.quant import quantize_params

        return quantize_params(tree, self.quant_mode,
                               min_size=self.quant_min_size,
                               skip_keys=self._QUANT_SKIP)

    def get_list_adapters(self) -> dict:
        return dict(self.adapters)

    def lora_module_paths(self) -> dict:
        from stablediffusion_tpu.lora.core import linear_module_paths

        any_suffix = ("",)
        return {
            "transformer": linear_module_paths(
                self.transformer_params, any_suffix
            ),
            "text_encoder": linear_module_paths(
                self.text_encoder_params, any_suffix
            ),
            "text_encoder_2": linear_module_paths(
                self.text_encoder_2_params, any_suffix
            ),
        }

    def load_loras(self, loras, lora_dir: Optional[str] = None):
        """str / list / {name: weight} -> load + fuse; files resolve as
        {lora_dir}/sd3_{name}.safetensors (SDModel.load_loras analog)."""
        import os

        from stablediffusion_tpu.lora.formats import load_lora_file

        # fail with the real reason before touching the filesystem (see
        # SDModel.load_loras)
        self._check_not_frozen("LoRA fusion")

        if isinstance(loras, str):
            loras = {loras: 1.0}
        elif isinstance(loras, (list, tuple)):
            loras = {n: 1.0 for n in loras}
        self.delete_adapters()
        self._ensure_base()
        model_paths = None
        for name in loras:
            if name not in self._adapter_store:
                fname = f"{self.model_type}_{name}.safetensors"
                path = os.path.join(lora_dir or ".", fname)
                if model_paths is None:
                    model_paths = self.lora_module_paths()
                self.load_lora_weights(name, load_lora_file(path, model_paths))
        self.set_adapters(dict(loras))


@functools.partial(jax.jit, static_argnames=("config",))
def _t5_encode(params, ids, *, config):
    return t5_model.apply(params, config, ids)


@functools.partial(
    jax.jit, static_argnames=("config", "scheduler", "do_cfg")
)
def _denoise_sd3(
    params,
    latents,
    embeds,  # [2B or B, S, joint_dim]
    pooled,  # [2B or B, pooled_dim]
    plan: Plan,
    guidance_scale,
    mask=None,  # None | [B, h, w, 1] — inpaint blend (1 = region to repaint)
    image_latents=None,  # None | [B, h, w, C] original-image latents
    noise=None,  # None | [B, h, w, C] the initial noise, re-applied per step
    *,
    config: SD3Config,
    scheduler: BaseScheduler,
    do_cfg: bool,
):
    """One lax.scan over the flow-matching denoise.  With a mask, each step
    blends the kept region back to the original latents re-noised to the
    NEXT step's sigma (diffusers StableDiffusion3InpaintPipeline semantics —
    the MM-DiT has no 9-channel inpaint variant, so blend is the whole
    mechanism; same rule as the unified pipeline's blend4 mode)."""
    N = plan.num_steps
    state0 = scheduler.init_state(plan, latents.shape, latents.dtype)

    def _embeds_at(i):
        # prompt editing/alternation: (stack of UNIQUE variants [U, 2B|B, S,
        # D], interval starts [K] — already shifted to local step units —
        # and interval->unique map [K])
        if isinstance(embeds, tuple):
            stack, starts, idx_map = embeds
            interval = jnp.sum(i >= starts) - 1
            v = jax.lax.dynamic_index_in_dim(idx_map, interval, 0,
                                             keepdims=False)
            return jax.lax.dynamic_index_in_dim(stack, v, 0, keepdims=False)
        return embeds

    def body(carry, i):
        lat, state = carry
        x = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
        t = plan.timesteps[i]
        pred = mmdit_model.apply(params, config, x, t, _embeds_at(i), pooled)
        if do_cfg:
            uncond, text = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance_scale * (text - uncond)
        lat, state = scheduler.step(plan, state, i, pred, lat)
        if mask is not None:
            init_prop = jnp.where(
                i < N - 1,
                scheduler.add_noise_index(
                    plan, image_latents, noise, jnp.clip(i + 1, 0, N - 1)
                ),
                image_latents,
            )
            m = mask.astype(lat.dtype)
            lat = (1.0 - m) * init_prop.astype(lat.dtype) + m * lat
        return (lat, state), ()

    (final, _), _ = jax.lax.scan(body, (latents, state0), jnp.arange(N))
    return final


@functools.partial(jax.jit, static_argnames=("config",))
def _sd3_vae_decode(params, latents, *, config: VAEConfig):
    z = latents.astype(jnp.float32) / config.scaling_factor
    if config.shift_factor:
        z = z + config.shift_factor
    return vae_model.decode(params, config, z)


@functools.partial(jax.jit, static_argnames=("config", "sample"))
def _sd3_vae_encode(params, image, key, *, config: VAEConfig, sample=True):
    mean, logvar = vae_model.encode(params, config, image.astype(jnp.float32))
    return _sd3_normalize_latent(mean, logvar, key, config, sample)


def _sd3_normalize_latent(mean, logvar, key, config: VAEConfig, sample):
    z = vae_model.sample_latent(mean, logvar, key) if sample else mean
    if config.shift_factor:
        z = z - config.shift_factor
    return z * config.scaling_factor


def _sd3_vae_encode_any(params, image, key, *, config: VAEConfig,
                        sample=True, tiling=False):
    """`_sd3_vae_encode`, optionally through models/vae.tiled_encode so a
    2048²+ init image never compiles the full fp32 encoder (65536-token
    mid-block attention) as one program."""
    if not tiling:
        return _sd3_vae_encode(params, image, key, config=config,
                               sample=sample)
    mean, logvar = vae_model.tiled_encode(
        params, config, image.astype(jnp.float32)
    )
    return _sd3_normalize_latent(mean, logvar, key, config, sample)


class StableDiffusion3Pipeline:
    def __init__(
        self,
        do_cfg: bool = True,
        output_type: str = "np",
        dtype=None,
        mesh=None,  # optional jax.sharding.Mesh: shard the batch over `data`
    ):
        self.do_cfg = do_cfg
        self.output_type = output_type
        self.mesh = mesh
        if dtype is None:
            platform = jax.devices()[0].platform
            dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
        self.dtype = dtype

    def _shard(self, x):
        """Batch-sharded placement over the mesh's `data` axis (multi-chip
        throughput serving, same pattern as the unified pipeline)."""
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        if x.shape[0] % self.mesh.shape["data"] != 0:
            return x
        return jax.device_put(
            x, NamedSharding(self.mesh, P("data", *([None] * (x.ndim - 1))))
        )

    # -- prompt encoding (StableDiffusion3Pipeline.encode_prompt) -----------
    def encode_prompt(
        self,
        model: SD3Model,
        prompt: Union[str, List[str]],
        prompt_2=None,
        prompt_3=None,
        negative_prompt=None,
        negative_prompt_2=None,
        negative_prompt_3=None,
        num_images_per_prompt: int = 1,
        do_cfg: bool = True,
        max_sequence_length: int = 256,
        clip_skip: Optional[int] = None,
        prompt_weighting: bool = False,
    ):
        prompt = [prompt] if isinstance(prompt, str) else list(prompt)
        B = len(prompt)

        def listify(p, fallback):
            p = p if p is not None else fallback
            p = [p] if isinstance(p, str) else list(p)
            if len(p) == 1 and B > 1:
                p = p * B
            return p

        def clip_embed(texts, tok, cfg, par):
            token_weights = None
            if prompt_weighting:
                from stablediffusion_tpu.utils import prompt_weights as pw

                ids_np, w_np = pw.encode_with_weights(tok, texts)
                ids = jnp.asarray(ids_np)
                if (w_np != 1.0).any():
                    token_weights = w_np
            else:
                ids = jnp.asarray(tok(texts))
            h, pooled = _clip_encode(
                par, ids, config=cfg, mode="penultimate",
                clip_skip=clip_skip or 0,
            )
            if token_weights is not None:
                from stablediffusion_tpu.utils import prompt_weights as pw

                h = pw.apply_token_weights(h, token_weights)
            return h, pooled

        def encode_all(p1, p2, p3):
            h1, pool1 = clip_embed(
                p1, model.tokenizer, model.text_encoder_config,
                model.text_encoder_params,
            )
            h2, pool2 = clip_embed(
                p2, model.tokenizer_2, model.text_encoder_2_config,
                model.text_encoder_2_params,
            )
            clip_h = jnp.concatenate([h1, h2], axis=-1)
            clip_h = jnp.pad(
                clip_h, ((0, 0), (0, 0), (0, model.joint_dim - clip_h.shape[-1]))
            )
            if model.text_encoder_3_params is not None:
                if prompt_weighting:
                    from stablediffusion_tpu.utils.prompt_weights import (
                        strip_weight_markup,
                    )

                    # T5 gets no token weighting; feed it clean text
                    p3 = [strip_weight_markup(t) for t in p3]
                ids3 = jnp.asarray(
                    model.tokenizer_3(p3, max_length=max_sequence_length)
                )
                t5_h = _t5_encode(
                    model.text_encoder_3_params, ids3,
                    config=model.text_encoder_3_config,
                )
            else:
                # T5 dropped: zeros, as diffusers does
                t5_h = jnp.zeros(
                    (len(p1), max_sequence_length, model.joint_dim), clip_h.dtype
                )
            embeds = jnp.concatenate([clip_h, t5_h.astype(clip_h.dtype)], axis=1)
            pooled = jnp.concatenate([pool1, pool2], axis=-1)
            return embeds, pooled

        embeds, pooled = encode_all(
            prompt, listify(prompt_2, prompt), listify(prompt_3, prompt)
        )
        neg_embeds = neg_pooled = None
        if do_cfg:
            neg = listify(negative_prompt, "")
            neg_embeds, neg_pooled = encode_all(
                neg,
                listify(negative_prompt_2, neg),
                listify(negative_prompt_3, neg),
            )
        n = num_images_per_prompt
        tile = lambda x: jnp.repeat(x, n, axis=0) if x is not None else None
        return tile(embeds), tile(neg_embeds), tile(pooled), tile(neg_pooled)

    # -- main entry ----------------------------------------------------------
    def __call__(
        self,
        model: SD3Model,
        prompt: Union[str, List[str]] = None,
        prompt_2=None,
        prompt_3=None,
        negative_prompt=None,
        negative_prompt_2=None,
        negative_prompt_3=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 7.0,
        num_images_per_prompt: int = 1,
        seed: Optional[int] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        clip_skip: Optional[int] = None,
        output_type: Optional[str] = None,
        # img2img
        image=None,
        strength: float = 0.6,
        # inpaint (diffusers StableDiffusion3InpaintPipeline analog:
        # latent blend — MM-DiT has no 9-channel inpaint variant)
        mask_image=None,
        timesteps=None,
        sigmas=None,
        # bounded-memory tiled VAE decode for 1536²+ outputs
        # (models/vae.tiled_decode; same knob as the unified pipeline)
        vae_tiling: bool = False,
        # A1111 emphasis syntax on the CLIP towers; T5 sees stripped text
        prompt_weighting: bool = False,
    ) -> SDPipelineOutput:
        scheduler = model.scheduler
        vf = model.vae_scale_factor
        height = height or model.transformer_config.sample_size * vf
        width = width or model.transformer_config.sample_size * vf
        B = 1 if isinstance(prompt, str) else len(prompt)
        n = num_images_per_prompt
        do_cfg = self.do_cfg and guidance_scale > 1.0

        # per-sample seed LISTS (diffusers generator-list parity; same
        # semantics as the unified pipeline): sample i's noise depends only
        # on seed i, regardless of batch composition
        seed_list = None
        if isinstance(seed, (list, tuple)):
            seed_list = [int(x) for x in seed]
            if len(seed_list) != B * n:
                raise ValueError(
                    f"seed list length {len(seed_list)} != batch size {B * n}"
                )
            key = as_key(seed_list[0])
            seed = list(seed_list)
        else:
            if seed is None:
                seed = int(np.random.randint(0, 2**31 - 1))
            key = as_key(seed)
        sample_keys = (
            jax.vmap(jax.random.key)(jnp.asarray(seed_list, jnp.uint32))
            if seed_list is not None
            else None
        )

        def _psk(tag):
            if sample_keys is None:
                return None
            return jax.vmap(lambda kk: jax.random.fold_in(kk, tag))(sample_keys)

        k_latent, k_encode = jax.random.split(key)

        # A1111 prompt editing/alternation (opt-in with prompt_weighting;
        # SD3 embeds are fixed-length CLIP77+T5 concats, so variants stack
        # without a chunk floor).  pooled stays at variant 0.
        edit_starts = None
        edit_variants = None
        enc_prompt = prompt
        if prompt_weighting and prompt is not None:
            from stablediffusion_tpu.utils import prompt_edit as pe

            texts = [prompt] if isinstance(prompt, str) else list(prompt)
            merged = pe.schedule_prompts(texts, num_inference_steps)
            if merged is not None and len(merged[0]) > 1:
                edit_starts, edit_variants = merged
                edit_uniq, edit_idx_map = pe.unique_variants(edit_variants)
                enc_prompt = edit_uniq[0]
            elif merged is not None:
                enc_prompt = merged[1][0]

        embeds, neg_embeds, pooled, neg_pooled = self.encode_prompt(
            model, enc_prompt, prompt_2, prompt_3,
            negative_prompt, negative_prompt_2, negative_prompt_3,
            num_images_per_prompt=n, do_cfg=do_cfg,
            max_sequence_length=max_sequence_length, clip_skip=clip_skip,
            prompt_weighting=prompt_weighting,
        )
        edit_extra = []
        if edit_variants is not None:
            edit_extra = [
                self.encode_prompt(
                    model, v, prompt_2, prompt_3, None, None, None,
                    num_images_per_prompt=n, do_cfg=False,
                    max_sequence_length=max_sequence_length,
                    clip_skip=clip_skip, prompt_weighting=True,
                )[0]
                for v in edit_uniq[1:]
            ]
        if do_cfg:
            embeds = jnp.concatenate([neg_embeds, embeds], axis=0)
            pooled = jnp.concatenate([neg_pooled, pooled], axis=0)
        embeds = embeds.astype(self.dtype)
        if edit_extra:
            full = [embeds]
            for e in edit_extra:
                e = e.astype(self.dtype)
                if do_cfg:
                    full.append(jnp.concatenate(
                        [neg_embeds.astype(self.dtype), e], axis=0))
                else:
                    full.append(e)
            # starts shift by the img2img head-slice below (t_start);
            # the triple is finalized at the _denoise_sd3 call
            embeds = (jnp.stack(full), jnp.asarray(edit_starts, jnp.int32),
                      jnp.asarray(edit_idx_map, jnp.int32))
        pooled = pooled.astype(self.dtype)

        lat_c = model.vae_config.latent_channels
        mask_lat = inpaint_image_lat = inpaint_noise = None
        if mask_image is not None:
            if image is None:
                raise ValueError("inpaint needs both image and mask_image")
        if image is None:
            plan = scheduler.plan(num_inference_steps, timesteps=timesteps,
                                  sigmas=sigmas)
            shape = (B * n, height // vf, width // vf, lat_c)
            if latents is None:
                latents = randn(
                    k_latent, shape, jnp.float32, per_sample_keys=_psk(0)
                )
                # diffusers' StableDiffusion3Pipeline never scales the
                # initial latents (flow matching starts from pure noise);
                # with the default grid the first shifted sigma is 1.0 so a
                # multiply would be a no-op, but user-supplied sigmas /
                # timesteps with sigma[0] < 1 must NOT rescale the start.
        else:
            plan = scheduler.plan(num_inference_steps, timesteps=timesteps,
                                  sigmas=sigmas)
            t_start = min(
                max(int(plan.num_steps * (1.0 - strength)), 0),
                plan.num_steps - 1,
            )
            if isinstance(embeds, tuple):
                # edit boundaries are in FULL-schedule steps; the scan index
                # is local to the strength-sliced plan
                embeds = (embeds[0], embeds[1] - jnp.int32(t_start),
                          embeds[2])
            from stablediffusion_tpu.pipelines.unified import (
                StableDiffusionUnifiedPipeline as _U,
            )

            plan = _U._slice_plan(plan, t_start)
            img = jnp.asarray(img_utils.preprocess_image(image, height, width))
            init_lat = _sd3_vae_encode_any(
                model.vae_params, img, k_encode, config=model.vae_config,
                tiling=vae_tiling,
            )
            init_lat = jnp.tile(init_lat, (B * n // init_lat.shape[0], 1, 1, 1))
            noise = randn(
                k_latent, init_lat.shape, jnp.float32, per_sample_keys=_psk(0)
            )
            latents = scheduler.add_noise_index(
                plan, init_lat.astype(jnp.float32), noise, 0
            )
            if mask_image is not None:
                mask_small = img_utils.preprocess_mask(
                    mask_image, height // vf, width // vf
                )
                mask_lat = jnp.tile(jnp.asarray(mask_small), (B * n, 1, 1, 1))
                inpaint_image_lat = init_lat.astype(jnp.float32)
                inpaint_noise = noise

        latents = _denoise_sd3(
            model.transformer_params,
            self._shard(latents.astype(self.dtype)),
            embeds if isinstance(embeds, tuple) else self._shard(embeds),
            self._shard(pooled),
            plan,
            jnp.asarray(guidance_scale, jnp.float32),
            self._shard(mask_lat) if mask_lat is not None else None,
            self._shard(inpaint_image_lat)
            if inpaint_image_lat is not None
            else None,
            self._shard(inpaint_noise) if inpaint_noise is not None else None,
            config=model.transformer_config,
            scheduler=scheduler,
            do_cfg=do_cfg,
        )

        output_type = output_type or self.output_type
        if output_type == "latents":
            return SDPipelineOutput(images=None, latents=latents, seed=seed)
        if vae_tiling:
            z = latents.astype(jnp.float32) / model.vae_config.scaling_factor
            if model.vae_config.shift_factor:
                z = z + model.vae_config.shift_factor
            images = vae_model.tiled_decode(model.vae_params,
                                            model.vae_config, z)
        else:
            images = _sd3_vae_decode(
                model.vae_params, latents, config=model.vae_config
            )
        if output_type in ("uint8", "uint8_device"):
            # device-side quantize: 4x smaller device->host tunnel fetch.
            # "uint8_device" skips the fetch entirely (async device array;
            # the serving batcher fetches on its postprocess thread).
            dev = img_utils.postprocess_uint8_device(images)
            if output_type == "uint8_device":
                return SDPipelineOutput(images=dev, latents=None, seed=seed)
            return SDPipelineOutput(
                images=np.asarray(dev),
                latents=None,
                seed=seed,
            )
        images_np = img_utils.postprocess_image(np.asarray(images, np.float32))
        return SDPipelineOutput(images=images_np, latents=None, seed=seed)
