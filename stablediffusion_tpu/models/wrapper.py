"""SDModel — the model-management layer (SDModelWrapper analog, L3).

The reference's SDModelWrapper (models/stable_diffusion.py:40-335) holds
vae / unet / text encoder(s) / tokenizer(s) / scheduler, distinguishes sd15
vs sdxl by the presence of a second text encoder, switches schedulers by name
over a shared config, and manages LoRA adapters.  Here it is a mutable holder
of (config, params) pairs; checkpoint loading lives in io/loader.py and LoRA
management in lora/.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax

from stablediffusion_tpu.core.config import (
    CLIPTextConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from stablediffusion_tpu.schedulers import BaseScheduler, make_scheduler


@dataclass
class SDModel:
    model_type: str  # "sd15" | "sdxl"
    unet_config: UNetConfig
    unet_params: Any
    vae_config: VAEConfig
    vae_params: Any
    text_encoder_config: CLIPTextConfig
    text_encoder_params: Any
    tokenizer: Any
    # SDXL second tower (presence == sdxl, mirroring the reference's
    # attribute-deletion dispatch at models/stable_diffusion.py:60-76)
    text_encoder_2_config: Optional[CLIPTextConfig] = None
    text_encoder_2_params: Optional[Any] = None
    tokenizer_2: Optional[Any] = None
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    scheduler_name: str = "DDIM"
    refiner_config: Optional[UNetConfig] = None
    refiner_params: Optional[Any] = None
    controlnet_config: Optional[UNetConfig] = None
    controlnet_params: Optional[Any] = None
    # IP-Adapter (beyond-parity; diffusers load_ip_adapter analog)
    ip_adapter: Optional[Any] = None  # models/ip_adapter.IPAdapter
    ip_scale: float = 1.0
    image_encoder_config: Optional[Any] = None  # CLIPVisionConfig
    image_encoder_params: Optional[Any] = None
    # LoRA bookkeeping (adapter name -> weight); see lora/
    adapters: Dict[str, float] = field(default_factory=dict)
    path: Optional[str] = None

    _scheduler: Optional[BaseScheduler] = field(default=None, repr=False)

    @property
    def is_sdxl(self) -> bool:
        return self.text_encoder_2_params is not None

    @property
    def vae_scale_factor(self) -> int:
        return self.vae_config.vae_scale_factor

    @property
    def scheduler(self) -> BaseScheduler:
        if self._scheduler is None:
            self._scheduler = make_scheduler(
                self.scheduler_name, self.scheduler_config
            )
        return self._scheduler

    def set_scheduler(self, name: str) -> None:
        """Idempotent name switch over the shared config
        (ref: models/stable_diffusion.py:199-227)."""
        if name == self.scheduler_name and self._scheduler is not None:
            return
        self._scheduler = make_scheduler(name, self.scheduler_config)
        self.scheduler_name = name

    def get_list_adapters(self) -> Dict[str, float]:
        return dict(self.adapters)

    def reload(self) -> "SDModel":
        """Hot reload from the checkpoint path, dropping adapters and any
        fused weights (reload analog, models/stable_diffusion.py:174-185).
        JAX device placement is managed by jit, so there is no `to(device)`;
        reload is the one mutation that re-reads from disk."""
        if not self.path:
            raise ValueError("model has no checkpoint path to reload from")
        import os

        from stablediffusion_tpu.io.loader import (
            load_sd_model,
            load_sd_single_file,
        )

        if os.path.isfile(self.path):  # A1111 single-file origin
            fresh = load_sd_single_file(
                self.path, scheduler_name=self.scheduler_name,
                prediction_type=self.scheduler_config.prediction_type,
            )
            # single files carry no tokenizer; keep the ones we have
            fresh.tokenizer = self.tokenizer
            fresh.tokenizer_2 = self.tokenizer_2
        else:
            fresh = load_sd_model(
                self.path, model_type=self.model_type,
                scheduler_name=self.scheduler_name,
            )
        self.__dict__.update(fresh.__dict__)
        return self

    def load_controlnet(self, path: str) -> None:
        """Load a diffusers-layout ControlNet folder (the runtime companion
        to the converter's K6 support — the reference can only convert)."""
        import os

        from stablediffusion_tpu.core.config import UNetConfig
        from stablediffusion_tpu.io.loader import _read_json, load_component_state

        cfg_path = os.path.join(path, "config.json")
        if not os.path.exists(cfg_path):
            cfg_path = os.path.join(path, "controlnet", "config.json")
            path = os.path.join(path, "controlnet")
        self.controlnet_config = UNetConfig.from_diffusers_dict(_read_json(cfg_path))
        self.controlnet_params = load_component_state(path)

    def load_refiner(self, path: Optional[str] = None) -> None:
        """Lazily load a refiner UNet (ref: models/stable_diffusion.py:159-171
        loads stabilityai/stable-diffusion-xl-refiner-1.0).  `path` is a
        diffusers-layout folder; only the unet subfolder is read."""
        if self.refiner_params is not None:
            return
        import os

        from stablediffusion_tpu.core.config import UNetConfig
        from stablediffusion_tpu.io.loader import (
            load_component_state,
            resolve_checkpoint,
            _read_json,
        )

        if path is None:
            path = resolve_checkpoint(self.model_type, "refiner")
        self.refiner_config = UNetConfig.from_diffusers_dict(
            _read_json(os.path.join(path, "unet", "config.json"))
        )
        self.refiner_params = load_component_state(os.path.join(path, "unet"))

    # -- IP-Adapter management (diffusers load_ip_adapter analog) ----------

    def load_ip_adapter(self, path: str, image_encoder_path: Optional[str] = None):
        """Load an IP-Adapter checkpoint (h94/IP-Adapter family: .safetensors
        or .bin with image_proj + ip_adapter groups) and fuse its decoupled
        cross-attention projections into the UNet param tree.  Also fused into
        the pristine LoRA base so adapter swaps don't drop the IP weights."""
        from stablediffusion_tpu.models.ip_adapter import IPAdapter, fuse_ip_weights

        adapter, ip_sd = IPAdapter.load(path)
        self.ip_adapter = adapter
        self._ensure_base()
        self._base_params["unet"] = fuse_ip_weights(
            self._base_params["unet"], self.unet_config, ip_sd
        )
        # refuse currently-fused adapters over the IP-augmented base
        if self.adapters:
            self.set_adapters(dict(self.adapters))
        else:
            self.unet_params = self._maybe_quantize(self._base_params["unet"])
        if image_encoder_path is not None:
            self.load_image_encoder(image_encoder_path)

    def set_ip_adapter_scale(self, scale: float):
        self.ip_scale = float(scale)

    def unload_ip_adapter(self):
        from stablediffusion_tpu.models.ip_adapter import strip_ip_weights

        if self._base_params is not None and self._base_params["unet"] is not None:
            self._base_params["unet"] = strip_ip_weights(self._base_params["unet"])
            if self.adapters:
                self.set_adapters(dict(self.adapters))
            else:
                self.unet_params = self._maybe_quantize(
                    self._base_params["unet"])
        else:
            self.unet_params = strip_ip_weights(self.unet_params)
        self.ip_adapter = None

    # -- textual inversion (beyond-parity; diffusers load_textual_inversion
    # analog — the reference has no TI support at all) ----------------------
    _ti_state: Optional[Dict[str, Any]] = None  # orig table rows + triggers

    def load_textual_inversion(self, source, token: Optional[str] = None,
                               allow_pickle: bool = False) -> str:
        """Load a learned-embedding file and register its trigger word.

        Accepted formats (all ecosystem-standard):
          - diffusers learned_embeds:       {"<token>": [n, hidden]}
          - A1111 .pt:                      {"string_to_param": {"*": ...},
                                             "name": str}
          - community safetensors:          {"emb_params": [n, hidden]}
          - SDXL dual-tower:                {"clip_l": [n, h1],
                                             "clip_g": [n, h2]}

        New rows are appended to the token-embedding table(s) of BOTH the
        live params and the pristine LoRA base (so adapter re-fusion keeps
        the concept), and the trigger maps to the new ids in the
        tokenizer(s).  Returns the trigger string.
        """
        import os

        import jax.numpy as jnp
        import numpy as np

        if isinstance(source, str):
            name_hint = os.path.splitext(os.path.basename(source))[0]
            if source.endswith(".safetensors"):
                from stablediffusion_tpu.io.safetensors_io import (
                    load_safetensors,
                )

                state = {
                    k: np.asarray(v)
                    for k, v in load_safetensors(source).items()
                }
            else:
                import torch

                # A1111 .pt embeddings are pickles.  weights_only=True keeps
                # deserialization to tensors/containers; full pickle (which
                # executes arbitrary code) requires an explicit opt-in because
                # serving exposes this path to request-named files on disk.
                try:
                    raw = torch.load(source, map_location="cpu",
                                     weights_only=True)
                except Exception:
                    if not allow_pickle:
                        raise ValueError(
                            f"{source!r} is not loadable with "
                            "weights_only=True; pass allow_pickle=True only "
                            "for embedding files you trust (full pickle "
                            "deserialization can execute arbitrary code)")
                    raw = torch.load(source, map_location="cpu",
                                     weights_only=False)
                state = raw
        else:
            state, name_hint = dict(source), None

        def to_np(v):
            if hasattr(v, "detach"):  # torch tensor (possibly requires_grad)
                v = v.detach().cpu().numpy()
            arr = np.asarray(v)
            return arr.reshape(1, -1) if arr.ndim == 1 else arr

        per_tower: Dict[str, np.ndarray] = {}
        if "string_to_param" in state:  # A1111 .pt
            vec = to_np(next(iter(state["string_to_param"].values())))
            token = token or state.get("name") or name_hint
            per_tower["text_encoder"] = vec
        elif "emb_params" in state:
            per_tower["text_encoder"] = to_np(state["emb_params"])
        elif "clip_l" in state or "clip_g" in state:  # SDXL
            if not self.is_sdxl:
                raise ValueError("clip_l/clip_g embedding needs an SDXL model")
            if "clip_l" not in state or "clip_g" not in state:
                raise ValueError("SDXL textual inversion needs BOTH clip_l "
                                 "and clip_g")
            per_tower["text_encoder"] = to_np(state["clip_l"])
            per_tower["text_encoder_2"] = to_np(state["clip_g"])
        else:  # diffusers: single {token: tensor}
            tensors = {k: v for k, v in state.items()
                       if not isinstance(v, (str, int, float))}
            if len(tensors) != 1:
                raise ValueError(f"unrecognized embedding format: "
                                 f"{sorted(state)}")
            tok_key, vec = next(iter(tensors.items()))
            token = token or tok_key
            per_tower["text_encoder"] = to_np(vec)
        if self.is_sdxl and "text_encoder_2" not in per_tower:
            raise ValueError("this embedding has no clip_g vectors; an SDXL "
                             "model needs the dual-tower format")
        if not token:
            token = name_hint
        if not token:
            raise ValueError("no trigger token given and none in the file")

        towers = {
            "text_encoder": (self.tokenizer, "text_encoder_params"),
            "text_encoder_2": (self.tokenizer_2, "text_encoder_2_params"),
        }
        for comp in per_tower:
            if towers[comp][0] is None:
                raise ValueError(
                    "textual inversion needs a tokenizer to register its "
                    f"trigger, but {comp}'s tokenizer is None (single-file "
                    "load without tokenizer_dir?)"
                )

        self._ensure_base()
        if self._ti_state is None:
            self._ti_state = {"orig_rows": {}, "tokens": {}}
        for comp, vec in per_tower.items():
            tok, attr = towers[comp]
            params = getattr(self, attr)
            emb = params["text_model"]["embeddings"]["token_embedding"]
            rows = emb["weight"].shape[0]
            self._ti_state["orig_rows"].setdefault(comp, rows)
            hidden = emb["weight"].shape[1]
            if vec.shape[1] != hidden:
                raise ValueError(
                    f"embedding dim {vec.shape[1]} != {comp} hidden {hidden}")
            new_rows = jnp.asarray(vec, emb["weight"].dtype)

            def extend(tree):
                w = tree["text_model"]["embeddings"]["token_embedding"]["weight"]
                tree = dict(tree)
                tm = dict(tree["text_model"])
                e = dict(tm["embeddings"])
                e["token_embedding"] = {
                    "weight": jnp.concatenate([w, new_rows], axis=0)
                }
                tm["embeddings"] = e
                tree["text_model"] = tm
                return tree

            setattr(self, attr, extend(params))
            base = self._base_params.get(comp)
            if base is not None and base is not params:
                self._base_params[comp] = extend(base)
            else:
                self._base_params[comp] = getattr(self, attr)
            ids = list(range(rows, rows + vec.shape[0]))
            tok.add_tokens({token: ids})
        self._ti_state["tokens"][token] = sorted(per_tower)
        return token

    def unload_textual_inversion(self) -> None:
        """Remove ALL loaded textual inversions: slice the embedding tables
        back to their original row counts and drop the triggers."""
        import jax.numpy as jnp

        if not self._ti_state:
            return
        towers = {
            "text_encoder": (self.tokenizer, "text_encoder_params"),
            "text_encoder_2": (self.tokenizer_2, "text_encoder_2_params"),
        }
        for comp, rows in self._ti_state["orig_rows"].items():
            tok, attr = towers[comp]

            def shrink(tree):
                w = tree["text_model"]["embeddings"]["token_embedding"]["weight"]
                tree = dict(tree)
                tm = dict(tree["text_model"])
                e = dict(tm["embeddings"])
                e["token_embedding"] = {"weight": w[:rows]}
                tm["embeddings"] = e
                tree["text_model"] = tm
                return tree

            params = getattr(self, attr)
            setattr(self, attr, shrink(params))
            base = (self._base_params or {}).get(comp)
            if base is not None:
                self._base_params[comp] = (
                    shrink(base) if base is not params else getattr(self, attr)
                )
            tok.clear_added_tokens()
        self._ti_state = None

    def load_image_encoder(self, path: str):
        """Load a CLIP vision tower (transformers layout `image_encoder`
        folder) for IP-Adapter image conditioning."""
        import os

        from stablediffusion_tpu.core.config import CLIPVisionConfig
        from stablediffusion_tpu.io.loader import _read_json, load_component_state

        if os.path.isdir(os.path.join(path, "image_encoder")):
            path = os.path.join(path, "image_encoder")
        self.image_encoder_config = CLIPVisionConfig.from_diffusers_dict(
            _read_json(os.path.join(path, "config.json"))
        )
        self.image_encoder_params = load_component_state(path)

    # -- LoRA adapter management (ref: models/stable_diffusion.py:230-335) --
    # Pristine base params are kept so adapter swaps re-fuse from the
    # originals (no drift from repeated add/subtract).
    _base_params: Optional[Dict[str, Any]] = None
    _adapter_store: Dict[str, Dict[str, dict]] = None  # name -> component tree
    # int8 quantization mode for the UNet ("w8" | "w8a8" | None); survives
    # adapter swaps — set_adapters/delete_adapters re-apply it after fusing
    # from the pristine fp base (ops/quant.py: quantize AFTER LoRA fusion)
    quant_mode: Optional[str] = None
    quant_min_size: int = 65536
    # True when loaded from an int8-on-disk checkpoint (io/loader.py
    # save_sd_model(quantize=...)): the fp base no longer exists, so
    # re-quantization and LoRA fusion are impossible and raise
    quant_frozen: bool = False

    def _check_not_frozen(self, op: str) -> None:
        if self.quant_frozen:
            raise ValueError(
                f"{op} requires fp weights, but this model was loaded from "
                "an int8-quantized checkpoint (no fp base on disk); load "
                "the original fp checkpoint instead")

    def quantize(self, mode: Optional[str] = "w8a8",
                 min_size: Optional[int] = None,
                 expected_batch: int = 1) -> None:
        """Opt-in int8 UNet quantization (TPU-native extension; the
        reference serves fp16 torch with no quantized path,
        /root/reference/pipelines/sd_unified_pipeline.py:465-523).

        "w8a8" contracts the big matmuls/convs on the doubled-rate int8
        MXU path; "w8" halves weight HBM reads only; "w8a8:N" (mixed) uses
        the int8 MXU only for layers with >= N output channels — the regime
        where it actually wins ("w8a8:2048" measured 1.11x fp on the SDXL
        batch-1 denoise vs 0.66x for full w8a8, bench_int8_mixed.py).
        "auto" picks the measured optimum for `expected_batch` (b1 →
        "w8a8:2048", b>=8 → full "w8a8"; ops/quant.resolve_quant_mode) —
        quant_mode stores the RESOLVED concrete string.  None reverts to
        the pristine fp weights (re-fusing any active adapters).
        Approximate: conv_in/conv_out/time-embed/norms stay fp (ops/quant.py
        skip list).
        """
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
        # re-derive working params from the fp base at the new mode,
        # preserving any fused adapters
        if self.adapters:
            self.set_adapters(dict(self.adapters))
        else:
            self.unet_params = self._maybe_quantize(
                self._base_params["unet"])

    def _maybe_quantize(self, unet_tree):
        if self.quant_mode is None:
            return unet_tree
        from stablediffusion_tpu.ops.quant import quantize_params

        return quantize_params(
            unet_tree, self.quant_mode, min_size=self.quant_min_size)

    def _ensure_base(self):
        if self._base_params is None:
            self._base_params = {
                "unet": self.unet_params,
                "text_encoder": self.text_encoder_params,
                "text_encoder_2": self.text_encoder_2_params,
            }
        if self._adapter_store is None:
            self._adapter_store = {}

    def load_lora_weights(self, name: str, adapter: Dict[str, Dict[str, dict]]):
        """Register a parsed adapter ({component: {module_path: factors}})
        under `name` (load_lora_weights analog)."""
        self._check_not_frozen("LoRA fusion")
        self._ensure_base()
        self._adapter_store[name] = adapter

    def set_adapters(self, weights: Dict[str, float]):
        """Fuse the named adapters at the given scales into working params
        (set_adapters analog; replaces any previous fusion)."""
        from stablediffusion_tpu.lora.core import fuse

        self._check_not_frozen("LoRA fusion")
        self._ensure_base()
        unknown = [n for n in weights if n not in self._adapter_store]
        if unknown:
            raise ValueError(f"unknown adapters {unknown}; loaded: "
                             f"{sorted(self._adapter_store)}")
        for component, attr in (
            ("unet", "unet_params"),
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
            if component == "unet":
                fused = self._maybe_quantize(fused)
            setattr(self, attr, fused)
        self.adapters = dict(weights)

    def delete_adapters(self):
        """Drop all adapters and restore pristine weights
        (delete_adapters analog)."""
        if self._base_params is not None:
            self.unet_params = self._maybe_quantize(self._base_params["unet"])
            self.text_encoder_params = self._base_params["text_encoder"]
            self.text_encoder_2_params = self._base_params["text_encoder_2"]
        self._adapter_store = {}
        self.adapters = {}

    def lora_module_paths(self) -> Dict[str, list]:
        """All linear-module paths per component — the resolver table for
        kohya's underscore-flattened LoRA keys (lora/formats.py)."""
        from stablediffusion_tpu.lora.core import linear_module_paths

        any_suffix = ("",)  # every path endswith ""
        paths = {
            "unet": linear_module_paths(self.unet_params, any_suffix),
            "text_encoder": linear_module_paths(
                self.text_encoder_params, any_suffix
            ),
        }
        if self.text_encoder_2_params is not None:
            paths["text_encoder_2"] = linear_module_paths(
                self.text_encoder_2_params, any_suffix
            )
        return paths

    def load_loras(self, loras, lora_dir: Optional[str] = None):
        """str / list / {name: weight} -> download-or-load + fuse
        (load_loras analog, models/stable_diffusion.py:230-249).  Files are
        resolved as {lora_dir}/{model_type}_{name}.safetensors."""
        import os

        from stablediffusion_tpu.lora.formats import load_lora_file

        # fail with the real reason before touching the filesystem: a
        # quantized-on-disk base can never fuse, whatever files exist
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
