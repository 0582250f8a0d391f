"""Diffusers-layout checkpoint loader -> SDModel.

The reference loads vae/unet/text_encoder(s)/tokenizer(s)/scheduler from HF
hub subfolders with the fp16 safetensors variant
(models/stable_diffusion.py:106-156), with the OnMoon/{type}_{name} registry
convention (:78-88).  Here the same folder layout is read with our own
safetensors codec and converted to canonical layouts; hub access goes through
huggingface_hub when available and falls back to a local model directory
(SDTPU_MODEL_DIR) in air-gapped environments.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import numpy as np

from stablediffusion_tpu.core.config import (
    CLIPTextConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from stablediffusion_tpu.io.safetensors_io import SafetensorsFile
from stablediffusion_tpu.io.torch_convert import convert_state_dict
from stablediffusion_tpu.models.wrapper import SDModel
from stablediffusion_tpu.tokenizer.clip_bpe import CLIPTokenizer

logger = logging.getLogger(__name__)

DEFAULT_CHECKPOINTS = {
    # ref: models/stable_diffusion.py:78-88
    "sd15": "runwayml/stable-diffusion-v1-5",
    "sdxl": "stabilityai/stable-diffusion-xl-base-1.0",
}
REGISTRY_PREFIX = "OnMoon"


def resolve_checkpoint(
    model_type: str, model_name: Optional[str] = None, cache_dir: Optional[str] = None
) -> str:
    """model_name -> local path.  Registry convention: {type}_{name} under
    the local model dir (hub id OnMoon/{type}_{name} when hub access exists)."""
    cache_dir = cache_dir or os.environ.get("SDTPU_MODEL_DIR", "models")
    if model_name and model_name.endswith((".safetensors", ".ckpt")):
        # A1111 single-file checkpoint: a direct path or a file in the
        # model dir (load_sd_single_file handles it)
        for cand in (model_name, os.path.join(cache_dir, model_name)):
            if os.path.isfile(cand):
                return cand
        raise FileNotFoundError(f"single-file checkpoint {model_name!r} not "
                                f"found (also tried under {cache_dir})")
    if model_name is None:
        repo = DEFAULT_CHECKPOINTS[model_type]
        local = os.path.join(cache_dir, repo.split("/")[-1])
    else:
        local = os.path.join(cache_dir, f"{model_type}_{model_name}")
        repo = f"{REGISTRY_PREFIX}/{model_type}_{model_name}"
    if os.path.isdir(local):
        return local
    try:  # hub path (no-op in air-gapped envs)
        from huggingface_hub import snapshot_download

        return snapshot_download(repo, cache_dir=cache_dir)
    except Exception as e:
        raise FileNotFoundError(
            f"checkpoint {repo!r} not found locally at {local} and hub "
            f"download failed ({type(e).__name__})"
        ) from e


def load_sd_single_file(
    path: str,
    scheduler_name: str = "DDIM",
    tokenizer_dir: Optional[str] = None,
    dtype=None,
    extract_ema: bool = False,
    scaling_factor: Optional[float] = None,
    prediction_type: Optional[str] = None,
) -> SDModel:
    """diffusers ``from_single_file`` analog: load an A1111/LDM single-file
    checkpoint (.safetensors / .ckpt) straight into an SDModel — the
    io/a1111 converter runs in memory, no diffusers-folder roundtrip.
    ``tokenizer_dir`` points at a folder holding ``tokenizer`` (and, for
    SDXL, ``tokenizer_2``) subfolders, or the vocab/merges files directly;
    single-file checkpoints do not carry tokenizers (A1111 ships them with
    the app) and without one the model can only run from prompt_embeds."""
    import logging

    from stablediffusion_tpu.io.a1111 import convert_a1111_checkpoint
    from stablediffusion_tpu.io.convert_cli import load_single_file
    from stablediffusion_tpu.io.torch_convert import convert_state_dict

    state = load_single_file(path)
    weights, configs = convert_a1111_checkpoint(
        state, extract_ema_weights=extract_ema, scaling_factor=scaling_factor
    )
    is_sdxl = configs["model_type"] == "sdxl"

    def tok(sub):
        if tokenizer_dir is None:
            return None
        d = os.path.join(tokenizer_dir, sub)
        if not os.path.isdir(d):
            if sub == "tokenizer_2":
                # CLIP-L and OpenCLIP-bigG share vocab+merges; only the pad
                # token differs ("!" = id 0 for tower 2) — reuse tower 1's
                # files rather than failing on a missing tokenizer_2 folder
                d = os.path.join(tokenizer_dir, "tokenizer")
                if not os.path.isdir(d):
                    d = tokenizer_dir
                return CLIPTokenizer.from_pretrained(d, pad_token_id=0)
            d = tokenizer_dir  # files given directly
        return CLIPTokenizer.from_pretrained(d)

    if tokenizer_dir is None:
        logging.getLogger(__name__).warning(
            "single-file checkpoint has no tokenizer; pass tokenizer_dir= "
            "or supply prompt_embeds at generation time"
        )

    kwargs: Dict[str, Any] = {}
    if is_sdxl:
        kwargs.update(
            text_encoder_2_config=CLIPTextConfig.from_diffusers_dict(
                configs["text_encoder_2"]
            ),
            text_encoder_2_params=convert_state_dict(
                weights["text_encoder_2"], dtype=dtype
            ),
            tokenizer_2=tok("tokenizer_2"),
        )
    return SDModel(
        model_type="sdxl" if is_sdxl else "sd15",
        unet_config=UNetConfig.from_diffusers_dict(configs["unet"]),
        unet_params=convert_state_dict(weights["unet"], dtype=dtype),
        vae_config=VAEConfig.from_diffusers_dict(configs["vae"]),
        vae_params=convert_state_dict(weights["vae"], dtype=dtype),
        text_encoder_config=CLIPTextConfig.from_diffusers_dict(
            configs["text_encoder"]
        ),
        text_encoder_params=convert_state_dict(
            weights["text_encoder"], dtype=dtype
        ),
        tokenizer=tok("tokenizer"),
        # A1111 convention (the convert CLI writes the same fixed
        # scaled-linear table).  prediction_type must be supplied for
        # v-prediction checkpoints (SD2.x-768-v and v-pred fine-tunes) —
        # the single-file format does not record it.
        scheduler_config=(
            SchedulerConfig(prediction_type=prediction_type)
            if prediction_type
            else SchedulerConfig()
        ),
        scheduler_name=scheduler_name,
        path=os.path.abspath(path),
        **kwargs,
    )


def _read_json(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _find_weights(folder: str, variant: Optional[str] = "fp16"):
    """Pick the weight file(s) in a subfolder, preferring the fp16 variant
    (ref loads variant='fp16' safetensors, models/stable_diffusion.py:113-146).
    Handles sharded checkpoints via the index json."""
    names = os.listdir(folder)
    for base in ("diffusion_pytorch_model", "model"):
        for v in ([f".{variant}", ""] if variant else [""]):
            idx = f"{base}{v}.safetensors.index.json"
            if idx in names:
                index = _read_json(os.path.join(folder, idx))
                shards = sorted(set(index["weight_map"].values()))
                return [os.path.join(folder, s) for s in shards]
            fn = f"{base}{v}.safetensors"
            if fn in names:
                return [os.path.join(folder, fn)]
    raise FileNotFoundError(f"no safetensors weights in {folder}")


def load_component_state(folder: str, variant="fp16", dtype=None) -> dict:
    """Checkpoint folder -> device-resident canonical-layout pytree.

    Pipelined: a small thread pool reads + layout-converts tensors
    (mmap -> transpose/cast -> contiguous) while the main thread streams
    device puts.  On the tunneled TPU backend the transfer is the hard
    floor (~45 MB/s measured, benchmarks/probe_load*.py — flat from 8 to
    128 MB per put, so chunking buys nothing); serializing host convert
    *after* the read and *before* the puts cost 133 s for a 2.2 GB SD1.5
    checkpoint, vs ~the transfer time alone when overlapped."""
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from stablediffusion_tpu.io.torch_convert import convert_tensor, nest

    drop = ("position_ids",)
    np_dtype = np.dtype(dtype) if dtype is not None else None
    files = [SafetensorsFile(p) for p in _find_weights(folder, variant)]
    try:
        work = [(f, name) for f in files for name in f.keys()
                if not any(name.endswith(d) for d in drop)]

        def prep(item):
            f, name = item
            arr = f.tensor(name)
            if f.metadata.get("sdtpu_layout") == "canonical":
                # pre-converted checkpoint (int8-quantized saves): already
                # canonical layouts.  Integer tensors (weight_int8) and the
                # fp32 dequant scales must keep their dtypes.
                if (np_dtype is not None and arr.dtype.kind not in "iub"
                        and not name.endswith("_scale")):
                    arr = np.asarray(arr, dtype=np_dtype)
                return np.ascontiguousarray(arr)
            arr = convert_tensor(name, arr)
            # cast/contiguify in the worker thread (numpy releases the GIL)
            # so the main thread only dispatches transfers
            return np.ascontiguousarray(
                arr if np_dtype is None else np.asarray(arr, dtype=np_dtype)
            )

        out: Dict[str, jnp.ndarray] = {}
        with ThreadPoolExecutor(4) as ex:
            for (_, name), arr in zip(work, ex.map(prep, work)):
                out[name] = jnp.asarray(arr)
    finally:
        for f in files:
            f.close()
    return nest(out)


# converter --scheduler_type choice -> serving registry name (the reference
# constructs the matching diffusers class per choice,
# scripts/convert_from_A1111.py:940-1003)
_CONVERTER_SCHEDULER_NAMES = {
    "ddim": "DDIM",
    "pndm": "PNDM",
    "lms": "lms",
    "heun": "heun",
    "euler": "euler",
    "euler-ancestral": "euler_a",
    "dpm": "DPM++ 2M",
}


def _resolve_scheduler_name(path: str, scheduler_name: Optional[str]) -> str:
    """None means auto: honor a converted checkpoint's `_scheduler_type`
    (model_index.json, written by io/convert_cli.py) before the DDIM
    default."""
    if scheduler_name is not None:
        return scheduler_name
    idx = os.path.join(path, "model_index.json")
    if os.path.exists(idx):
        stype = _read_json(idx).get("_scheduler_type")
        if stype:
            return _CONVERTER_SCHEDULER_NAMES.get(stype, stype)
    return "DDIM"


def _read_quant_mode(path: str) -> Optional[str]:
    """int8-on-disk checkpoints record their mode in model_index.json
    (save_sd_model(quantize=...)); the loaded model is quant_frozen."""
    idx = os.path.join(path, "model_index.json")
    if os.path.exists(idx):
        return _read_json(idx).get("_sdtpu_quant")
    return None


def load_sd_model(
    path: str,
    model_type: Optional[str] = None,
    dtype=None,
    variant: Optional[str] = "fp16",
    scheduler_name: Optional[str] = None,
) -> SDModel:
    """Load a diffusers-layout folder (load_hf_checkpoint analog)."""
    scheduler_name = _resolve_scheduler_name(path, scheduler_name)
    if model_type is None:
        model_type = "sdxl" if os.path.isdir(os.path.join(path, "text_encoder_2")) else "sd15"

    unet_cfg = UNetConfig.from_diffusers_dict(
        _read_json(os.path.join(path, "unet", "config.json"))
    )
    vae_cfg = VAEConfig.from_diffusers_dict(
        _read_json(os.path.join(path, "vae", "config.json"))
    )
    te_cfg = CLIPTextConfig.from_diffusers_dict(
        _read_json(os.path.join(path, "text_encoder", "config.json"))
    )
    sched_path = os.path.join(path, "scheduler", "scheduler_config.json")
    sched_cfg = (
        SchedulerConfig.from_diffusers_dict(_read_json(sched_path))
        if os.path.exists(sched_path)
        else SchedulerConfig()
    )

    def _load(sub):
        return load_component_state(os.path.join(path, sub), variant, dtype)

    kwargs: Dict[str, Any] = {}
    if model_type == "sdxl":
        te2_cfg = CLIPTextConfig.from_diffusers_dict(
            _read_json(os.path.join(path, "text_encoder_2", "config.json"))
        )
        kwargs.update(
            text_encoder_2_config=te2_cfg,
            text_encoder_2_params=_load("text_encoder_2"),
            tokenizer_2=CLIPTokenizer.from_pretrained(
                os.path.join(path, "tokenizer_2")
            ),
        )

    qmode = _read_quant_mode(path)
    model = SDModel(
        model_type=model_type,
        unet_config=unet_cfg,
        unet_params=_load("unet"),
        quant_mode=qmode,
        quant_frozen=qmode is not None,
        vae_config=vae_cfg,
        vae_params=_load("vae"),
        text_encoder_config=te_cfg,
        text_encoder_params=_load("text_encoder"),
        tokenizer=CLIPTokenizer.from_pretrained(os.path.join(path, "tokenizer")),
        scheduler_config=sched_cfg,
        scheduler_name=scheduler_name,
        path=path,
        **kwargs,
    )
    return model


class T5TokenizerAdapter:
    """Pads/truncates through a transformers T5 tokenizer to a fixed length
    (the SD3 pipeline's max_sequence_length contract)."""

    def __init__(self, hf_tokenizer):
        self.hf = hf_tokenizer

    def __call__(self, texts, max_length: int = 256):
        if isinstance(texts, str):
            texts = [texts]
        out = self.hf(
            list(texts),
            padding="max_length",
            max_length=max_length,
            truncation=True,
            add_special_tokens=True,
            return_tensors="np",
        )
        return out["input_ids"].astype("int32")


def load_sd3_model(
    path: str,
    dtype=None,
    variant: Optional[str] = "fp16",
    scheduler_name: str = "FlowMatchEuler",
):
    """Load a diffusers-layout SD3-family folder (transformer/, vae/, three
    text encoders; text_encoder_3/tokenizer_3 optional — the T5-free serving
    configuration).  Beyond-parity: the reference repo has no SD3 support."""
    from stablediffusion_tpu.core.config import SD3Config
    from stablediffusion_tpu.models.t5 import T5Config
    from stablediffusion_tpu.pipelines.sd3 import SD3Model

    tf_cfg = SD3Config.from_diffusers_dict(
        _read_json(os.path.join(path, "transformer", "config.json"))
    )
    vae_cfg = VAEConfig.from_diffusers_dict(
        _read_json(os.path.join(path, "vae", "config.json"))
    )
    te_cfg = CLIPTextConfig.from_diffusers_dict(
        _read_json(os.path.join(path, "text_encoder", "config.json"))
    )
    te2_cfg = CLIPTextConfig.from_diffusers_dict(
        _read_json(os.path.join(path, "text_encoder_2", "config.json"))
    )
    sched_path = os.path.join(path, "scheduler", "scheduler_config.json")
    sched_cfg = (
        SchedulerConfig.from_diffusers_dict(_read_json(sched_path))
        if os.path.exists(sched_path)
        else SchedulerConfig(shift=3.0)
    )

    def _load(sub):
        return load_component_state(os.path.join(path, sub), variant, dtype)

    kwargs: Dict[str, Any] = {}
    te3_dir = os.path.join(path, "text_encoder_3")
    if os.path.isdir(te3_dir) and os.path.exists(
        os.path.join(te3_dir, "config.json")
    ):
        # first-party SentencePiece-unigram tokenizer (no transformers
        # runtime dependency; transformers remains a test anchor only —
        # SURVEY §2.9 D4, tokenizer/sentencepiece_unigram.py)
        from stablediffusion_tpu.tokenizer.sentencepiece_unigram import (
            SentencePieceUnigramTokenizer,
        )

        kwargs.update(
            text_encoder_3_config=T5Config.from_diffusers_dict(
                _read_json(os.path.join(te3_dir, "config.json"))
            ),
            text_encoder_3_params=_load("text_encoder_3"),
            tokenizer_3=SentencePieceUnigramTokenizer.from_pretrained(
                os.path.join(path, "tokenizer_3")
            ),
        )

    qmode = _read_quant_mode(path)
    return SD3Model(
        transformer_config=tf_cfg,
        transformer_params=_load("transformer"),
        quant_mode=qmode,
        quant_frozen=qmode is not None,
        vae_config=vae_cfg,
        vae_params=_load("vae"),
        text_encoder_config=te_cfg,
        text_encoder_params=_load("text_encoder"),
        tokenizer=CLIPTokenizer.from_pretrained(os.path.join(path, "tokenizer")),
        text_encoder_2_config=te2_cfg,
        text_encoder_2_params=_load("text_encoder_2"),
        tokenizer_2=CLIPTokenizer.from_pretrained(
            os.path.join(path, "tokenizer_2")
        ),
        scheduler_config=sched_cfg,
        scheduler_name=scheduler_name,
        path=path,
        **kwargs,
    )


def _dump_component(
    path: str, sub: str, params, cfg_dict: dict,
    fname: str = "diffusion_pytorch_model", variant: Optional[str] = None,
    canonical: bool = False, metadata: Optional[Dict[str, str]] = None,
) -> None:
    """Write one diffusers component folder: torch-layout safetensors +
    config.json (shared by save_sd_model / save_sd3_model / save_controlnet).

    canonical=True keeps the repo's canonical layouts (HWIO / (in,out)) and
    stamps `sdtpu_layout: canonical` so load_component_state skips the torch
    conversion — used for int8-quantized saves, which have no torch
    ecosystem interchange anyway (scales/int8 trees are sdtpu-specific)."""
    from stablediffusion_tpu.io.safetensors_io import save_safetensors
    from stablediffusion_tpu.io.torch_convert import deconvert_tensor, flatten

    d = os.path.join(path, sub)
    os.makedirs(d, exist_ok=True)
    flat = {
        k: np.asarray(v) if canonical else deconvert_tensor(k, np.asarray(v))
        for k, v in flatten(params).items()
    }
    meta = dict(metadata or {})
    if canonical:
        meta.setdefault("sdtpu_layout", "canonical")
    suffix = f".{variant}" if variant else ""
    save_safetensors(flat, os.path.join(d, f"{fname}{suffix}.safetensors"),
                     metadata=meta or None)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2)


def _check_fp_save(model, quantize) -> None:
    """Shared save_sd_model/save_sd3_model guard: an fp ecosystem save of an
    in-memory-quantized model would silently mix layouts."""
    if quantize is None and model.quant_mode is not None:
        raise ValueError(
            "model is int8-quantized in memory; pass quantize="
            f"{model.quant_mode!r} to write an int8 checkpoint, or "
            "model.quantize(None) first for an fp ecosystem checkpoint")


def _quantized_tree(model, attr: str, mode: str, skip_keys=None):
    """Diffusion-tower params pre-quantized for an int8-on-disk save: reuse
    the in-memory transform if it matches, quantize fresh from fp otherwise."""
    if model.quant_mode not in (None, mode):
        raise ValueError(
            f"cannot write a {mode!r} checkpoint from a model quantized as "
            f"{model.quant_mode!r}; load fp weights or model.quantize(None)")
    tree = getattr(model, attr)
    if model.quant_mode == mode:
        return tree  # already the transformed tree (post any LoRA fusion)
    from stablediffusion_tpu.ops.quant import quantize_params

    kw = {"skip_keys": skip_keys} if skip_keys is not None else {}
    return quantize_params(tree, mode, min_size=model.quant_min_size, **kw)


def save_sd_model(model: SDModel, path: str, variant: Optional[str] = None,
                  quantize: Optional[str] = None) -> None:
    """Write a diffusers-layout folder (save_pretrained analog) readable by
    the torch ecosystem: torch layouts, per-component subfolders + configs.

    quantize="w8"|"w8a8" writes the UNet int8-on-disk instead (canonical
    layout + per-channel scales, ~half the bytes — disk, cold-start
    transfer, and HBM all halve; benchmarks/bench_coldstart.py --quantize).
    Such checkpoints load transparently (model_index records _sdtpu_quant;
    the loaded model is quant_frozen: no further LoRA fusion)."""
    import dataclasses
    import functools

    from stablediffusion_tpu.ops.quant import resolve_quant_mode

    quantize = resolve_quant_mode(quantize)  # "auto" -> b1 optimum;
    # sdtpu-quantize --expected_batch resolves throughput targets upstream
    _check_fp_save(model, quantize)
    os.makedirs(path, exist_ok=True)
    dump = functools.partial(_dump_component, path, variant=variant)

    if quantize:
        dump("unet", _quantized_tree(model, "unet_params", quantize),
             _unet_cfg_dict(model.unet_config), canonical=True,
             metadata={"sdtpu_quant": quantize})
    else:
        dump("unet", model.unet_params, _unet_cfg_dict(model.unet_config))
    dump("vae", model.vae_params, _vae_cfg_dict(model.vae_config))
    dump(
        "text_encoder",
        model.text_encoder_params,
        _clip_cfg_dict(model.text_encoder_config),
        fname="model",
    )
    if model.is_sdxl:
        dump(
            "text_encoder_2",
            model.text_encoder_2_params,
            _clip_cfg_dict(model.text_encoder_2_config),
            fname="model",
        )
    if hasattr(model.tokenizer, "save_pretrained"):
        model.tokenizer.save_pretrained(os.path.join(path, "tokenizer"))
    if model.is_sdxl and hasattr(model.tokenizer_2, "save_pretrained"):
        model.tokenizer_2.save_pretrained(os.path.join(path, "tokenizer_2"))
    os.makedirs(os.path.join(path, "scheduler"), exist_ok=True)
    with open(os.path.join(path, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(dataclasses.asdict(model.scheduler_config), f, indent=2)
    # record the active scheduler by registry name so load_sd_model's auto
    # resolution round-trips it (converted checkpoints use the converter's
    # lowercase choice names; both spellings resolve)
    index = {
        "_class_name": "StableDiffusionXLPipeline"
        if model.is_sdxl
        else "StableDiffusionPipeline",
        "_scheduler_type": model.scheduler_name,
    }
    if quantize:
        index["_sdtpu_quant"] = quantize
    with open(os.path.join(path, "model_index.json"), "w") as f:
        json.dump(index, f)


def save_sd3_model(model, path: str, variant: Optional[str] = None,
                   quantize: Optional[str] = None) -> None:
    """Write a diffusers-layout SD3-family folder (save_pretrained analog):
    transformer/vae/text encoders as torch-layout safetensors + configs,
    plus tokenizer folders when the attached tokenizers can serialize
    themselves (first-party CLIPTokenizer / SentencePieceUnigramTokenizer
    both do) — making the folder fully self-loading via load_sd3_model.
    Adapter-wrapped external tokenizers remain caller-copied artifacts.

    quantize="w8"|"w8a8" writes the MMDiT int8-on-disk (canonical layout,
    ~half the bytes); see save_sd_model."""
    import dataclasses
    import functools

    from stablediffusion_tpu.ops.quant import resolve_quant_mode

    quantize = resolve_quant_mode(quantize)
    _check_fp_save(model, quantize)
    os.makedirs(path, exist_ok=True)
    dump = functools.partial(_dump_component, path, variant=variant)

    tf_cfg = dataclasses.asdict(model.transformer_config)
    tf_cfg["dual_attention_layers"] = list(tf_cfg["dual_attention_layers"])
    tf_cfg["_class_name"] = "SD3Transformer2DModel"
    if quantize:
        dump("transformer",
             _quantized_tree(model, "transformer_params", quantize,
                             skip_keys=model._QUANT_SKIP),
             tf_cfg, canonical=True, metadata={"sdtpu_quant": quantize})
    else:
        dump("transformer", model.transformer_params, tf_cfg)
    dump("vae", model.vae_params, _vae_cfg_dict(model.vae_config))
    dump(
        "text_encoder",
        model.text_encoder_params,
        _clip_cfg_dict(model.text_encoder_config),
        fname="model",
    )
    dump(
        "text_encoder_2",
        model.text_encoder_2_params,
        _clip_cfg_dict(model.text_encoder_2_config),
        fname="model",
    )
    if model.text_encoder_3_params is not None:
        t5_cfg = dataclasses.asdict(model.text_encoder_3_config)
        t5_cfg["architectures"] = ["T5EncoderModel"]
        dump(
            "text_encoder_3",
            model.text_encoder_3_params,
            t5_cfg,
            fname="model",
        )
    if hasattr(model.tokenizer, "save_pretrained"):
        model.tokenizer.save_pretrained(os.path.join(path, "tokenizer"))
    if hasattr(model.tokenizer_2, "save_pretrained"):
        model.tokenizer_2.save_pretrained(os.path.join(path, "tokenizer_2"))
    if model.text_encoder_3_params is not None and hasattr(
        model.tokenizer_3, "save_pretrained"
    ):
        model.tokenizer_3.save_pretrained(os.path.join(path, "tokenizer_3"))
    os.makedirs(os.path.join(path, "scheduler"), exist_ok=True)
    with open(os.path.join(path, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(dataclasses.asdict(model.scheduler_config), f, indent=2)
    index = {"_class_name": "StableDiffusion3Pipeline"}
    if quantize:
        index["_sdtpu_quant"] = quantize
    with open(os.path.join(path, "model_index.json"), "w") as f:
        json.dump(index, f)


def save_controlnet(params: dict, config: UNetConfig, path: str) -> None:
    """Write a diffusers-layout ControlNet folder (ControlNetModel
    save_pretrained analog): torch layouts + config.json.  Round-trips
    through SDModel.load_controlnet / the converter CLI."""
    from stablediffusion_tpu.io.safetensors_io import save_safetensors
    from stablediffusion_tpu.io.torch_convert import deconvert_tensor, flatten

    os.makedirs(path, exist_ok=True)
    flat = {
        k: deconvert_tensor(k, np.asarray(v)) for k, v in flatten(params).items()
    }
    save_safetensors(flat, os.path.join(path, "diffusion_pytorch_model.safetensors"))
    cfg = _unet_cfg_dict(config)
    cfg["_class_name"] = "ControlNetModel"
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def _unet_cfg_dict(c: UNetConfig) -> dict:
    import dataclasses

    d = dataclasses.asdict(c)
    d["down_block_types"] = list(c.down_block_types)
    d["up_block_types"] = list(c.up_block_types)
    d["block_out_channels"] = list(c.block_out_channels)
    if isinstance(c.num_attention_heads, tuple):
        d["num_attention_heads"] = list(c.num_attention_heads)
    if isinstance(c.transformer_layers_per_block, tuple):
        d["transformer_layers_per_block"] = list(c.transformer_layers_per_block)
    return d


def _vae_cfg_dict(c: VAEConfig) -> dict:
    import dataclasses

    d = dataclasses.asdict(c)
    d["block_out_channels"] = list(c.block_out_channels)
    return d


def _clip_cfg_dict(c: CLIPTextConfig) -> dict:
    import dataclasses

    d = dataclasses.asdict(c)
    d["architectures"] = [
        "CLIPTextModelWithProjection" if c.with_projection else "CLIPTextModel"
    ]
    return d
