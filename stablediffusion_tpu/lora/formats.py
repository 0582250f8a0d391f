"""LoRA serialization — diffusers/peft and kohya-ss safetensors formats.

The reference loads hub LoRA files via diffusers' loader mixins and splits
the state dict into unet / text_encoder / text_encoder_2 sub-dicts, validating
every key contains "lora" (models/stable_diffusion.py:252-295); it saves via
StableDiffusion(XL)Pipeline.save_lora_weights (train_lora_pipeline.py:514-528).

Supported on load:
  * peft/diffusers:  ``unet.<path>.lora_A.weight`` [r, in] /
                     ``.lora_B.weight`` [out, r]
  * legacy diffusers: ``unet.<path>.lora.down.weight`` / ``.lora.up.weight``
  * kohya-ss:        ``lora_unet_<path_with_underscores>.lora_down.weight``,
                     ``.lora_up.weight``, ``.alpha``
                     (prefixes lora_te_/lora_te1_/lora_te2_ for text encoders)

Internal form: {"unet": {path: {down [in,r], up [r,out], alpha}}, ...} with
TPU-canonical layouts.  Saved files use the peft/diffusers key naming and
torch layouts for ecosystem interchange (SURVEY.md D7).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.io.safetensors_io import load_safetensors, save_safetensors

COMPONENTS = ("unet", "transformer", "text_encoder", "text_encoder_2")
_KOHYA_PREFIXES = {
    "lora_transformer_": "transformer",
    "lora_unet_": "unet",
    "lora_te1_": "text_encoder",
    "lora_te2_": "text_encoder_2",
    "lora_te_": "text_encoder",
}


def validate_lora_keys(keys: Iterable[str]) -> None:
    """All keys must mention lora (ref: models/stable_diffusion.py:264-266)."""
    bad = [k for k in keys if "lora" not in k and not k.endswith(".alpha")]
    if bad:
        raise ValueError(f"not a LoRA state dict; offending keys: {bad[:5]}")


def _kohya_resolver(candidate_paths: Iterable[str]) -> Dict[str, str]:
    """underscored path -> dotted path (kohya flattens '.' to '_')."""
    return {p.replace(".", "_"): p for p in candidate_paths}


def parse_lora_state_dict(
    flat: Mapping[str, np.ndarray],
    model_paths: Optional[Mapping[str, Iterable[str]]] = None,
) -> Dict[str, Dict[str, dict]]:
    """Flat tensor dict -> {component: {module_path: {down, up, alpha}}}.

    `model_paths`: optional {component: iterable of valid module paths}, used
    to resolve kohya's underscore-flattened names."""
    validate_lora_keys(flat.keys())
    out: Dict[str, Dict[str, dict]] = {c: {} for c in COMPONENTS}
    resolvers = {
        c: _kohya_resolver(model_paths[c]) if model_paths and c in model_paths else None
        for c in COMPONENTS
    }

    def entry(component: str, path: str) -> dict:
        return out[component].setdefault(path, {})

    for key, value in flat.items():
        arr = np.asarray(value)
        # --- kohya ---
        matched = False
        for prefix, component in _KOHYA_PREFIXES.items():
            if key.startswith(prefix):
                rest = key[len(prefix):]
                m = re.match(r"(.+?)\.(lora_down\.weight|lora_up\.weight|alpha)$", rest)
                if not m:
                    raise ValueError(f"unrecognized kohya key {key!r}")
                flat_path, kind = m.groups()
                resolver = resolvers[component]
                if resolver and flat_path in resolver:
                    path = resolver[flat_path]
                else:
                    # fall back: undo underscores around known numeric segments
                    path = re.sub(r"_(\d+)_", r".\1.", flat_path)
                    path = re.sub(r"_(\d+)$", r".\1", path)
                    path = path.replace("_blocks.", "_blocks.").replace(
                        "transformer.blocks", "transformer_blocks"
                    )
                e = entry(component, path)
                if kind == "alpha":
                    e["alpha"] = jnp.asarray(float(arr.reshape(-1)[0]))
                elif kind == "lora_down.weight":
                    e["down"] = jnp.asarray(arr.T)  # [r,in] -> [in,r]
                else:
                    e["up"] = jnp.asarray(arr.T)  # [out,r] -> [r,out]
                matched = True
                break
        if matched:
            continue
        # --- diffusers / peft ---
        component = next(
            (c for c in ("text_encoder_2", "text_encoder", "unet", "transformer")
             if key.startswith(c + ".")),
            None,
        )
        if component is None:
            raise ValueError(f"unrecognized LoRA key {key!r}")
        rest = key[len(component) + 1 :]
        m = re.match(
            r"(.+?)\.(lora_A\.weight|lora_B\.weight|lora\.down\.weight|"
            r"lora\.up\.weight|alpha)$",
            rest,
        )
        if not m:
            raise ValueError(f"unrecognized LoRA key {key!r}")
        path, kind = m.groups()
        # legacy attention-processor paths: strip ".processor", "_lora",
        # "to_out_lora" -> "to_out.0"
        path = path.replace(".processor", "")
        path = re.sub(r"\.to_out_lora$", ".to_out.0", path)
        path = re.sub(r"\.(to_[qkv])_lora$", r".\1", path)
        e = entry(component, path)
        if kind == "alpha":
            e["alpha"] = jnp.asarray(float(arr.reshape(-1)[0]))
        elif kind in ("lora_A.weight", "lora.down.weight"):
            e["down"] = jnp.asarray(arr.T)
        else:
            e["up"] = jnp.asarray(arr.T)

    for c in COMPONENTS:
        for path, e in out[c].items():
            if "down" not in e or "up" not in e:
                raise ValueError(f"incomplete LoRA pair at {c}.{path}")
    return {c: v for c, v in out.items() if v}


def load_lora_file(
    path: str, model_paths: Optional[Mapping[str, Iterable[str]]] = None
) -> Dict[str, Dict[str, dict]]:
    return parse_lora_state_dict(load_safetensors(path), model_paths)


_KOHYA_SAVE_PREFIX = {
    "unet": "lora_unet_",
    "transformer": "lora_transformer_",
    # te1/te2 when a second tower adapter exists, bare te otherwise
    # (handled in save_lora_file)
}


def save_lora_file(
    adapters: Mapping[str, Mapping[str, dict]],
    path: str,
    metadata: Optional[Mapping[str, str]] = None,
    format: str = "peft",
) -> None:
    """Save {component: {module_path: factors}} as safetensors (torch
    layouts) for ecosystem interchange.

    format="peft" (default): ``{component}.{path}.lora_A/B.weight`` —
    diffusers' load_lora_weights convention.
    format="kohya": ``lora_unet_{path_with_underscores}.lora_down/up.weight``
    + per-module ``alpha`` — the A1111/kohya-ss convention (te1/te2 prefixes
    when a second text-encoder adapter is present, plain te otherwise).
    Both round-trip through parse_lora_state_dict.
    """
    flat: Dict[str, np.ndarray] = {}
    if format == "kohya":
        has_te2 = "text_encoder_2" in adapters
        for component, tree in adapters.items():
            prefix = _KOHYA_SAVE_PREFIX.get(component)
            if prefix is None:
                prefix = {
                    "text_encoder": "lora_te1_" if has_te2 else "lora_te_",
                    "text_encoder_2": "lora_te2_",
                }[component]
            for mpath, factors in tree.items():
                down = np.asarray(factors["down"], np.float32).T
                up = np.asarray(factors["up"], np.float32).T
                key = prefix + mpath.replace(".", "_")
                flat[f"{key}.lora_down.weight"] = down
                flat[f"{key}.lora_up.weight"] = up
                # kohya always writes alpha (defaults to rank)
                alpha = factors.get("alpha")
                flat[f"{key}.alpha"] = np.asarray(
                    float(alpha) if alpha is not None else float(down.shape[0]),
                    np.float32,
                )
    elif format == "peft":
        for component, tree in adapters.items():
            for mpath, factors in tree.items():
                down = np.asarray(factors["down"], np.float32).T  # [in,r]->[r,in]
                up = np.asarray(factors["up"], np.float32).T  # [r,out]->[out,r]
                flat[f"{component}.{mpath}.lora_A.weight"] = down
                flat[f"{component}.{mpath}.lora_B.weight"] = up
                alpha = factors.get("alpha")
                if alpha is not None and float(alpha) != down.shape[0]:
                    flat[f"{component}.{mpath}.alpha"] = np.asarray(
                        float(alpha), np.float32
                    )
    else:
        raise ValueError(f"unknown LoRA save format {format!r}")
    save_safetensors(flat, path, metadata=metadata or {"format": "pt"})
