"""LoRA runtime: pytree factors, delta-W fusion, train-time injection.

The reference delegates to peft (adapter injection into q/k/v/out linears,
multi-adapter with per-adapter scale — train_lora_pipeline.py:247-266,
models/stable_diffusion.py:246-335).  TPU-native design per SURVEY.md D6:
LoRA is a pytree of (down, up, alpha) factors over linear-module paths;
*inference* fuses dW = scale * (alpha/r) * down @ up into the base weights at
load time (zero runtime overhead); *training* recomputes the fused weights
inside the jitted step so gradients flow to the factors only.

Canonical layouts: down [in, r], up [r, out] (matching our (in, out) linear
kernels; torch checkpoints store [r, in] / [out, r] and are transposed by
io/torch_convert rules on load).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# module paths targeted by the reference's trainer (train_lora_pipeline.py:
# 247-266): UNet attention projections, CLIP attention projections
UNET_TARGET_SUFFIXES = ("to_q", "to_k", "to_v", "to_out.0")
TEXT_TARGET_SUFFIXES = ("q_proj", "k_proj", "v_proj", "out_proj")


def _get_path(tree: dict, path: str):
    node = tree
    for p in path.split("."):
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _set_path(tree: dict, path: str, value) -> dict:
    """Functional set: returns a new tree sharing unmodified nodes."""
    parts = path.split(".")
    new = dict(tree)
    node = new
    for p in parts[:-1]:
        node[p] = dict(node[p])
        node = node[p]
    node[parts[-1]] = value
    return new


def linear_module_paths(params: dict, suffixes: Sequence[str]) -> List[str]:
    """All module paths whose leaf is a linear dict {'weight': 2D [, 'bias']}
    and whose path ends with one of `suffixes`."""
    found: List[str] = []

    def walk(node, path):
        if isinstance(node, dict):
            if "weight" in node and not isinstance(node["weight"], dict):
                w = node["weight"]
                if getattr(w, "ndim", 0) == 2 and any(
                    path.endswith(s) for s in suffixes
                ):
                    found.append(path)
                return
            for k, v in node.items():
                walk(v, f"{path}.{k}" if path else k)

    walk(params, "")
    return sorted(found)


def init_lora(
    key: jax.Array,
    params: dict,
    rank: int,
    suffixes: Sequence[str],
    alpha: Optional[float] = None,
    dtype=jnp.float32,
    store_alpha: bool = True,
) -> dict:
    """Fresh trainable factors: down gaussian(1/r), up zeros (peft convention).
    alpha defaults to rank (the reference sets rank == alpha).  For training,
    pass store_alpha=False so the scalar is not a trainable leaf (delta_w
    treats a missing alpha as alpha == rank, which is the same scale)."""
    alpha = float(alpha if alpha is not None else rank)
    paths = linear_module_paths(params, suffixes)
    lora: Dict[str, dict] = {}
    keys = jax.random.split(key, max(len(paths), 1))
    for k, path in zip(keys, paths):
        w = _get_path(params, path)["weight"]
        n_in, n_out = w.shape
        lora[path] = {
            "down": jax.random.normal(k, (n_in, rank), dtype) / rank,
            "up": jnp.zeros((rank, n_out), dtype),
        }
        if store_alpha:
            lora[path]["alpha"] = jnp.asarray(alpha, dtype)
    return lora


def delta_w(factors: dict, scale: float | jax.Array = 1.0) -> jax.Array:
    """dW [in, out] = scale * (alpha / r) * down @ up, computed in fp32."""
    down = factors["down"].astype(jnp.float32)
    up = factors["up"].astype(jnp.float32)
    r = down.shape[1]
    alpha = factors.get("alpha")
    a = jnp.asarray(alpha, jnp.float32) if alpha is not None else jnp.asarray(float(r))
    return (a / r) * jnp.dot(down, up) * scale


def fuse(
    params: dict,
    adapters: Mapping[str, dict],  # name -> lora tree {path: factors}
    weights: Optional[Mapping[str, float]] = None,
) -> dict:
    """Fuse one or more adapters into a copy of `params`
    (multi-adapter set_adapters semantics, models/stable_diffusion.py:298-310).
    Unmodified subtrees are shared, so memory cost is only the touched
    weights."""
    import warnings

    weights = weights or {}
    out = params
    touched: Dict[str, jax.Array] = {}
    for name, tree in adapters.items():
        scale = float(weights.get(name, 1.0))
        if scale == 0.0:
            continue
        missing: List[str] = []
        applied = 0
        for path, factors in tree.items():
            mod = _get_path(params, path)
            if mod is None:
                missing.append(path)  # adapter covers modules this model lacks
                continue
            w = touched.get(path, mod["weight"])
            dw = delta_w(factors, scale)
            touched[path] = (w.astype(jnp.float32) + dw).astype(mod["weight"].dtype)
            applied += 1
        if tree and applied == 0:
            raise ValueError(
                f"LoRA adapter {name!r} matched no module in the model "
                f"(unresolved paths, e.g. {missing[:3]}); wrong model or an "
                "unresolved kohya key format"
            )
        if missing:
            warnings.warn(
                f"LoRA adapter {name!r}: {len(missing)}/{len(tree)} module "
                f"paths not present in the model (e.g. {missing[:3]}); "
                "those factors were skipped"
            )
    for path, w in touched.items():
        mod = dict(_get_path(out, path))
        mod["weight"] = w
        out = _set_path(out, path, mod)
    return out


def apply_lora_for_training(params: dict, lora: dict, scale: float = 1.0) -> dict:
    """Differentiable fuse for the train step: base params are constants,
    gradients flow to the factors through delta_w."""
    out = params
    for path, factors in lora.items():
        mod = _get_path(params, path)
        w = mod["weight"]
        dw = delta_w(factors, scale)
        new_mod = dict(mod)
        new_mod["weight"] = (w.astype(jnp.float32) + dw).astype(w.dtype)
        out = _set_path(out, path, new_mod)
    return out


def num_lora_params(lora: dict) -> int:
    return sum(
        int(np.prod(v.shape))
        for f in lora.values()
        for k, v in f.items()
        if k in ("down", "up")
    )
