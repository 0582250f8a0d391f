"""torch-layout state dict -> TPU-canonical param pytree.

Checkpoints in the diffusers/transformers ecosystem store torch layouts:
linear kernels (out, in), conv kernels OIHW.  The TPU-canonical layouts are
(in, out) and HWIO (NHWC activations).  Conversion happens once at load so no
transposes remain in the compiled graphs.

Generic rule (holds for CLIP / UNet / VAE diffusers checkpoints):
  * 4-D ``*.weight``            -> conv kernel, OIHW -> HWIO
  * 2-D ``*.weight``            -> linear kernel, transpose, unless the path
                                   marks an embedding table
  * 1-D / everything else      -> unchanged
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Mapping

import jax.numpy as jnp
import numpy as np

# True embedding *tables* (row-per-id lookups) keep torch's (vocab, dim)
# layout.  Matching must be exact-suffix: UNet time_embedding.linear_1/2 and
# SDXL add_embedding.linear_1/2 are ordinary nn.Linear kernels that MUST be
# transposed (a substring 'embedding' match would skip them and crash on the
# non-square linear_1).
_EMBEDDING_TABLE_RE = re.compile(
    r"(^|\.)(token_embedding|position_embedding|class_embedding|shared"
    r"|embed_tokens|relative_attention_bias)"
    r"\.weight$"
)


def _is_embedding_table(key: str) -> bool:
    return _EMBEDDING_TABLE_RE.search(key) is not None


def nest(flat: Mapping[str, object]) -> dict:
    """'a.b.c' -> tree['a']['b']['c']."""
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def convert_tensor(key: str, arr: np.ndarray) -> np.ndarray:
    if not key.endswith(".weight"):
        return arr
    if arr.ndim == 4:
        return np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
    if arr.ndim == 2 and not _is_embedding_table(key):
        return np.transpose(arr)  # (out,in) -> (in,out)
    return arr


def convert_state_dict(
    flat: Mapping[str, np.ndarray],
    dtype=None,
    drop: Iterable[str] = ("position_ids",),
) -> dict:
    """Flat torch-layout dict -> nested jnp pytree in canonical layouts."""
    out: Dict[str, jnp.ndarray] = {}
    for key, value in flat.items():
        if any(key.endswith(d) for d in drop):
            continue
        arr = np.asarray(value)
        arr = convert_tensor(key, arr)
        jarr = jnp.asarray(arr, dtype=dtype) if dtype is not None else jnp.asarray(arr)
        out[key] = jarr
    return nest(out)


def flatten(tree: dict, prefix: str = "") -> Dict[str, object]:
    """Inverse of nest (used by savers)."""
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten(v, key))
        else:
            flat[key] = v
    return flat


def deconvert_tensor(key: str, arr: np.ndarray) -> np.ndarray:
    """Canonical layout -> torch layout (for ecosystem-interchange saving)."""
    if not key.endswith(".weight"):
        return arr
    if arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
    if arr.ndim == 2 and not _is_embedding_table(key):
        return np.transpose(arr)
    return arr
