"""Training-state checkpoints: save/rotate/resume (SURVEY.md §5.4).

The reference rotates `checkpoint-{step}` dirs via accelerator.save_state
with --checkpoints_total_limit and resumes by scanning for the latest
(train_text_to_image_lora.py:884-907,766-791).  Same layout here, with orbax
as the serializer for (lora, opt_state, step, rng).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Tuple

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    output_dir: str,
    step: int,
    state: Any,
    total_limit: Optional[int] = None,
) -> str:
    """Write checkpoint-{step} and rotate old ones."""
    os.makedirs(output_dir, exist_ok=True)
    if total_limit is not None:
        existing = sorted(
            (int(m.group(1)), d)
            for d in os.listdir(output_dir)
            if (m := _CKPT_RE.match(d))
        )
        while len(existing) >= total_limit:
            _, oldest = existing.pop(0)
            shutil.rmtree(os.path.join(output_dir, oldest), ignore_errors=True)
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    _checkpointer().save(path, state, force=True)
    return path


def latest_checkpoint(output_dir: str) -> Optional[Tuple[int, str]]:
    """(step, path) of the newest checkpoint-{N}, or None."""
    if not os.path.isdir(output_dir):
        return None
    found = sorted(
        (int(m.group(1)), d)
        for d in os.listdir(output_dir)
        if (m := _CKPT_RE.match(d))
    )
    if not found:
        return None
    step, d = found[-1]
    return step, os.path.abspath(os.path.join(output_dir, d))


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore with `template`'s structure/shardings."""
    return _checkpointer().restore(path, item=template)


def resolve_resume(arg: Optional[str], output_dir: str) -> Optional[Tuple[int, str]]:
    """'latest' -> newest checkpoint-{N} under output_dir; an explicit
    .../checkpoint-{N} path -> (N, path); else None.  Shared by all trainers
    (the 'path | latest' resume contract of the diffusers scripts)."""
    if not arg:
        return None
    if arg == "latest":
        return latest_checkpoint(output_dir)
    import re

    m = re.search(r"checkpoint-(\d+)$", arg)
    return (int(m.group(1)), arg) if m else None
