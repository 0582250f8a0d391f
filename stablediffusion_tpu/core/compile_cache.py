"""Persistent XLA compilation cache.

Serving cold-starts pay 30-60 s of XLA compilation per (shape, scheduler)
combination on TPU; enabling jax's persistent cache makes warm restarts
near-instant.  Enabled automatically by the serving worker and the train
CLI; directory from SDTPU_COMPILE_CACHE (default ~/.cache/sdtpu-xla).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> bool:
    global _ENABLED
    if _ENABLED:
        return True
    import jax

    path = path or os.environ.get(
        "SDTPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sdtpu-xla"),
    )
    try:
        # TPU-only, in its own subdirectory.  Two hard-won reasons:
        #  * cache keys can collide across backends here (remote axon TPU vs
        #    cpu) and deserializing a TPU executable in a CPU process
        #    SEGFAULTS (observed: CPU pytest crash reading a TPU bench entry);
        #  * executable (de)serialization on the CPU backend with the axon
        #    plugin co-registered segfaults nondeterministically too.
        # CPU compiles are cheap; the cache's value is TPU cold-starts.
        backend = jax.default_backend()
        if backend not in ("tpu", "axon"):
            logger.info("compilation cache skipped on %s backend", backend)
            return False
        path = os.path.join(path, backend)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
        logger.info("XLA compilation cache at %s", path)
    except Exception as e:  # pragma: no cover
        logger.warning("compilation cache unavailable: %s", e)
    return _ENABLED
