"""Seeded RNG discipline.

The reference uses torch.Generator + diffusers randn_tensor with seed-in /
seed-out serving semantics (ref: sd_unified_pipeline.py:764-787,
handler_logic.py:94-98), including per-sample generator lists.  Here a seed is
a `jax.random.key`; per-sample generators become a batch of folded keys, and
every consumer takes an explicit key (pure functional RNG — no global state).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

SeedLike = Union[int, jax.Array, None]


def as_key(seed: SeedLike) -> jax.Array:
    """Coerce an int seed / key / None into a PRNG key."""
    if seed is None:
        seed = 0
    if isinstance(seed, int):
        return jax.random.key(seed)
    if isinstance(seed, jax.Array) and jnp.issubdtype(seed.dtype, jax.dtypes.prng_key):
        return seed
    return jax.random.key(int(seed))


def randn(
    key: jax.Array,
    shape: Sequence[int],
    dtype=jnp.float32,
    per_sample_keys: Optional[jax.Array] = None,
) -> jax.Array:
    """randn_tensor equivalent (ref: sd_unified_pipeline.py:771-781).

    With `per_sample_keys` (shape [B] batch of keys) each sample draws from
    its own stream — the analog of diffusers' per-sample generator lists.
    Sampling is done in fp32 then cast, matching the reference's behavior of
    sampling at full precision.
    """
    if per_sample_keys is not None:
        sample_shape = tuple(shape)[1:]
        noise = jax.vmap(lambda k: jax.random.normal(k, sample_shape, jnp.float32))(
            per_sample_keys
        )
    else:
        noise = jax.random.normal(key, tuple(shape), jnp.float32)
    return noise.astype(dtype)


def split_for_batch(key: jax.Array, batch: int) -> jax.Array:
    """A batch of per-sample keys (generator-list analog)."""
    return jax.random.split(key, batch)
