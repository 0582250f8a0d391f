"""Fast host-side random params for benches/compile checks.

Full-size init via jax.random issues hundreds of separate device programs
(one per differently-shaped leaf), which is pathologically slow through this
environment's remote-compile TPU tunnel.  For benchmarking and compile
checks the values don't matter — generate on host with numpy in one pass and
transfer once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_params_like(shape_tree, dtype=jnp.bfloat16, scale: float = 0.02, seed: int = 0):
    """Shape tree (e.g. from jax.eval_shape) -> numpy-initialized params."""
    rng = np.random.default_rng(seed)

    def make(leaf):
        shape = tuple(leaf.shape)
        if len(shape) == 1:  # norm scales / biases: ones keep norms sane
            arr = np.ones(shape, np.float32)
        else:
            fan_in = shape[-2] if len(shape) == 2 else int(np.prod(shape[:-1]))
            arr = rng.standard_normal(shape).astype(np.float32) * min(
                scale, fan_in**-0.5
            )
        return jnp.asarray(arr, dtype)

    return jax.tree_util.tree_map(make, shape_tree)


def random_model_params(init_fn, config, dtype=jnp.bfloat16, seed: int = 0):
    shapes = jax.eval_shape(lambda k: init_fn(k, config), jax.random.key(0))
    return random_params_like(shapes, dtype=dtype, seed=seed)
