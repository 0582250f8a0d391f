"""Mixed-precision policy.

The reference serves fp16 weights on CUDA and trains with fp16/bf16 frozen
weights + fp32 trainables + an always-fp32 VAE
(ref: train_lora_pipeline.py:229-241, models/stable_diffusion.py:113-146).
On TPU the native fast dtype is bfloat16 and no loss scaling is needed, so the
policy is: bf16 params/activations on the hot path, fp32 for norm statistics,
softmax accumulation and optimizer state, with an fp32 policy available for
parity testing.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    # dtype for numerically sensitive reductions (norm stats, softmax)
    reduce_dtype: jnp.dtype

    def cast_params(self, params):
        def cast(x):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.param_dtype)
            return x

        return jax.tree_util.tree_map(cast, params)

    def cast_compute(self, *xs):
        out = tuple(
            x.astype(self.compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
            for x in xs
        )
        return out[0] if len(out) == 1 else out


DEFAULT_POLICY = Policy(
    param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16, reduce_dtype=jnp.float32
)
FP32_POLICY = Policy(
    param_dtype=jnp.float32, compute_dtype=jnp.float32, reduce_dtype=jnp.float32
)
