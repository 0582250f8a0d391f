"""Optimizer and LR-schedule factory (SURVEY.md D11).

The reference uses AdamW (+8-bit flag) and diffusers get_scheduler names
{constant, constant_with_warmup, linear, cosine, cosine_with_restarts,
polynomial} (train_lora_pipeline.py:283-315,353-358).  8-bit Adam has no TPU
analog worth building for LoRA-sized states; the flag maps to plain AdamW.
"""

from __future__ import annotations

from typing import Optional

import optax


def make_lr_schedule(
    name: str,
    lr: float,
    warmup_steps: int = 0,
    total_steps: int = 10_000,
    num_cycles: float = 0.5,
    power: float = 1.0,
) -> optax.Schedule:
    import math

    warmup = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    rest = max(total_steps - warmup_steps, 1)
    if name == "constant":
        return optax.constant_schedule(lr)
    if name == "constant_with_warmup":
        return optax.join_schedules([warmup, optax.constant_schedule(lr)],
                                    [warmup_steps])
    if name == "linear":
        decay = optax.linear_schedule(lr, 0.0, rest)
        return optax.join_schedules([warmup, decay], [warmup_steps])
    if name == "cosine":
        decay = optax.cosine_decay_schedule(lr, rest)
        return optax.join_schedules([warmup, decay], [warmup_steps])
    if name == "cosine_with_restarts":
        n = max(int(num_cycles), 1)
        per = max(rest // n, 1)
        decay = optax.join_schedules(
            [optax.cosine_decay_schedule(lr, per) for _ in range(n)],
            [per * i for i in range(1, n)],
        )
        return optax.join_schedules([warmup, decay], [warmup_steps])
    if name == "polynomial":
        decay = optax.polynomial_schedule(lr, 0.0, power, rest)
        return optax.join_schedules([warmup, decay], [warmup_steps])
    raise ValueError(f"unknown lr schedule {name!r}")


def make_optimizer(
    lr_schedule,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_eps: float = 1e-8,
    weight_decay: float = 1e-2,
    max_grad_norm: Optional[float] = 1.0,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm) if max_grad_norm else optax.identity(),
        optax.adamw(
            learning_rate=lr_schedule,
            b1=adam_beta1,
            b2=adam_beta2,
            eps=adam_eps,
            weight_decay=weight_decay,
            # no decay on the scalar alphas
            mask=lambda tree: _weight_mask(tree),
        ),
    )
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def _weight_mask(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: getattr(x, "ndim", 0) >= 2, tree)
