"""Optimizer and LR-schedule factory (SURVEY.md D11).

The reference uses AdamW (+8-bit flag) and diffusers get_scheduler names
{constant, constant_with_warmup, linear, cosine, cosine_with_restarts,
polynomial} (train_lora_pipeline.py:283-315,353-358).  `--use_8bit_adam`
(reference: bitsandbytes AdamW8bit, train_text_to_image_lora.py:283-315)
is implemented natively as blockwise-quantized moments: int8 first moment
and uint8 second moment, both sqrt-companded against a per-256-block absmax
scale (moments span decades within a block; the sqrt map keeps relative
resolution at small values, standing in for bitsandbytes' dynamic-tree
quantile map, which XLA has no efficient lookup for).  Leaves smaller
than 4096 elements keep fp32 moments, matching bitsandbytes' min_8bit_size.
Moments drop from 8 bytes/param to ~2.03 (scales amortized over blocks).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
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


class _LowMemMultiStepsState(NamedTuple):
    mini_step: jnp.ndarray  # int32 scalar in [0, k)
    acc: Any  # grad-shaped tree in acc_dtype
    inner_state: Any


def multi_steps_lowmem(
    inner: optax.GradientTransformation,
    every_k: int,
    acc_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """optax.MultiSteps with a reduced-precision accumulator.

    The accumulator tree is grad-shaped fp32 in MultiSteps — on a
    borderline-full chip that tree is exactly what tips SDXL 1024² LoRA
    batch-1 + accumulation over 16 GB (acc_grads is 89 MiB at rank 16;
    the no-accum step fits).  Storing the running SUM in bf16 halves it.
    Precision: summing k<=16 like-magnitude gradients in bf16 loses
    ~2^-8 relative per add — noise well under SGD gradient noise; the
    mean is computed in fp32 at the boundary and the inner chain
    (clip/adam) runs fp32 as usual.  Opt-in via --accum_dtype bf16."""

    def init(params):
        return _LowMemMultiStepsState(
            mini_step=jnp.zeros([], jnp.int32),
            acc=jax.tree.map(
                lambda p: jnp.zeros(p.shape, acc_dtype), params
            ),
            inner_state=inner.init(params),
        )

    def update(grads, state, params=None, **extra):
        acc = jax.tree.map(
            lambda a, g: a + g.astype(acc_dtype), state.acc, grads
        )
        is_last = state.mini_step == every_k - 1

        def _emit(operand):
            acc_in, inner_state = operand
            mean = jax.tree.map(
                lambda a: a.astype(jnp.float32) / every_k, acc_in
            )
            updates, new_inner = inner.update(mean, inner_state, params)
            return (
                jax.tree.map(lambda u, g: u.astype(g.dtype), updates, grads),
                new_inner,
                jax.tree.map(jnp.zeros_like, acc_in),
            )

        def _skip(operand):
            acc_in, inner_state = operand
            return (
                jax.tree.map(jnp.zeros_like, grads),
                inner_state,
                acc_in,
            )

        updates, inner_state, acc = jax.lax.cond(
            is_last, _emit, _skip, (acc, state.inner_state)
        )
        return updates, _LowMemMultiStepsState(
            mini_step=(state.mini_step + 1) % every_k,
            acc=acc,
            inner_state=inner_state,
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr_schedule,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_eps: float = 1e-8,
    weight_decay: float = 1e-2,
    max_grad_norm: Optional[float] = 1.0,
    grad_accum_steps: int = 1,
    use_8bit: bool = False,
    accum_dtype: Optional[str] = None,  # None/"fp32" -> MultiSteps; "bf16"
) -> optax.GradientTransformation:
    if use_8bit:
        adam = optax.chain(
            scale_by_adam_8bit(b1=adam_beta1, b2=adam_beta2, eps=adam_eps),
            optax.add_decayed_weights(weight_decay,
                                      mask=lambda tree: _weight_mask(tree)),
            optax.scale_by_learning_rate(lr_schedule),
        )
    else:
        adam = optax.adamw(
            learning_rate=lr_schedule,
            b1=adam_beta1,
            b2=adam_beta2,
            eps=adam_eps,
            weight_decay=weight_decay,
            # no decay on the scalar alphas
            mask=lambda tree: _weight_mask(tree),
        )
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm) if max_grad_norm else optax.identity(),
        adam,
    )
    if grad_accum_steps > 1:
        if accum_dtype in ("bf16", "bfloat16"):
            tx = multi_steps_lowmem(tx, grad_accum_steps, jnp.bfloat16)
        else:
            tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def _weight_mask(tree):
    return jax.tree_util.tree_map(lambda x: getattr(x, "ndim", 0) >= 2, tree)


# ---------------------------------------------------------------------------
# Blockwise 8-bit Adam (reference `--use_8bit_adam` = bitsandbytes AdamW8bit)
# ---------------------------------------------------------------------------

BLOCK_SIZE = 256
MIN_QUANT_SIZE = 4096  # bitsandbytes min_8bit_size: smaller leaves stay fp32


class QuantizedMoment(NamedTuple):
    """One moment tensor stored as 8-bit codes + per-block fp32 scales.

    ``q`` is int8 (signed linear map, first moment) or uint8 (sqrt-companded
    map, second moment), shaped [nblocks, BLOCK_SIZE] over the flattened and
    zero-padded parameter.  ``scale`` is the per-block absmax, fp32 [nblocks].
    """

    q: jnp.ndarray
    scale: jnp.ndarray


def _blocked(x: jnp.ndarray) -> jnp.ndarray:
    flat = x.reshape(-1)
    pad = (-flat.size) % BLOCK_SIZE
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, BLOCK_SIZE)


def _quantize_m(x: jnp.ndarray) -> QuantizedMoment:
    xb = _blocked(x.astype(jnp.float32))
    scale = jnp.max(jnp.abs(xb), axis=1)
    frac = jnp.abs(xb) / jnp.maximum(scale, 1e-30)[:, None]
    q = jnp.sign(xb) * jnp.round(jnp.sqrt(frac) * 127.0)
    return QuantizedMoment(q.astype(jnp.int8), scale)


def _quantize_v(x: jnp.ndarray) -> QuantizedMoment:
    xb = _blocked(x.astype(jnp.float32))
    scale = jnp.max(xb, axis=1)
    q = jnp.round(jnp.sqrt(xb / jnp.maximum(scale, 1e-30)[:, None]) * 255.0)
    return QuantizedMoment(q.astype(jnp.uint8), scale)


def _dequantize(mom: QuantizedMoment, like: jnp.ndarray) -> jnp.ndarray:
    if mom.q.dtype == jnp.int8:
        frac = mom.q.astype(jnp.float32) / 127.0
        vals = jnp.sign(frac) * frac * frac * mom.scale[:, None]
    else:
        frac = mom.q.astype(jnp.float32) / 255.0
        vals = frac * frac * mom.scale[:, None]
    return vals.reshape(-1)[: like.size].reshape(like.shape)


def _is_qm(x) -> bool:
    return isinstance(x, QuantizedMoment)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: Any  # per-leaf: fp32 array (small leaves) or QuantizedMoment
    nu: Any


def scale_by_adam_8bit(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """optax.scale_by_adam with blockwise 8-bit moment storage.

    Moments are dequantized to fp32 inside the (jitted) update, advanced with
    the exact Adam recurrences + bias correction, and requantized — the only
    deviation from fp32 Adam is the per-step storage rounding: the sqrt
    companding makes it ~2/127 RELATIVE (value-proportional) down to an
    absolute floor of blockwise absmax/127².
    """

    def _init_moment(quantize):
        def init_one(p):
            z = jnp.zeros(p.shape, jnp.float32)
            return quantize(z) if p.size >= MIN_QUANT_SIZE else z

        return init_one

    def init_fn(params):
        mu = jax.tree_util.tree_map(_init_moment(_quantize_m), params)
        nu = jax.tree_util.tree_map(_init_moment(_quantize_v), params)
        return ScaleByAdam8bitState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c

        g_leaves, treedef = jax.tree_util.tree_flatten(updates)
        mu_leaves = treedef.flatten_up_to(state.mu)
        nu_leaves = treedef.flatten_up_to(state.nu)

        out_u, out_m, out_v = [], [], []
        for g, m_s, v_s in zip(g_leaves, mu_leaves, nu_leaves):
            g = g.astype(jnp.float32)
            m = _dequantize(m_s, g) if _is_qm(m_s) else m_s
            v = _dequantize(v_s, g) if _is_qm(v_s) else v_s
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            out_u.append(u)
            out_m.append(_quantize_m(m) if _is_qm(m_s) else m)
            out_v.append(_quantize_v(v) if _is_qm(v_s) else v)

        new_updates = jax.tree_util.tree_unflatten(treedef, out_u)
        new_mu = jax.tree_util.tree_unflatten(treedef, out_m)
        new_nu = jax.tree_util.tree_unflatten(treedef, out_v)
        return new_updates, ScaleByAdam8bitState(count, new_mu, new_nu)

    return optax.GradientTransformation(init_fn, update_fn)
