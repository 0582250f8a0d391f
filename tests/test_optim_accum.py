"""multi_steps_lowmem (bf16 gradient accumulator) vs optax.MultiSteps.

The low-memory accumulator exists because the fp32 acc_grads tree (89 MiB
at SDXL rank-16) is exactly what tips the SDXL 1024² batch-1+accum step
over the 16 GB chip (benchmarks/bench_train_sdxl.py, round-4 record).
Semantics must match MultiSteps: zero updates on non-boundary steps, the
inner chain sees the MEAN gradient on the k-th, state cycles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stablediffusion_tpu.train.optim import (
    make_lr_schedule,
    make_optimizer,
    multi_steps_lowmem,
)

K = 4


def _tree(seed, scale=1.0):
    r = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(r.standard_normal((8, 16)) * scale, jnp.float32),
        "b": jnp.asarray(r.standard_normal((16,)) * scale, jnp.float32),
    }


def _run(tx, params, grads_list):
    state = tx.init(params)
    out = []
    for g in grads_list:
        updates, state = tx.update(g, state, params)
        out.append(updates)
        params = optax.apply_updates(params, updates)
    return params, out


@pytest.mark.parametrize("acc_dtype", [jnp.float32, jnp.bfloat16])
def test_lowmem_matches_multisteps(acc_dtype):
    inner = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-2),
    )
    ref_tx = optax.MultiSteps(inner, every_k_schedule=K)
    low_tx = multi_steps_lowmem(inner, K, acc_dtype)

    params = _tree(0)
    grads = [_tree(10 + i, scale=0.1) for i in range(2 * K)]

    ref_params, ref_updates = _run(ref_tx, params, grads)
    low_params, low_updates = _run(low_tx, params, grads)

    # non-boundary steps emit exactly zero updates in both
    for i in (0, 1, 2, K, K + 1):
        assert all(
            float(jnp.abs(u).max()) == 0.0
            for u in jax.tree.leaves(low_updates[i])
        ), i
    tol = 1e-6 if acc_dtype == jnp.float32 else 5e-2
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(low_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol,
                                   rtol=tol)


def test_lowmem_state_memory_is_bf16():
    tx = multi_steps_lowmem(optax.sgd(1e-2), K, jnp.bfloat16)
    state = tx.init(_tree(0))
    for leaf in jax.tree.leaves(state.acc):
        assert leaf.dtype == jnp.bfloat16


def test_make_optimizer_accum_dtype_plumbing():
    sched = make_lr_schedule("constant", 1e-4)
    tx = make_optimizer(sched, grad_accum_steps=K, accum_dtype="bf16")
    state = tx.init(_tree(0))
    assert all(
        l.dtype == jnp.bfloat16 for l in jax.tree.leaves(state.acc)
    )
    # under jit with donated state (the train-step pattern)
    params = _tree(0)

    @jax.jit
    def step(p, s, g):
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for i in range(K):
        params, state = step(params, state, _tree(20 + i, 0.1))
    assert int(state.mini_step) == 0  # cycled back after k steps
