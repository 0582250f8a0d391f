"""Precision parity (BASELINE metric 3 methodology, self-anchored).

diffusers is absent in this environment (see benchmarks/parity_harness.py for
the cross-framework trace exchange); here the same per-step-MSE methodology
validates that the bf16 TPU serving path tracks the fp32 path within tight
bounds — the precision half of "per-step MSE parity"."""

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.models import unet as unet_model

from helpers import make_tiny_model


def _trace(model, dtype, steps=4, cfg=7.5):
    scheduler = model.scheduler
    plan = scheduler.plan(steps)
    rng = np.random.default_rng(0)
    lat0 = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    emb = rng.standard_normal(
        (2, 77, model.unet_config.cross_attention_dim)
    ).astype(np.float32)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), model.unet_params)
    lat = jnp.asarray(lat0, dtype) * plan.init_noise_sigma
    state = scheduler.init_state(plan, lat.shape)
    out = []
    for i in range(plan.num_steps):
        x = jnp.concatenate([lat, lat], 0)
        x = scheduler.scale_model_input(plan, x, i)
        pred = unet_model.apply(
            params, model.unet_config, x, plan.timesteps[i], jnp.asarray(emb, dtype)
        )
        u, t = jnp.split(pred, 2, 0)
        lat, state = scheduler.step(
            plan, state, jnp.asarray(i), u + cfg * (t - u), lat,
            key=jax.random.key(i),
        )
        out.append(np.asarray(lat, np.float32))
    return np.stack(out)


def test_bf16_tracks_fp32_per_step():
    model = make_tiny_model("sd15")
    t32 = _trace(model, jnp.float32)
    tbf = _trace(model, jnp.bfloat16)
    for i, (a, b) in enumerate(zip(t32, tbf)):
        rel = float(np.mean((a - b) ** 2) / np.mean(a**2))
        assert rel < 1e-2, f"step {i}: relative MSE {rel}"


def test_fp32_trace_deterministic():
    model = make_tiny_model("sd15")
    a = _trace(model, jnp.float32)
    b = _trace(model, jnp.float32)
    np.testing.assert_array_equal(a, b)
