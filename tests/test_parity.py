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


def test_full_denoise_loop_matches_torch_mirror():
    """Integration anchor for BASELINE metric 3: the ENTIRE compiled denoise
    scan (CFG combine + DDIM steps + UNet forwards, pipelines/unified._denoise)
    against an independent torch loop — torch-mirror UNet + DDIM written
    directly from Song et al.'s update rule with diffusers' scaled_linear
    betas.  Identical injected latents; per-step MSE must vanish in fp32.
    Ref loop being mirrored: sd_unified_pipeline.py:465-507."""
    import dataclasses

    import torch

    from stablediffusion_tpu.core.config import SchedulerConfig, tiny_unet_config
    from stablediffusion_tpu.pipelines.unified import _denoise
    from stablediffusion_tpu.schedulers import make_scheduler

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_torch_mirror import MirrorUNet, _nchw, _params_from_torch

    torch.manual_seed(0)
    cfg = tiny_unet_config()
    mirror = MirrorUNet(cfg).eval()
    params = _params_from_torch(mirror)

    STEPS, G = 4, 7.5
    rng = np.random.default_rng(5)
    lat0 = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    emb = rng.standard_normal((2, 77, cfg.cross_attention_dim)).astype(np.float32)

    scheduler = make_scheduler("DDIM", SchedulerConfig())
    plan = scheduler.plan(STEPS)
    keys = jax.random.split(jax.random.key(0), STEPS)
    ours = _denoise(
        params, jnp.asarray(lat0), jnp.asarray(emb), plan, keys,
        G, 0.0, None, None, None, None, None,
        unet_config=cfg, scheduler=scheduler, do_cfg=True,
        inpaint_mode="none", use_rescale=False,
    )

    # independent torch loop: scaled_linear betas, leading grid + offset 1,
    # eta=0 DDIM, final_alpha = alphas_cumprod[0] (set_alpha_to_one=False)
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)
    ratio = 1000 // STEPS
    ts = (np.arange(STEPS) * ratio)[::-1] + 1
    np.testing.assert_array_equal(np.asarray(plan.timesteps), ts)

    x = torch.from_numpy(lat0)
    with torch.no_grad():
        for t in ts:
            xin = _nchw(np.concatenate([x.numpy(), x.numpy()], 0))
            pred = mirror(
                xin, torch.tensor([float(t)] * 2),
                torch.from_numpy(emb),
            )
            u, c = pred.chunk(2, 0)
            eps = u + G * (c - u)
            prev_t = int(t) - ratio
            ac_t, ac_prev = ac[t], (ac[prev_t] if prev_t >= 0 else ac[0])
            x0 = (x - float(np.sqrt(1 - ac_t)) * eps.permute(0, 2, 3, 1)) / float(
                np.sqrt(ac_t)
            )
            x = float(np.sqrt(ac_prev)) * x0 + float(
                np.sqrt(1 - ac_prev)
            ) * eps.permute(0, 2, 3, 1)

    theirs = x.numpy()
    mse = float(np.mean((np.asarray(ours, np.float32) - theirs) ** 2))
    assert mse < 1e-8, f"full-loop MSE vs independent torch loop: {mse}"
