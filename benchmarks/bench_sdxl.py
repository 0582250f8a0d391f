"""SDXL 1024² p50 per-image latency on one chip (BASELINE metric 2).

Measures the 30-step CFG denoise scan + fp32 VAE decode at batch 1 with the
full-size SDXL UNet (random bf16 weights; identical FLOPs/traffic to real).
"""

import json
import os
import time

STEPS = 30


def main():
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.core.config import SDXL_UNET, SDXL_VAE, SchedulerConfig
    from stablediffusion_tpu.models import unet, vae
    from stablediffusion_tpu.pipelines.unified import _denoise, _vae_decode
    from stablediffusion_tpu.schedulers import make_scheduler
    from stablediffusion_tpu.utils.bench_utils import (
        aot_compile,
        compiled_cost,
        flops_fields,
        record_result,
    )
    from stablediffusion_tpu.utils.testing import random_model_params

    dt = jnp.bfloat16
    B = 1
    unet_params = random_model_params(unet.init_params, SDXL_UNET, dtype=dt)
    # opt-in approximate variant (SDTPU_BENCH_QUANTIZE=w8a8:2048 is the
    # batch-1 winner: 1.11x fp denoise, bench_int8_mixed.py); the default
    # run stays exact fp
    qmode = os.environ.get("SDTPU_BENCH_QUANTIZE")
    if qmode:
        from stablediffusion_tpu.ops.quant import quantize_params

        unet_params = quantize_params(unet_params, qmode)
    vae_params = random_model_params(vae.init_params, SDXL_VAE, dtype=jnp.float32)

    scheduler = make_scheduler("euler", SchedulerConfig())
    plan = scheduler.plan(STEPS)
    latents = jax.random.normal(jax.random.key(0), (B, 128, 128, 4), dt)
    embeds = jax.random.normal(jax.random.key(1), (2 * B, 77, 2048), dt)
    added = {
        "text_embeds": jax.random.normal(jax.random.key(2), (2 * B, 1280), dt),
        "time_ids": jnp.tile(
            jnp.asarray([[1024.0, 1024.0, 0, 0, 1024.0, 1024.0]]), (2 * B, 1)
        ),
    }
    keys = jax.random.split(jax.random.key(3), STEPS)

    den_args = (
        unet_params, latents, embeds, plan, keys, 7.0, 0.0, added,
        None, None, None, None,
    )
    den_kw = dict(
        unet_config=SDXL_UNET, scheduler=scheduler, do_cfg=True,
        inpaint_mode="none", use_rescale=False,
    )
    den_c = aot_compile(_denoise, *den_args, **den_kw)
    dec_c = aot_compile(
        _vae_decode, vae_params, latents, config=SDXL_VAE, force_upcast=True
    )
    # scan bodies are counted once by XLA cost analysis -> scale by trips
    flops = (compiled_cost(den_c).get("flops") or 0) * STEPS + (
        compiled_cost(dec_c).get("flops") or 0
    )

    def run():
        return dec_c(vae_params, den_c(*den_args))

    float(jnp.mean(run()))  # compile + warm (host fetch forces execution)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.mean(run()))
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    metric = "sdxl_1024px_30step_p50_latency"
    record_key = "sdxl_txt2img_p50"
    if qmode:
        metric += f"_int8_{qmode}"
        record_key += "_int8"
    payload = {
        "metric": metric,
        "value": round(p50, 3),
        "unit": "sec/image",
        "detail": {
            "times": [round(t, 3) for t in times],
            **flops_fields(flops, p50, per=B),
        },
    }
    record_result(record_key, payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
