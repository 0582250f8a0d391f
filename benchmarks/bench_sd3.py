"""SD3-medium 1024² p50 per-image latency on one chip (28-step CFG denoise
scan + fp32 VAE decode, batch 1, random bf16 weights — identical
FLOPs/traffic to real weights; text encoding excluded, as in bench.py)."""

import json
import os
import time

STEPS = 28


def main():
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.core.config import SD3_MEDIUM, SD3_VAE, SchedulerConfig
    from stablediffusion_tpu.models import mmdit, vae
    from stablediffusion_tpu.pipelines.sd3 import _denoise_sd3, _sd3_vae_decode
    from stablediffusion_tpu.schedulers.flow_match import FlowMatchEulerScheduler
    from stablediffusion_tpu.utils.bench_utils import (
        aot_compile,
        compiled_cost,
        flops_fields,
        record_result,
    )
    from stablediffusion_tpu.utils.testing import random_model_params

    dt = jnp.bfloat16
    B = 1
    tf_params = random_model_params(mmdit.init_params, SD3_MEDIUM, dtype=dt)
    # opt-in approximate int8 variant (same toggle as bench.py/bench_sdxl)
    qmode = os.environ.get("SDTPU_BENCH_QUANTIZE")
    if qmode:
        from stablediffusion_tpu.ops.quant import quantize_params
        from stablediffusion_tpu.pipelines.sd3 import SD3Model

        tf_params = quantize_params(tf_params, qmode,
                                    skip_keys=SD3Model._QUANT_SKIP)
    vae_params = random_model_params(vae.init_params, SD3_VAE, dtype=jnp.float32)

    scheduler = FlowMatchEulerScheduler(SchedulerConfig(shift=3.0))
    plan = scheduler.plan(STEPS)
    latents = jax.random.normal(jax.random.key(0), (B, 128, 128, 16), dt)
    # 77 CLIP + 256 T5 tokens, CFG doubled
    embeds = jax.random.normal(jax.random.key(1), (2 * B, 333, 4096), dt)
    pooled = jax.random.normal(jax.random.key(2), (2 * B, 2048), dt)

    den_args = (
        tf_params, latents, embeds, pooled, plan,
        jnp.asarray(7.0, jnp.float32),
    )
    den_kw = dict(config=SD3_MEDIUM, scheduler=scheduler, do_cfg=True)
    den_c = aot_compile(_denoise_sd3, *den_args, **den_kw)
    dec_c = aot_compile(_sd3_vae_decode, vae_params, latents, config=SD3_VAE)
    # scan bodies are counted once by XLA cost analysis -> scale by trips
    flops = (compiled_cost(den_c).get("flops") or 0) * STEPS + (
        compiled_cost(dec_c).get("flops") or 0
    )

    def run():
        img = dec_c(vae_params, den_c(*den_args))
        return float(jnp.mean(img.astype(jnp.float32)))

    run()  # warm up
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    payload = {
        "metric": "sd3m_1024px_28step_p50_latency"
        + (f"_int8_{qmode}" if qmode else ""),
        "value": round(p50, 3),
        "unit": "sec/image",
        "detail": {
            "times": [round(t, 3) for t in times],
            **flops_fields(flops, p50, per=B),
        },
    }
    record_result("sd3m_txt2img_p50" + ("_int8" if qmode else ""), payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
