"""SD3 int8 quality artifact — completes the quant_quality table's third
family (bench_quant_quality covers SD1.5/SDXL through the full pipeline).

There is no full-size random SD3Model helper (tokenizers are external
assets), so this measures what quantization actually touches: the MMDiT
denoise scan + VAE decode at fixed random conditioning embeddings and fixed
seed, per mode vs fp — the same decoded-image MSE/PSNR definition as the
other families.  Rows are recorded INCREMENTALLY (one record_result per
completed mode) so a partial run still lands.

Results -> RESULTS.json["quant_quality_sd3"].
Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bench_quant_quality_sd3.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 28
MODES = (None, "w8a8:2048", "w8", "w8a8")  # mixed first: its program is
# already in the persistent cache from bench_sd3's mixed run


def main():
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stablediffusion_tpu.core.config import (
        SD3_MEDIUM,
        SD3_VAE,
        SchedulerConfig,
    )
    from stablediffusion_tpu.models import mmdit, vae
    from stablediffusion_tpu.ops.quant import quantize_params
    from stablediffusion_tpu.pipelines.sd3 import (
        SD3Model,
        _denoise_sd3,
        _sd3_vae_decode,
    )
    from stablediffusion_tpu.schedulers import FlowMatchEulerScheduler
    from stablediffusion_tpu.utils.bench_utils import record_result
    from stablediffusion_tpu.utils.testing import random_model_params

    dt = jnp.bfloat16
    B = 1
    fp = random_model_params(mmdit.init_params, SD3_MEDIUM, dtype=dt)
    vae_params = random_model_params(vae.init_params, SD3_VAE,
                                     dtype=jnp.float32)
    scheduler = FlowMatchEulerScheduler(SchedulerConfig(shift=3.0))
    plan = scheduler.plan(STEPS)
    latents = jax.random.normal(jax.random.key(0), (B, 128, 128, 16), dt)
    embeds = jax.random.normal(jax.random.key(1), (2 * B, 333, 4096), dt)
    pooled = jax.random.normal(jax.random.key(2), (2 * B, 2048), dt)

    def run(params):
        lat = _denoise_sd3(
            params, latents, embeds, pooled, plan,
            jnp.asarray(7.0, jnp.float32),
            config=SD3_MEDIUM, scheduler=scheduler, do_cfg=True,
        )
        return _sd3_vae_decode(vae_params, lat, config=SD3_VAE)

    detail = {}
    ref = None
    for mode in MODES:
        params = fp if mode is None else quantize_params(
            fp, mode, skip_keys=SD3Model._QUANT_SKIP)
        t0 = time.perf_counter()
        img = np.asarray(run(params), np.float64)
        dtau = time.perf_counter() - t0
        key = mode or "fp"
        if mode is None:
            ref = img
            detail[key] = {"mse_vs_fp": 0.0, "psnr_db": "ref"}
        else:
            mse = float(np.mean((img - ref) ** 2))
            psnr = float("inf") if mse == 0 else 10 * math.log10(1.0 / mse)
            detail[key] = {"mse_vs_fp": round(mse, 9),
                           "psnr_db": round(psnr, 2)}
        detail[key]["wall_sec_incl_compile"] = round(dtau, 2)
        print(json.dumps({key: detail[key]}), flush=True)
        record_result("quant_quality_sd3", {
            "metric": "int8_quant_quality_vs_fp_sd3",
            "unit": "psnr_db vs fp (fixed seed + fixed random conditioning)",
            "value": 0,
            "scope": f"SD3-medium 1024² {STEPS}-step denoise+decode; "
                     "random weights/conditioning (mechanism error, "
                     "ordering is the signal); incremental record",
            "detail": dict(detail),
        })


if __name__ == "__main__":
    main()
