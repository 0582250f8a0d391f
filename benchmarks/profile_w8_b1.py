"""Why does w8 (weight-only int8) cost ~19% at SD1.5 batch-1?

bench_coldstart measured warm 512² images at 0.58 s fp vs 0.69 s w8 while
the microbench said weight-only dequant ≈ bf16.  Profile the real B=1
denoise step fp vs w8 and diff the category split: if the loss shows up as
extra elementwise/convert time ~proportional to weight bytes, XLA is
dequantizing tensors into fresh HBM buffers each step (int8 halves the
RESIDENT bytes but not the READ bytes + adds a write); that makes w8 a
capacity/cold-start feature at batch 1, not a bandwidth win.

Output -> RESULTS.json["w8_b1_profile"].
Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/profile_w8_b1.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_b1 import STEPS, analyze  # noqa: E402

B = 1


def run_and_capture(quant: bool):
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix=f"xprof_w8_{quant}_")
    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.core.config import SD15_UNET, SchedulerConfig
    from stablediffusion_tpu.models import unet
    from stablediffusion_tpu.pipelines.unified import _denoise
    from stablediffusion_tpu.schedulers import make_scheduler
    from stablediffusion_tpu.utils.observability import profile_to
    from stablediffusion_tpu.utils.testing import random_model_params

    dt = jnp.bfloat16
    params = random_model_params(unet.init_params, SD15_UNET, dtype=dt)
    if quant:
        from stablediffusion_tpu.ops.quant import quantize_params

        params = quantize_params(params, "w8")
    scheduler = make_scheduler("DDIM", SchedulerConfig())
    plan = scheduler.plan(STEPS)
    latents = jax.random.normal(jax.random.key(0), (B, 64, 64, 4), dt)
    embeds = jax.random.normal(jax.random.key(1), (2 * B, 77, 768), dt)
    keys = jax.random.split(jax.random.key(2), STEPS)
    args = (params, latents, embeds, plan, keys,
            7.5, 0.0, None, None, None, None, None)
    kw = dict(unet_config=SD15_UNET, scheduler=scheduler, do_cfg=True,
              inpaint_mode="none", use_rescale=False)

    float(jnp.mean(_denoise(*args, **kw)))  # compile + warm
    with profile_to(tmpdir):
        float(jnp.mean(_denoise(*args, **kw)))
    return tmpdir


def main():
    from stablediffusion_tpu.utils.bench_utils import record_result

    detail = {}
    for quant in (False, True):
        key = "w8" if quant else "fp"
        detail[key] = analyze(run_and_capture(quant), B)
        print(json.dumps({key: detail[key]}), flush=True)

    payload = {
        "metric": "w8_b1_denoise_profile",
        "unit": "ms/step category split (B=1, 512², 4-step scan)",
        "value": detail["w8"].get("busy_ms_per_step", 0),
        "detail": detail,
    }
    record_result("w8_b1_profile", payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
