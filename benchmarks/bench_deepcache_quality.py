"""DeepCache quality-vs-speed artifact (round-3 verdict item 7).

`cache_interval > 1` is an APPROXIMATE opt-in (pipelines/unified._denoise:
every interval's first step runs the full UNet and caches the deep feature
map; the rest run only the shallowest level against it).  The throughput
side was measured in round 2 (4.18 / 4.44 img/s at interval 2 / 3); this
bench adds the missing fidelity column: fixed-seed MSE and PSNR of the
decoded image vs the exact interval-1 result, per interval, for SD1.5 512²
and SDXL 1024².

Caveat recorded in the artifact: weights are random (no hub access in this
environment), so the numbers measure the mechanism's approximation error
through the real architecture/FLOPs, not a trained model's perceptual
quality — relative ordering across intervals is the decision signal.

Usage: python benchmarks/bench_deepcache_quality.py [--tiny] [--models sd15 sdxl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERVALS = (1, 2, 3, 5)


def _psnr(mse: float) -> float:
    import math

    return float("inf") if mse == 0 else 10.0 * math.log10(1.0 / mse)


def run_model(name: str, tiny: bool, steps: int):
    import jax.numpy as jnp
    import numpy as np

    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    if tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from helpers import make_tiny_model

        model, size = make_tiny_model(name), 64
    else:
        from stablediffusion_tpu.utils.testing import random_full_model

        model, size = random_full_model(name), (512 if name == "sd15" else 1024)

    pipe = StableDiffusionUnifiedPipeline()
    rows = {}
    ref = None
    for interval in INTERVALS:
        t0 = time.perf_counter()
        out = pipe(
            model, prompt="a photograph of an astronaut riding a horse",
            negative_prompt="blurry", height=size, width=size,
            num_inference_steps=steps, seed=1234, guidance_scale=7.0,
            cache_interval=interval,
        )
        img = np.asarray(out.images, np.float64)
        dt = time.perf_counter() - t0  # incl. compile on first interval
        if interval == 1:
            ref = img
            rows["interval1"] = {"mse_vs_interval1": 0.0, "psnr_db": "ref"}
        else:
            mse = float(np.mean((img - ref) ** 2))
            rows[f"interval{interval}"] = {
                "mse_vs_interval1": round(mse, 8),
                "psnr_db": round(_psnr(mse), 2),
            }
        rows[f"interval{interval}"]["wall_sec_incl_compile"] = round(dt, 2)
        print(json.dumps({name: {f"interval{interval}":
                                 rows[f"interval{interval}"]}}), flush=True)
    return {"size": size, "steps": steps, **rows}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--models", nargs="+", default=["sd15", "sdxl"])
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)
    if args.tiny:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from stablediffusion_tpu.utils.bench_utils import record_result

    detail = {}
    for name in args.models:
        detail[name] = run_model(name, args.tiny, args.steps)

    payload = {
        "metric": "deepcache_quality_vs_interval",
        "unit": "psnr_db vs interval-1 (fixed seed)",
        "value": 0,
        "weights": "random (architecture-true approximation error; "
                   "relative ordering is the signal)",
        "detail": detail,
    }
    record_result(
        "deepcache_quality" + ("_tiny" if args.tiny else ""), payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
