"""int8 quantization quality artifact (same honesty bar as DeepCache's).

`SDModel.quantize("w8a8"|"w8")` is an APPROXIMATE opt-in (ops/quant.py);
this bench records its fidelity column: fixed-seed MSE / PSNR of the decoded
image vs the exact fp run, per mode, plus end-to-end wall time per mode so
the TPU run doubles as the speed A/B (the int8-MXU question itself is
isolated in bench_int8.py).

Caveat recorded in the artifact: weights are random (no hub access in this
environment), so the numbers measure the mechanism's quantization error
through the real architecture, not a trained model's perceptual quality —
the mode ordering (w8 tighter than w8a8, both far above usable PSNR) is the
decision signal.

Results -> RESULTS.json["quant_quality" | "quant_quality_tiny"].
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = (None, "w8", "w8a8", "w8a8:2048")  # last = mixed (wide-N int8 MXU)


def _psnr(mse: float) -> float:
    import math

    return float("inf") if mse == 0 else 10.0 * math.log10(1.0 / mse)


def run_model(name: str, tiny: bool, steps: int):
    import numpy as np

    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )

    if tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from helpers import make_tiny_model

        model, size, min_size = make_tiny_model(name), 64, 1
    else:
        from stablediffusion_tpu.utils.testing import random_full_model

        model, size = random_full_model(name), (512 if name == "sd15" else 1024)
        min_size = 65536

    pipe = StableDiffusionUnifiedPipeline()
    rows = {}
    ref = None
    for mode in MODES:
        model.quantize(mode, min_size=min_size)
        t0 = time.perf_counter()
        out = pipe(
            model, prompt="a photograph of an astronaut riding a horse",
            negative_prompt="blurry", height=size, width=size,
            num_inference_steps=steps, seed=1234, guidance_scale=7.0,
        )
        img = np.asarray(out.images, np.float64)
        dt = time.perf_counter() - t0  # incl. compile
        key = mode or "fp"
        if mode is None:
            ref = img
            rows[key] = {"mse_vs_fp": 0.0, "psnr_db": "ref"}
        else:
            mse = float(np.mean((img - ref) ** 2))
            rows[key] = {
                "mse_vs_fp": round(mse, 8),
                "psnr_db": round(_psnr(mse), 2),
            }
        rows[key]["wall_sec_incl_compile"] = round(dt, 2)
        print(json.dumps({name: {key: rows[key]}}), flush=True)
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
        "metric": "int8_quant_quality_vs_fp",
        "unit": "psnr_db vs fp (fixed seed)",
        "value": 0,
        "weights": "random (architecture-true quantization error; "
                   "mode ordering is the signal)",
        "detail": detail,
    }
    record_result(
        "quant_quality" + ("_tiny" if args.tiny else ""), payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
