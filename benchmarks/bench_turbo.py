"""Combined opt-in turbo modes: DeepCache (cache_interval=2) x int8 (w8a8)
on the full SD1.5 512² 20-step serving span, batch 8 — are the two
approximate accelerations composable end-to-end?

Round-2 measured DeepCache alone at 4.18 img/s (interval 2) and round-4
int8 alone at 3.56 img/s (RESULTS.json["sd15_txt2img_int8"]); both are
independent subsystems (the cached-feature scan skips deep UNet levels;
quantization changes the leaf matmuls) so the product should compose.
Records fp+cache2 (same-session control of the round-2 number) and
w8a8+cache2 into RESULTS.json["sd15_turbo"].

Usage: python benchmarks/bench_turbo.py [--batch 8] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args(argv)

    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )
    from stablediffusion_tpu.utils.bench_utils import record_result
    from stablediffusion_tpu.utils.testing import random_full_model

    model = random_full_model("sd15")
    pipe = StableDiffusionUnifiedPipeline(do_cfg=True, output_type="uint8")
    kw = dict(
        prompt="a photograph of an astronaut riding a horse",
        num_images_per_prompt=args.batch,
        num_inference_steps=args.steps,
        guidance_scale=7.5,
        seed=0,
        cache_interval=2,
    )

    rows = {}
    for name, quant in (("fp_cache2", None), ("w8a8_cache2", "w8a8")):
        if quant:
            model.quantize(quant, expected_batch=args.batch)
        else:
            model.quantize(None)
        pipe(model, **kw)  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = pipe(model, **kw)
            assert out.images is not None
            times.append(time.perf_counter() - t0)
        best = min(times)
        rows[name] = {
            "sec_per_batch": round(best, 3),
            "images_per_sec": round(args.batch / best, 3),
        }
        print(json.dumps({name: rows[name]}), flush=True)

    payload = {
        "metric": "sd15_512px_20step_turbo_images_per_sec",
        "unit": "images/sec",
        "value": rows["w8a8_cache2"]["images_per_sec"],
        "detail": {
            "batch": args.batch,
            "steps": args.steps,
            "cache_interval": 2,
            "scope": "clip_encode+denoise+vae_decode (same span as bench.py)",
            "modes": rows,
            "references": {
                "fp_exact": "RESULTS.json['sd15_txt2img'] 3.23 img/s",
                "int8_only": "RESULTS.json['sd15_txt2img_int8'] 3.56 img/s",
                "deepcache_only_round2": "4.18 img/s at interval 2",
            },
            "note": (
                "both accelerations are opt-in approximate modes; quality "
                "artifacts: deepcache_quality (52.8-53.0 dB), quant_quality "
                "(52.4-52.8 dB) — errors compose roughly additively"
            ),
        },
    }
    record_result("sd15_turbo", payload)
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
