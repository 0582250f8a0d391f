"""Mixed int8 A/B: does wide-N-only w8a8 beat fp/w8/full-w8a8 on SDXL?

RESULTS.json["int8_mxu"] showed the int8-MXU path only wins wide-N shapes
(K1280->N10240 +20%; small-K/N neutral-to-worse) — so full w8a8 mixes wins
and losses.  quantize_params(a8_min_out=N) now emits w8a8 structure only
for layers with >= N output channels (w8 elsewhere, free at dispatch:
ops/quant.py per-leaf keys).  This bench times the REAL SDXL B=1 1024²
denoise scan for fp / w8 / w8a8 / mixed(a8_min_out in {2048, 1280}) —
steady-state, compile excluded, timed by scalar fetch.

Output -> RESULTS.json["int8_mixed_sdxl"].
Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bench_int8_mixed.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 4
ITERS = 8  # 8 x 4-step scans per timing sample; 3 samples, min


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sdxl", choices=("sd15", "sdxl"))
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.core.config import (
        SD15_UNET,
        SDXL_UNET,
        SchedulerConfig,
    )
    from stablediffusion_tpu.models import unet
    from stablediffusion_tpu.ops.quant import quantize_params
    from stablediffusion_tpu.pipelines.unified import _denoise
    from stablediffusion_tpu.schedulers import make_scheduler
    from stablediffusion_tpu.utils.bench_utils import record_result
    from stablediffusion_tpu.utils.testing import random_model_params

    dt = jnp.bfloat16
    B = args.batch
    sdxl = args.model == "sdxl"
    cfgobj = SDXL_UNET if sdxl else SD15_UNET
    lat_hw = 128 if sdxl else 64
    ctx_dim = 2048 if sdxl else 768
    fp = random_model_params(unet.init_params, cfgobj, dtype=dt)
    scheduler = make_scheduler("DDIM", SchedulerConfig())
    plan = scheduler.plan(STEPS)
    latents = jax.random.normal(jax.random.key(0), (B, lat_hw, lat_hw, 4), dt)
    embeds = jax.random.normal(jax.random.key(1), (2 * B, 77, ctx_dim), dt)
    added = None
    if sdxl:
        added = {
            "text_embeds": jax.random.normal(
                jax.random.key(3), (2 * B, 1280), dt),
            "time_ids": jnp.tile(
                jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32),
                (2 * B, 1)),
        }
    keys = jax.random.split(jax.random.key(2), STEPS)
    kw = dict(unet_config=cfgobj, scheduler=scheduler, do_cfg=True,
              inpaint_mode="none", use_rescale=False)

    def run(params, lat):
        return _denoise(params, lat, embeds, plan, keys,
                        7.5, 0.0, added, None, None, None, None, **kw)

    variants = {
        "fp": fp,
        "w8": quantize_params(fp, "w8"),
        "w8a8": quantize_params(fp, "w8a8"),
        # SDXL out-channel spectrum: convs/attention <= 1280, GEGLU ff.in
        # 10240 — so 2048 isolates the ff.in projections (the +20% int8_mxu
        # shape) and 1280 adds every width-1280 linear/conv
        "mixed_a8min2048": quantize_params(fp, "w8a8", a8_min_out=2048),
        "mixed_a8min1280": quantize_params(fp, "w8a8", a8_min_out=1280),
    }
    rows = {}
    for name, params in variants.items():
        lat = latents
        lat = run(params, lat)  # compile + warm
        float(jnp.mean(lat))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            cur = latents
            for _ in range(ITERS):
                cur = run(params, cur)  # carry feedback forces re-exec
            float(jnp.mean(cur))
            samples.append((time.perf_counter() - t0) / (ITERS * STEPS))
        rows[name] = {"ms_per_step": round(min(samples) * 1e3, 3)}
        print(json.dumps({name: rows[name]}), flush=True)

    base = rows["fp"]["ms_per_step"]
    for name, row in rows.items():
        row["vs_fp"] = round(base / row["ms_per_step"], 4)

    px = lat_hw * 8
    payload = {
        "metric": f"int8_mixed_{args.model}_b{B}_denoise",
        "unit": f"ms/step (B={B} {px}², 4-step scan, min of 3x8 iters)",
        "value": rows["mixed_a8min2048"]["ms_per_step"],
        "detail": rows,
    }
    record_result(f"int8_mixed_{args.model}" + (f"_b{B}" if B != 1 else ""),
                  payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
