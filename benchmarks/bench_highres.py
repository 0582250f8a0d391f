"""High-resolution generation latency — the regime the round-3 attention
dispatch unlocked.

At 1536² SDXL (and 1024² SD1.5) the UNet L1 self-attention runs at
S=36864/16384 tokens, where XLA's attention fusion materializes fp32
[B,H,S,S] logits (5-16 GiB — OOM or near-OOM), and the VAE decode mid-block
hits S at H=1, D=512 where only the hand streaming kernel can tile.  The
dispatch (ops/attention.py) routes both by default now; this bench records
that the full pipeline actually runs, and at what p50.

Usage: bench_highres.py [sdxl|sd15] [res] [tiled]
  tiled=1 decodes via models/vae.tiled_decode (the 2048²+ regime where the
  full decoder program exhausts HBM).
"""

import json
import os
import sys
import time

STEPS = 30


def main(model_name: str = "sdxl", res: int = 1536, tiled: bool = False):
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.core.config import (
        SD15_UNET,
        SD15_VAE,
        SDXL_UNET,
        SDXL_VAE,
        SchedulerConfig,
    )
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
    sdxl = model_name == "sdxl"
    ucfg, vcfg = (SDXL_UNET, SDXL_VAE) if sdxl else (SD15_UNET, SD15_VAE)
    ctx_dim = 2048 if sdxl else 768
    lat = res // 8

    unet_params = random_model_params(unet.init_params, ucfg, dtype=dt)
    # bf16 decode: the fp32 mid-block attention at S=(res/8)^2 would spend
    # 2x the streaming-kernel bandwidth for no range benefit
    vae_params = random_model_params(vae.init_params, vcfg, dtype=jnp.bfloat16)

    scheduler = make_scheduler("euler", SchedulerConfig())
    plan = scheduler.plan(STEPS)
    latents = jax.random.normal(jax.random.key(0), (B, lat, lat, 4), dt)
    embeds = jax.random.normal(jax.random.key(1), (2 * B, 77, ctx_dim), dt)
    added = None
    if sdxl:
        added = {
            "text_embeds": jax.random.normal(jax.random.key(2), (2 * B, 1280), dt),
            "time_ids": jnp.tile(
                jnp.asarray([[float(res), float(res), 0, 0, float(res), float(res)]]),
                (2 * B, 1),
            ),
        }
    keys = jax.random.split(jax.random.key(3), STEPS)

    den_args = (
        unet_params, latents, embeds, plan, keys, 7.0, 0.0, added,
        None, None, None, None,
    )
    den_kw = dict(
        unet_config=ucfg, scheduler=scheduler, do_cfg=True,
        inpaint_mode="none", use_rescale=False,
    )
    den_c = aot_compile(_denoise, *den_args, **den_kw)
    if tiled:
        from stablediffusion_tpu.models.vae import tiled_decode

        def dec_c(p, lat):
            z = lat.astype(jnp.bfloat16) / vcfg.scaling_factor
            return tiled_decode(p, vcfg, z)

        dec_flops = 0  # host-looped tile programs; not cost-analyzed
    else:
        dec_c = aot_compile(
            _vae_decode, vae_params, latents, config=vcfg, force_upcast=False
        )
        dec_flops = compiled_cost(dec_c).get("flops") or 0
    flops = (compiled_cost(den_c).get("flops") or 0) * STEPS + dec_flops

    def run():
        return dec_c(vae_params, den_c(*den_args))

    float(jnp.mean(run().astype(jnp.float32)))  # warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.mean(run().astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    # A/B runs under attention env overrides record under a distinct key so
    # they never clobber the canonical default-dispatch record
    ab = ""  # (round-4) the smalld A/B kernel was killed; suffix retired
    payload = {
        "metric": f"{model_name}_{res}px_{STEPS}step_p50_latency"
        + ("_tiledvae" if tiled else "") + ab,
        "value": round(p50, 3),
        "unit": "sec/image",
        "detail": {
            "times": [round(t, 3) for t in times],
            **flops_fields(flops, p50, per=B),
        },
    }
    record_result(
        f"{model_name}_{res}_txt2img_p50" + ("_tiled" if tiled else "") + ab,
        payload,
    )
    print(json.dumps(payload))


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "sdxl"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else (1536 if name == "sdxl" else 1024)
    tiled = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    main(name, res, tiled)
