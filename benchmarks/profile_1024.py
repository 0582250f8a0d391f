"""SD1.5 1024² leaf-cost profile (round-4 verdict item 5: the 35.4%-MFU
high-res regime had no recorded ceiling argument, unlike batch-1 512² which
got `b1_occupancy`).

Profiles the real `pipelines.unified._denoise` scan at 1024² (latent 128²,
self-attention S=16384 at D=40) and classifies device trace events into op
categories, exactly like profile_b1.py.  The category split feeds the
lane-padding ceiling analysis recorded alongside
(RESULTS.json["sd15_1024_occupancy"]): at D=40 every dense-MXU attention
formulation is bounded by 40/128 of peak (the contraction depth pads to the
128-lane MXU; block-diagonal multi-head packings compute the SAME zeros —
2/3 of a 3-head 120-lane packed tile's products are structural zeros, see
ops/flash_attention.py round-4 kill note), and the library flash kernel
already measures within ~4% of the best dense kernel tried (smalld,
RESULTS.json["longkv_attention"]).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_b1 import analyze  # same categorizer/trace parser

STEPS = 4


def run_and_capture(B: int, res: int = 1024):
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix=f"xprof_{res}_b{B}_")
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
    scheduler = make_scheduler("DDIM", SchedulerConfig())
    plan = scheduler.plan(STEPS)
    lat = res // 8
    latents = jax.random.normal(jax.random.key(0), (B, lat, lat, 4), dt)
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
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache
    from stablediffusion_tpu.utils.bench_utils import record_result

    enable_compilation_cache()
    d = run_and_capture(1)
    row = analyze(d, 1)
    print(json.dumps(row), flush=True)

    # quantified lane-padding ceiling for the attention leaf (B=1 profile;
    # the pipeline runs CFG so the attention batch is 2):
    # FLOPs(self-attn L1) = 4*B*H*S^2*D with B=2,H=8,S=16384,D=40
    flops_l1 = 4 * 2 * 8 * 16384**2 * 40
    peak = 197e12  # v5e bf16
    bound_tf = peak * 40 / 128 / 1e12
    floor_ms = flops_l1 / (bound_tf * 1e12) * 1e3
    measured_ms = 16.67  # RESULTS.json["longkv_attention"]["B2_S16384_D40"]
    analysis = {
        "attention_shape": "B2 H8 S16384 D40 (CFG batch at latent 128**2)",
        "lane_pad_bound_tf_s": round(bound_tf, 1),
        "lane_pad_floor_ms_per_l1_call": round(floor_ms, 2),
        "lib_flash_measured_ms": measured_ms,
        "lib_flash_vs_floor": round(measured_ms / floor_ms, 2),
        "why_no_packing_helps": (
            "the QK^T contraction depth IS the head dim (40): padded to the "
            "128-lane MXU, utilization <= 40/128 = 31% for ANY dense "
            "formulation.  A 3-head block-diagonal 120-lane packing performs "
            "BQ*120*3BKV MACs of which BQ*120*BKV are useful — the same 1/3 "
            "fraction; the zeros are computed either way.  The remaining "
            "measured-vs-floor gap is the online-softmax VPU work (exp over "
            "S^2 logits + rescale) that every flash variant pays; smalld "
            "(D-native tiles) measured within 4% of the library kernel "
            "before being killed (RESULTS.json['longkv_attention'])."
        ),
    }
    payload = {
        "metric": "sd15_1024px_occupancy_and_attention_ceiling",
        "value": 0,
        "unit": "ms/step by category",
        "detail": {"profile_b1": row, "attention_ceiling": analysis},
    }
    record_result("sd15_1024_occupancy", payload)
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
