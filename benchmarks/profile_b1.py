"""Batch-1 vs batch-8 occupancy investigation (round-3 verdict item 3).

Profiles the REAL serving program (`pipelines.unified._denoise`, 4-step scan
at 512²) at B=1 and B=8, then classifies device-side trace events into op
categories and reports, per batch:

  * device busy time per scan step and its category split
    (conv / other matmul / attention softmax / elementwise fusion / copy)
  * the busy-vs-span gap — time the device sat idle between ops inside one
    step (dispatch / host sync / scheduling), which is the "occupancy" loss
    MFU alone cannot distinguish from inefficient kernels.

Output: one JSON line per batch into RESULTS.json["b1_occupancy"] so the
ceiling argument (or the fix) is a recorded artifact.
"""

from __future__ import annotations

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 4


def run_and_capture(B: int):
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix=f"xprof_b{B}_")
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


_CATEGORIES = (
    ("conv", ("convolution", "conv")),
    ("attention_kernel", ("flash", "pallas", "custom-call")),
    ("matmul", ("dot", "einsum", "gemm")),
    ("softmax_exp", ("exp", "softmax", "reduce")),
    ("copy_transpose", ("copy", "transpose", "bitcast", "reshape", "pad",
                        "concatenate", "slice")),
    ("fusion_elementwise", ("fusion", "add", "mul", "loop")),
)


def _categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in _CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def analyze(tmpdir: str, B: int):
    trace = None
    for root, _dirs, files in os.walk(tmpdir):
        for fn in files:
            if fn.endswith(".trace.json.gz"):
                trace = os.path.join(root, fn)
    assert trace, f"no trace under {tmpdir}"
    data = json.loads(gzip.open(trace).read())
    events = data.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name"))
    }
    xevents = [e for e in events
               if e.get("ph") == "X" and e.get("pid") in dev_pids
               and e.get("dur", 0) > 0]
    if not xevents:
        return {"error": "no device events (CPU run?)"}
    busy = sum(e["dur"] for e in xevents)
    t0 = min(e["ts"] for e in xevents)
    t1 = max(e["ts"] + e["dur"] for e in xevents)
    span = t1 - t0
    cats: dict = {}
    for e in xevents:
        c = _categorize(e["name"])
        cats[c] = cats.get(c, 0.0) + e["dur"]
    top = sorted(
        ((n, sum(e["dur"] for e in xevents if e["name"] == n))
         for n in {e["name"] for e in xevents}),
        key=lambda kv: -kv[1],
    )[:15]
    return {
        "batch": B,
        "steps": STEPS,
        "busy_ms_per_step": round(busy / 1e3 / STEPS, 3),
        "span_ms_per_step": round(span / 1e3 / STEPS, 3),
        "idle_pct_of_span": round(100 * (span - busy) / span, 1),
        "category_ms_per_step": {
            k: round(v / 1e3 / STEPS, 3)
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
        "top_ops_ms_per_step": [
            [n[:90], round(d / 1e3 / STEPS, 3)] for n, d in top
        ],
    }


def main():
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache
    from stablediffusion_tpu.utils.bench_utils import record_result

    enable_compilation_cache()
    detail = {}
    for B in (1, 8):
        d = run_and_capture(B)
        row = analyze(d, B)
        detail[f"batch{B}"] = row
        print(json.dumps({f"batch{B}": row}), flush=True)
    record_result(
        "b1_occupancy",
        {"metric": "b1_vs_b8_occupancy", "value": 0,
         "unit": "ms/step by category", "detail": detail},
    )


if __name__ == "__main__":
    main()
