"""Capture an XLA device trace of the SD1.5 denoise scan and print the
top device-side ops (the profiler DOES work through this TPU tunnel)."""

import gzip
import json
import os
import sys


def run_and_capture(tmpdir=None):
    import tempfile

    tmpdir = tmpdir or tempfile.mkdtemp(prefix="xprof_unet_")
    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.core.config import SD15_UNET
    from stablediffusion_tpu.models import unet
    from stablediffusion_tpu.utils.observability import profile_to
    from stablediffusion_tpu.utils.testing import random_model_params

    B = int(os.environ.get("PROF_BATCH", "8"))
    dt = jnp.bfloat16
    params = random_model_params(unet.init_params, SD15_UNET, dtype=dt)
    lat = jax.random.normal(jax.random.key(0), (2 * B, 64, 64, 4), dt)
    ctx = jax.random.normal(jax.random.key(1), (2 * B, 77, 768), dt)

    @jax.jit
    def step(params, lat, ctx):
        def body(c, _):
            return unet.apply(params, SD15_UNET, c, jnp.asarray(500), ctx).astype(
                c.dtype
            ), None

        out, _ = jax.lax.scan(body, lat, None, length=4)
        return out

    float(jnp.mean(step(params, lat, ctx)))  # compile + warm
    with profile_to(tmpdir):
        float(jnp.mean(step(params, lat, ctx)))
    return tmpdir


def report(tmpdir):
    trace = None
    for root, dirs, files in os.walk(tmpdir):
        for fn in files:
            if fn.endswith(".trace.json.gz"):
                trace = os.path.join(root, fn)
    assert trace, f"no trace under {tmpdir}"
    data = json.loads(gzip.open(trace).read())
    events = data.get("traceEvents", [])
    # device pid
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name"))
    }
    totals = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            totals[e["name"]] = totals.get(e["name"], 0.0) + e.get("dur", 0)
    total_ms = sum(totals.values()) / 1e3
    print(f"device busy total: {total_ms:.1f} ms (4 scan steps)")
    for n, d in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/1e3:9.2f} ms {100*d/1e3/total_ms:5.1f}%  {n[:100]}")


if __name__ == "__main__":
    d = run_and_capture()
    report(d)
