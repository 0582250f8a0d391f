"""Whole-program ablation profiling of the SD1.5 denoise step.

Per-op microbenches are useless through this environment's tunneled backend
(~24 ms fixed dispatch overhead + long remote compiles), so attribution is
done by ablation inside ONE scanned program.

Params MUST be jit arguments, not closures — closed-over params become
compile-time constants and the compile never finishes.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

STEPS = 20


def time_scan(apply_fn, params, lat, ctx, iters=3):
    @jax.jit
    def run(params, lat, ctx):
        def body(c, _):
            return apply_fn(params, c, ctx).astype(c.dtype), None

        out, _ = jax.lax.scan(body, lat, None, length=STEPS)
        return out

    float(jnp.mean(run(params, lat, ctx)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.mean(run(params, lat, ctx)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / STEPS


def main():
    from stablediffusion_tpu.core.config import SD15_UNET
    from stablediffusion_tpu.models import unet
    from stablediffusion_tpu.ops.attention import attention_xla
    from stablediffusion_tpu.utils.testing import random_model_params

    B = int(os.environ.get("PROF_BATCH", "8"))
    dt = jnp.bfloat16
    params = random_model_params(unet.init_params, SD15_UNET, dtype=dt)
    lat = jax.random.normal(jax.random.key(0), (2 * B, 64, 64, 4), dt)
    ctx = jax.random.normal(jax.random.key(1), (2 * B, 77, 768), dt)

    def apply(p, l, c):
        return unet.apply(p, SD15_UNET, l, jnp.asarray(500), c)

    which = sys.argv[1:] or ["pallas", "xla", "identity"]
    orig = unet.attention

    if "pallas" in which:
        t = time_scan(apply, params, lat, ctx)
        print(f"attention=pallas  : {t*1e3:7.1f} ms/step", flush=True)
    if "xla" in which:
        unet.attention = attention_xla
        t = time_scan(apply, params, lat, ctx)
        print(f"attention=xla     : {t*1e3:7.1f} ms/step", flush=True)
    if "identity" in which:
        unet.attention = lambda q, k, v, mask=None, scale=None: jnp.broadcast_to(
            q, q.shape
        )
        t = time_scan(apply, params, lat, ctx)
        print(f"attention=identity: {t*1e3:7.1f} ms/step (non-attn floor)", flush=True)
    unet.attention = orig


if __name__ == "__main__":
    main()
