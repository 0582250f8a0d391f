"""Whole-program ablation profiling of the SD1.5 denoise step.

Per-op microbenches are useless through this environment's tunneled backend
(~24 ms fixed dispatch overhead, and long remote compiles), so attribution is
done by ablating inside ONE scanned program: swap attention implementations /
identity and compare full 20-step scan times.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

STEPS = 20


def time_scan(step_fn, lat, iters=3):
    @jax.jit
    def run(lat):
        def body(c, _):
            return step_fn(c), None

        out, _ = jax.lax.scan(body, lat, None, length=STEPS)
        return out

    float(jnp.mean(run(lat)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.mean(run(lat)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / STEPS


def main():
    from stablediffusion_tpu.core.config import SD15_UNET
    from stablediffusion_tpu.models import unet
    from stablediffusion_tpu.ops.attention import attention_xla
    from stablediffusion_tpu.utils.testing import random_model_params

    # unet binds `attention` into its module globals at import; patch there
    attn_mod = unet

    B = int(os.environ.get("PROF_BATCH", "8"))
    dt = jnp.bfloat16
    params = random_model_params(unet.init_params, SD15_UNET, dtype=dt)
    lat = jax.random.normal(jax.random.key(0), (2 * B, 64, 64, 4), dt)
    ctx = jax.random.normal(jax.random.key(1), (2 * B, 77, 768), dt)

    def step(l):
        return unet.apply(params, SD15_UNET, l, jnp.asarray(500), ctx).astype(
            l.dtype
        )

    orig = attn_mod.attention
    results = {}

    which = sys.argv[1:] or ["pallas", "xla", "identity"]

    if "pallas" in which:
        results["pallas"] = time_scan(step, lat)
        print(f"attention=pallas : {results['pallas']*1e3:7.1f} ms/step", flush=True)
    if "xla" in which:
        attn_mod.attention = attention_xla
        results["xla"] = time_scan(step, lat)
        print(f"attention=xla    : {results['xla']*1e3:7.1f} ms/step", flush=True)
    if "identity" in which:
        attn_mod.attention = lambda q, k, v, mask=None, scale=None: (
            q if q.shape[1] == k.shape[1] else q * 0 + jnp.sum(k) * 0
        )
        results["identity"] = time_scan(step, lat)
        print(
            f"attention=identity: {results['identity']*1e3:7.1f} ms/step "
            f"(conv+norm+linear floor)",
            flush=True,
        )
    attn_mod.attention = orig


if __name__ == "__main__":
    main()
