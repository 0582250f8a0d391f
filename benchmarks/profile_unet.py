"""Component-level profiling of the SD1.5 hot path on TPU.

The tunneled backend has ~24 ms fixed dispatch+fetch overhead per Python
call, so every op is timed as N iterations inside ONE jitted lax.scan; the
per-iteration time is (total - overhead) / N.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_INNER = 20


def timeit_scanned(op, *args, iters=3):
    """Time op(*args) scanned N_INNER times inside one jit.

    The LAST argument is perturbed by the (dynamic) carry each iteration —
    without this, XLA hoists the loop-invariant op out of the scan (LICM)
    and every measurement collapses to ~1.5 ms of scan overhead."""

    @jax.jit
    def run(args):
        def body(carry, _):
            largs = (*args[:-1], args[-1] + (carry * 1e-30).astype(args[-1].dtype))
            out = op(*largs)
            # fold output into carry so iterations aren't DCE'd
            return carry + jnp.sum(out.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, jnp.float32(0), None, length=N_INNER)
        return total

    float(run(args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / N_INNER


def main():
    from stablediffusion_tpu.core.config import SD15_UNET, SD15_VAE
    from stablediffusion_tpu.models import unet, vae
    from stablediffusion_tpu.ops.attention import attention_xla
    from stablediffusion_tpu.ops.flash_attention import (
        flash_attention_streaming as flash_attention,
    )
    from stablediffusion_tpu.utils.testing import random_model_params

    B = int(os.environ.get("PROF_BATCH", "8"))
    dt = jnp.bfloat16
    print(f"device: {jax.devices()[0]}, batch {B} (CFG -> {2*B} UNet batch)")

    print("\n== attention (ms per call, scanned) ==")
    for S, D, H in ((4096, 40, 8), (1024, 80, 8), (256, 160, 8)):
        for Skv, tag in ((S, "self"), (77, "cross")):
            q = jax.random.normal(jax.random.key(0), (2 * B, S, H, D), dt)
            k = jax.random.normal(jax.random.key(1), (2 * B, Skv, H, D), dt)
            v = jax.random.normal(jax.random.key(2), (2 * B, Skv, H, D), dt)
            t_xla = timeit_scanned(attention_xla, q, k, v) * 1e3
            try:
                t_pal = timeit_scanned(flash_attention, q, k, v) * 1e3
            except Exception:
                t_pal = float("nan")
            flops = 4 * 2 * B * H * S * Skv * D
            print(
                f"  {tag:5s} S={S:5d} Skv={Skv:5d} D={D:3d}: "
                f"xla {t_xla:7.2f} ({flops/t_xla/1e9:6.1f} TF/s)  "
                f"pallas {t_pal:7.2f} ({flops/t_pal/1e9:6.1f} TF/s)"
            )

    from stablediffusion_tpu.ops import group_norm, silu

    print("\n== groupnorm+silu (ms, scanned) ==")
    for H, C in ((64, 320), (32, 640), (16, 1280)):
        x = jax.random.normal(jax.random.key(0), (2 * B, H, H, C), dt)
        p = {"weight": jnp.ones((C,), dt), "bias": jnp.zeros((C,), dt)}
        t = timeit_scanned(lambda p, x: silu(group_norm(p, x, 32)), p, x) * 1e3
        gb = 2 * x.size * 2 / 1e9
        print(f"  {H:3d}x{H:3d}x{C:4d}: {t:6.2f} ms ({gb/t*1e3:6.0f} GB/s)")

    # conv microbench: the 3x3 resnet convs
    from stablediffusion_tpu.ops import conv2d

    print("\n== conv3x3 (ms, scanned) ==")
    for H, C in ((64, 320), (32, 640), (16, 1280), (8, 1280)):
        x = jax.random.normal(jax.random.key(0), (2 * B, H, H, C), dt)
        w = {
            "weight": jax.random.normal(jax.random.key(1), (3, 3, C, C), dt) * 0.02,
            "bias": jnp.zeros((C,), dt),
        }
        t = timeit_scanned(lambda w, x: conv2d(w, x, padding=1), w, x) * 1e3
        flops = 2 * x.shape[0] * H * H * C * C * 9
        print(f"  {H:3d}x{H:3d}x{C:4d}: {t:6.2f} ms ({flops/t/1e9:6.1f} TF/s)")

    params = random_model_params(unet.init_params, SD15_UNET, dtype=dt)
    lat = jax.random.normal(jax.random.key(0), (2 * B, 64, 64, 4), dt)
    ctx = jax.random.normal(jax.random.key(1), (2 * B, 77, 768), dt)

    t = (
        timeit_scanned(
            lambda p, l, c: unet.apply(p, SD15_UNET, l, jnp.asarray(500), c),
            params,
            lat,
            ctx,
        )
        * 1e3
    )
    print(f"\n== full UNet fwd (batch {2*B}): {t:.1f} ms ==")

    vpbf = random_model_params(vae.init_params, SD15_VAE, dtype=dt)
    z = jax.random.normal(jax.random.key(0), (B, 64, 64, 4), dt)
    t = timeit_scanned(lambda p, z: vae.decode(p, SD15_VAE, z), vpbf, z) * 1e3
    print(f"== VAE decode bf16 batch {B}: {t:.1f} ms ==")


if __name__ == "__main__":
    main()
