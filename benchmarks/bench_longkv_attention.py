"""Long-KV self-attention shoot-out: XLA fusion vs library TPU flash vs the
hand streaming kernel (ops/flash_attention.flash_attention_streaming).

The regime: D=40 (SD1.5 L1 head dim) at sequence lengths past the benched
4096 — 9216 tokens is 768² generation, 16384 is 1024², 36864 is 1536².
Here XLA materializes [B,H,S,S] fp32 logits (S=16384, H=8, B=4: 32 GiB —
cannot run), so *some* flash kernel must own the regime by default.  This
bench decides which and sets the dispatch thresholds in ops/attention.py.

Timing: carry-feedback scan (perturb q with the previous output) so XLA
cannot hoist the op (see CLAUDE.md re LICM).
"""

import json
import time

import jax
import jax.numpy as jnp


def timeit(fn, q, k, v, iters=64):
    # iters=64, NOT 8: one scanned call carries ~24 ms of fixed tunnel
    # dispatch+fetch latency, i.e. ~3 ms/iter contamination at 8 iters —
    # larger than the real cost of the S=4096 kernels (the b1 device
    # profile shows lib flash at B2,S4096,D40 is ~1.0 ms/call; the 8-iter
    # run of this bench reported 5.65).  At 64 iters the floor is <0.4 ms.
    def run(q0, k0, v0):
        def body(carry, _):
            return fn(q0 + 1e-6 * carry, k0, v0), ()

        return jax.lax.scan(body, jnp.zeros_like(q0), None, length=iters)[0]

    scanned = jax.jit(run)
    float(jnp.mean(scanned(q, k, v)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.mean(scanned(q, k, v)))
    return (time.perf_counter() - t0) / iters


def main():
    from stablediffusion_tpu.ops.attention import _lib_flash, attention_xla
    from stablediffusion_tpu.ops.flash_attention import (
        flash_attention_streaming,
    )
    from stablediffusion_tpu.utils.bench_utils import record_result

    results = {}
    for B, S, H, D in [
        (2, 2048, 8, 40),
        (8, 2048, 8, 40),
        (2, 4096, 8, 40),
        (8, 4096, 8, 40),   # SD1.5 512² L1 at throughput batch (CFG-doubled)
        (16, 4096, 8, 40),
        (2, 9216, 8, 40),
        (1, 16384, 8, 40),
        (2, 16384, 8, 40),
        (2, 4096, 8, 64),
        (2, 9216, 8, 64),
        # batch-1 CFG latency shapes (round-4 occupancy work): SD1.5 L2 and
        # SDXL L1/L2 self-attention at B=2; plus the batch-8 L2 throughput
        (2, 1024, 8, 80),
        (16, 1024, 8, 80),  # SD1.5 512² L2 at throughput batch
        (2, 4096, 10, 64),  # SDXL 1024² L1 at B=1 (CFG 2)
        (2, 1024, 20, 64),  # SDXL 1024² L2 at B=1
        # VAE mid-block at 1024²/1536² decode: single head, D=512 — the
        # library kernel cannot tile D>128, so streaming vs XLA only.
        (1, 16384, 1, 512),
        (1, 36864, 1, 512),
    ]:
        k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(k1, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(k2, (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(k3, (B, S, H, D), jnp.bfloat16)
        scale = D**-0.5
        row = {}
        logits_gib = B * H * S * S * 4 / 2**30
        if logits_gib < 8:  # XLA path materializes fp32 logits
            try:
                row["xla_ms"] = round(
                    timeit(lambda q_, k_, v_: attention_xla(q_, k_, v_,
                                                           scale=scale),
                           q, k, v) * 1e3, 2)
            except Exception as e:  # OOM
                row["xla_ms"] = f"OOM({type(e).__name__})"
        else:
            row["xla_ms"] = f"skipped({logits_gib:.0f}GiB logits)"
        if 32 <= D <= 128:
            try:
                row["lib_flash_ms"] = round(
                    timeit(lambda q_, k_, v_: _lib_flash(q_, k_, v_, scale),
                           q, k, v) * 1e3, 2)
            except Exception as e:
                row["lib_flash_ms"] = f"fail({type(e).__name__})"
        try:
            row["stream_ms"] = round(
                timeit(lambda q_, k_, v_: flash_attention_streaming(
                    q_, k_, v_, scale=scale), q, k, v) * 1e3, 2)
        except Exception as e:
            row["stream_ms"] = f"fail({type(e).__name__})"
        key = f"B{B}_S{S}_H{H}_D{D}"
        results[key] = row
        print(json.dumps({key: row}), flush=True)

    record_result(
        "longkv_attention",
        {"metric": "longkv_attention_ms", "value": 0, "unit": "ms/call",
         "detail": results},
    )


if __name__ == "__main__":
    main()
