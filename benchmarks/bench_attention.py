"""Head-to-head attention benchmark on the real TPU at SD shapes.

Candidates:
  * xla      — ops/attention.attention_xla (current default path)
  * ours_s   — ops/flash_attention.flash_attention_streaming
  * lib      — jax.experimental.pallas.ops.tpu.flash_attention (MaxText kernel)

(A resident full-KV-in-VMEM hand kernel was benched here in rounds 1-2; it
lost to XLA at every SD shape and was deleted in round 3.)

Timing per CLAUDE.md: block_until_ready is unreliable on the axon backend —
fetch a scalar instead.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

from stablediffusion_tpu.ops.attention import attention_xla
from stablediffusion_tpu.ops.flash_attention import (
    flash_attention_streaming,
)

try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as lib_flash,
        BlockSizes,
    )
    HAS_LIB = True
except Exception as e:  # pragma: no cover
    print("lib flash unavailable:", e)
    HAS_LIB = False


def timed(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.mean(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.mean(out.astype(jnp.float32)))  # sync
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, s


def lib_wrap(q, k, v, block_q=512, block_k=512):
    # lib kernel wants [b, h, s, d]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    bs = BlockSizes(
        block_q=min(block_q, qt.shape[2]),
        block_k_major=min(block_k, kt.shape[2]),
        block_k=min(block_k, kt.shape[2]),
        block_b=1,
    )
    o = lib_flash(qt, kt, vt, sm_scale=q.shape[-1] ** -0.5, block_sizes=bs)
    return o.transpose(0, 2, 1, 3)


SHAPES = [
    # (name, B, Sq, Skv, H, D)
    ("sd15-L1-self", 16, 4096, 4096, 8, 40),
    ("sd15-L1-cross", 16, 4096, 77, 8, 40),
    ("sd15-L2-self", 16, 1024, 1024, 8, 80),
    ("sd15-L2-cross", 16, 1024, 77, 8, 80),
    ("sd15-L3-self", 16, 256, 256, 8, 160),
    ("sdxl-L1-self", 8, 4096, 4096, 10, 64),
    ("sdxl-L1-cross", 8, 4096, 77, 10, 64),
    ("sdxl-L2-self", 8, 1024, 1024, 20, 64),
]


def main():
    which = sys.argv[1:] if len(sys.argv) > 1 else None
    key = jax.random.PRNGKey(0)
    print("backend:", jax.devices()[0].platform)
    for name, B, Sq, Skv, H, D in SHAPES:
        if which and name not in which:
            continue
        kq, kk, kv_ = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, Sq, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, Skv, H, D), jnp.bfloat16)
        v = jax.random.normal(kv_, (B, Skv, H, D), jnp.bfloat16)
        flops = 4 * B * H * Sq * Skv * D
        rows = []
        xla_jit = jax.jit(attention_xla)
        ms, chk = timed(xla_jit, q, k, v)
        rows.append(("xla", ms, chk))
        try:
            if Skv >= 1024:
                ms, chk = timed(flash_attention_streaming, q, k, v)
                rows.append(("ours_s", ms, chk))
        except Exception as e:
            print(name, "ours_s failed:", repr(e)[:120])
        if HAS_LIB and Skv >= 128:
            try:
                f = jax.jit(functools.partial(lib_wrap))
                ms, chk = timed(f, q, k, v)
                rows.append(("lib", ms, chk))
            except Exception as e:
                print(name, "lib failed:", repr(e)[:160])
        for tag, ms, chk in rows:
            tf = flops / (ms * 1e-3) / 1e12
            print(f"{name:16s} {tag:7s} {ms:8.3f} ms  {tf:6.1f} TF/s  chk={chk:.4f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
