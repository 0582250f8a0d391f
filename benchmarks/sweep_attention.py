"""Block-size sweep for the library flash kernel + our streaming kernel at the
two L1 hot shapes. Finds the dispatch table for ops/attention.py."""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

from jax.experimental.pallas.ops.tpu.flash_attention import (
    flash_attention as lib_flash,
    BlockSizes,
)


def timed(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.mean(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.mean(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def lib_wrap(q, k, v, block_q, block_k):
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
    ("sd15-L1", 16, 4096, 8, 40),
    ("sdxl-L1", 8, 4096, 10, 64),
    ("sd15-L2", 16, 1024, 8, 80),
    ("sdxl-L2", 8, 1024, 20, 64),
]

def main():
    key = jax.random.PRNGKey(0)
    for name, B, S, H, D in SHAPES:
        kq, kk, kv_ = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(kv_, (B, S, H, D), jnp.bfloat16)
        for bq in (256, 512, 1024):
            for bk in (512, 1024, 2048):
                if bq > S or bk > S:
                    continue
                try:
                    f = jax.jit(functools.partial(lib_wrap, block_q=bq, block_k=bk))
                    ms = timed(f, q, k, v)
                    print(f"{name} lib bq={bq} bk={bk}: {ms:.3f} ms")
                except Exception as e:
                    print(f"{name} lib bq={bq} bk={bk}: FAIL {repr(e)[:80]}")
                sys.stdout.flush()


if __name__ == "__main__":
    main()
