"""Map tunnel device-put bandwidth vs transfer size (cold-start attack #2).

probe_load.py round 1: 256 MB single put = 3.5 MB/s (!), 1 MB x 256 = 12.9,
4 MB x 64 = 24.5, real unet mix = 45 MB/s.  Bandwidth is strongly
size-dependent and NON-monotone — find the sweet spot so the loader can
chunk large tensors to it.

Usage: python benchmarks/probe_load2.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def fetch(x):
    return np.asarray(x).ravel()[0]


def main():
    import jax.numpy as jnp
    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16)
    rng = np.random.default_rng(0)

    # single-put bandwidth curve
    for mb in (2, 8, 16, 32, 64, 128):
        a = np.asarray(rng.standard_normal(mb * 2**19), dtype=bf16)
        t0 = time.perf_counter()
        d = jnp.asarray(a)
        fetch(d)
        dt = time.perf_counter() - t0
        print(json.dumps({"label": f"one_{mb}mb", "mb": mb,
                          "total_sec": round(dt, 3),
                          "mb_per_sec": round(mb / dt, 1)}), flush=True)

    # chunked 256 MB at the candidate sweet spots
    big = np.asarray(rng.standard_normal(128 * 2**20), dtype=bf16)
    for chunk_mb in (8, 16, 32):
        parts = np.split(big, 256 // chunk_mb)
        t0 = time.perf_counter()
        devs = [jnp.asarray(p) for p in parts]
        for d in devs:
            fetch(d)
        dt = time.perf_counter() - t0
        print(json.dumps({"label": f"{len(parts)}_x_{chunk_mb}mb", "mb": 256,
                          "total_sec": round(dt, 3),
                          "mb_per_sec": round(256 / dt, 1)}), flush=True)

    # fp16 put + device-side cast/transpose vs host-side convert (H3 killer:
    # ship raw torch-layout fp16 and do layout+dtype work on the MXU side)
    oihw = np.asarray(rng.standard_normal((1280, 1280, 3, 3)), dtype=np.float16)
    t0 = time.perf_counter()
    d = jnp.asarray(oihw)
    hwio = jnp.transpose(d, (2, 3, 1, 0)).astype(jnp.bfloat16)
    fetch(hwio)
    dt = time.perf_counter() - t0
    print(json.dumps({"label": "fp16_put_device_convert",
                      "mb": round(oihw.nbytes / 2**20, 1),
                      "total_sec": round(dt, 3),
                      "mb_per_sec": round(oihw.nbytes / 2**20 / dt, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
