"""Where does checkpoint->device load time go?  (cold-start attack, round 4)

bench_coldstart measured 133 s host_load for a 2.2 GB fp16 SD1.5 folder
(~17 MB/s) — absurdly slow for mmap+convert+transfer.  Hypotheses:
  H1  tunnel per-transfer latency dominates (~1100 jnp.asarray calls)
  H2  tunnel bandwidth is just low (nothing to batch away)
  H3  host-side convert (strided transpose + fp16->bf16 cast) dominates

Measures, on the real chip:
  * one 256 MB bf16 put           -> tunnel bandwidth ceiling
  * 256 x 1 MB puts               -> per-call overhead
  * 64 x 4 MB puts                -> mid-size scaling
  * host-only read+convert of the coldstart unet (no jax)   -> H3
  * full load_component_state of the unet (jax)             -> end to end

Usage: python benchmarks/probe_load.py [--dir /tmp/coldstart_sd15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return np.asarray(x).ravel()[0]


def timed_puts(arrays, label):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    devs = [jnp.asarray(a) for a in arrays]
    dispatch = time.perf_counter() - t0
    for d in devs:
        fetch(d)
    total = time.perf_counter() - t0
    mb = sum(a.nbytes for a in arrays) / 2**20
    row = {
        "label": label,
        "n": len(arrays),
        "mb": round(mb, 1),
        "dispatch_sec": round(dispatch, 3),
        "total_sec": round(total, 3),
        "mb_per_sec": round(mb / total, 1),
        "ms_per_call": round(total / len(arrays) * 1e3, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="/tmp/coldstart_sd15")
    args = p.parse_args()

    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16)
    rng = np.random.default_rng(0)
    big_bf = np.asarray(rng.standard_normal(128 * 2**20), dtype=bf16)  # 256 MB

    rows = []
    rows.append(timed_puts([big_bf], "one_256mb"))
    small = np.split(big_bf, 256)
    rows.append(timed_puts(small, "256_x_1mb"))
    mid = np.split(big_bf, 64)
    rows.append(timed_puts(mid, "64_x_4mb"))

    # threaded puts: if per-call round-trip latency dominates, concurrent
    # transfers should overlap it
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    for workers in (4, 16):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(workers) as ex:
            devs = list(ex.map(jnp.asarray, small))
        for d in devs:
            fetch(d)
        total = time.perf_counter() - t0
        mb = sum(a.nbytes for a in small) / 2**20
        print(
            json.dumps(
                {
                    "label": f"256_x_1mb_threads{workers}",
                    "n": len(small),
                    "mb": round(mb, 1),
                    "total_sec": round(total, 3),
                    "mb_per_sec": round(mb / total, 1),
                }
            ),
            flush=True,
        )

    # host-only convert of the real unet folder (if present)
    unet_dir = os.path.join(args.dir, "unet")
    if os.path.isdir(unet_dir):
        from stablediffusion_tpu.io.loader import _find_weights
        from stablediffusion_tpu.io.safetensors_io import SafetensorsFile
        from stablediffusion_tpu.io.torch_convert import convert_tensor

        t0 = time.perf_counter()
        flat = {}
        for path in _find_weights(unet_dir, "fp16"):
            with SafetensorsFile(path) as f:
                for name in f.keys():
                    flat[name] = np.array(f.tensor(name))
        read_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        conv = {
            k: np.ascontiguousarray(convert_tensor(k, v)).astype(bf16)
            for k, v in flat.items()
        }
        conv_sec = time.perf_counter() - t0
        nbytes = sum(v.nbytes for v in conv.values())
        t0 = time.perf_counter()
        import jax.numpy as jnp

        devs = {k: jnp.asarray(v) for k, v in conv.items()}
        fetch(list(devs.values())[-1])
        put_sec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "label": "unet_folder",
                    "tensors": len(conv),
                    "mb": round(nbytes / 2**20, 1),
                    "read_sec": round(read_sec, 2),
                    "convert_sec": round(conv_sec, 2),
                    "put_prestaged_sec": round(put_sec, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
