"""A/B the pipelined load_component_state vs the prestaged-put pattern on
the real coldstart unet, interleaved to control for tunnel-bandwidth drift
(the r4e warmcache run measured a 463 s transfer drain = 4.6 MB/s, vs the
probe's 45 MB/s prestaged rate measured minutes earlier).

Usage: python benchmarks/probe_load3.py [--dir /tmp/coldstart_sd15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="/tmp/coldstart_sd15")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16)
    unet = os.path.join(args.dir, "unet")

    def run_pipelined():
        from stablediffusion_tpu.io.loader import load_component_state

        t0 = time.perf_counter()
        tree = load_component_state(unet, dtype=jnp.bfloat16)
        dispatch = time.perf_counter() - t0
        np.asarray(jax.tree.leaves(tree)[-1]).ravel()[0]
        total = time.perf_counter() - t0
        del tree
        return dispatch, total

    def run_prestaged():
        from stablediffusion_tpu.io.loader import _find_weights
        from stablediffusion_tpu.io.safetensors_io import SafetensorsFile
        from stablediffusion_tpu.io.torch_convert import convert_tensor

        t0 = time.perf_counter()
        conv = {}
        for path in _find_weights(unet, "fp16"):
            with SafetensorsFile(path) as f:
                for name in f.keys():
                    conv[name] = np.ascontiguousarray(
                        convert_tensor(name, f.tensor(name))).astype(bf16)
        staged = time.perf_counter() - t0
        devs = {k: jnp.asarray(v) for k, v in conv.items()}
        dispatch = time.perf_counter() - t0
        np.asarray(list(devs.values())[-1]).ravel()[0]
        total = time.perf_counter() - t0
        del devs
        return staged, dispatch, total

    mb = sum(os.path.getsize(os.path.join(unet, f))
             for f in os.listdir(unet) if f.endswith(".safetensors")) / 2**20

    for rep in range(2):
        s, d, t = run_prestaged()
        print(json.dumps({"label": f"prestaged_{rep}", "stage_sec": round(s, 2),
                          "dispatch_sec": round(d, 2), "total_sec": round(t, 2),
                          "mb_per_sec": round(mb / t, 1)}), flush=True)
        pd, pt = run_pipelined()
        print(json.dumps({"label": f"pipelined_{rep}",
                          "dispatch_sec": round(pd, 2),
                          "total_sec": round(pt, 2),
                          "mb_per_sec": round(mb / pt, 1)}), flush=True)


if __name__ == "__main__":
    main()
