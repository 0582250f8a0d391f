"""Does a tiny warmup put absorb the per-process tunnel cold phase?

probe_load3: fresh-process first bulk transfer ran at 4.4 MB/s (368 s for
1.6 GB), subsequent bursts 42-75 MB/s.  If one small put+fetch pays the
whole cold cost, the serving worker can warm the link cheaply before the
bulk load; if the cold phase scales with queued bytes, it cannot.

Usage: python benchmarks/probe_load4.py [--dir /tmp/coldstart_sd15]
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

    # tiny warmup: one 1 MB put + fetch, timed
    a = np.ones(2**19, np.float16)
    t0 = time.perf_counter()
    np.asarray(jnp.asarray(a)).ravel()[0]
    warm1 = time.perf_counter() - t0
    print(json.dumps({"label": "warmup_1mb", "sec": round(warm1, 2)}),
          flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.asarray(a * 2)).ravel()[0]
    warm2 = time.perf_counter() - t0
    print(json.dumps({"label": "warmup_1mb_again", "sec": round(warm2, 2)}),
          flush=True)

    from stablediffusion_tpu.io.loader import load_component_state

    unet = os.path.join(args.dir, "unet")
    mb = sum(os.path.getsize(os.path.join(unet, f))
             for f in os.listdir(unet) if f.endswith(".safetensors")) / 2**20
    t0 = time.perf_counter()
    tree = load_component_state(unet, dtype=jnp.bfloat16)
    dispatch = time.perf_counter() - t0
    np.asarray(jax.tree.leaves(tree)[-1]).ravel()[0]
    total = time.perf_counter() - t0
    print(json.dumps({"label": "pipelined_after_warmup",
                      "dispatch_sec": round(dispatch, 2),
                      "total_sec": round(total, 2),
                      "mb_per_sec": round(mb / total, 1)}), flush=True)


if __name__ == "__main__":
    main()
