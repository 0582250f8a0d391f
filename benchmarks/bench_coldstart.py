"""Serving cold-start: checkpoint -> first image (the serverless metric).

The reference's whole deployment story is a runpod serverless worker that
loads fp16 safetensors from the image at container start
(/root/reference/runpod-worker/handler_logic.py, Dockerfile bakes weights);
cold-start latency = model load + first-request compile.  This bench records
our equivalents on the real chip:

  * load_sec        — diffusers-layout folder -> SDModel with every param
                      tree resident on device (mmap read + layout convert +
                      tunnel transfer)
  * first_image_sec — first 512² 20-step request (XLA compile + run)
  * warm_image_sec  — the same request again (the steady-state p50)

Weights are random full-size SD1.5 (no hub access) saved once to
/tmp/coldstart_sd15 via save_sd_model — byte-for-byte the real layout
(fp16 variant, torch layouts), so load cost is representative.

Usage: python benchmarks/bench_coldstart.py [--dir /tmp/coldstart_sd15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_checkpoint(path: str, model_type: str = "sd15",
                      with_t5: bool = False) -> None:
    if os.path.exists(os.path.join(path, "model_index.json")):
        return
    from stablediffusion_tpu.io.loader import save_sd3_model, save_sd_model
    from stablediffusion_tpu.utils.testing import random_full_model

    print(f"building random full-size {model_type} checkpoint ...", flush=True)
    if model_type == "sd3":
        # with_t5=False is the documented T5-free serving configuration
        # (load_sd3_model's optional text_encoder_3); --t5 adds the 4.7B
        # T5-XXL tower + fabricated-unigram tokenizer_3
        model = random_full_model("sd3", with_t5=with_t5)
        save_sd3_model(model, path, variant="fp16")
    else:
        model = random_full_model(model_type)
        save_sd_model(model, path, variant="fp16")
    del model


def ensure_quantized(fp_dir: str, q_dir: str, mode: str) -> None:
    """Derive the int8-on-disk variant once (io/quantize_cli) — in a CPU
    subprocess: this process's backend is the TPU, and quantizing offline
    must not bill a 2.2 GB tunnel round-trip to the prep step."""
    if os.path.exists(os.path.join(q_dir, "model_index.json")):
        return
    import subprocess

    print(f"quantizing checkpoint -> {q_dir} ({mode}) ...", flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "from stablediffusion_tpu.io.quantize_cli import main; "
         f"main({[fp_dir, q_dir, '--mode', mode]!r})"],
        check=True, env=env)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="sd15", choices=("sd15", "sdxl", "sd3"))
    p.add_argument("--t5", action="store_true",
                   help="sd3 only: include the full T5-XXL tower (+9.5 GB "
                        "fp16) instead of the T5-free serving configuration")
    p.add_argument("--dir", default=None,
                   help="checkpoint folder (default /tmp/coldstart_<model>)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--size", type=int, default=None,
                   help="square output (default: model native 512/1024)")
    p.add_argument("--record", default=None,
                   help="RESULTS.json key (default coldstart_<model>; use "
                        "..._warmcache for a second run against a populated "
                        "compile cache)")
    p.add_argument("--quantize", default=None,
                   help="load the int8-on-disk variant: w8 | w8a8 | w8a8:N "
                        "(~half the transfer bytes; derived once next to "
                        "--dir)")
    args = p.parse_args(argv)
    if args.t5 and args.model != "sd3":
        p.error("--t5 applies to --model sd3 only")
    suffix = "_t5" if args.t5 else ""
    if args.dir is None:
        args.dir = f"/tmp/coldstart_{args.model}{suffix}"
    if args.record is None:
        args.record = f"coldstart_{args.model}{suffix}"
    if args.size is None:
        args.size = 512 if args.model == "sd15" else 1024

    ensure_checkpoint(args.dir, args.model, with_t5=args.t5)
    if args.quantize:
        q_dir = f"{args.dir.rstrip('/')}_{args.quantize}"
        ensure_quantized(args.dir, q_dir, args.quantize)
        args.dir = q_dir
        if args.record == f"coldstart_{args.model}{suffix}":
            args.record = f"coldstart_{args.model}{suffix}_{args.quantize}"

    # the serving worker enables the persistent XLA cache at startup
    # (serve/worker.py) — a representative cold start does too.  First run
    # populates it; a --record coldstart_sd15_warmcache rerun measures the
    # bake-the-cache-into-the-image serverless pattern (the reference bakes
    # WEIGHTS into its image the same way, runpod-worker/Dockerfile).
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.io.loader import load_sd_model
    from stablediffusion_tpu.pipelines.unified import (
        StableDiffusionUnifiedPipeline,
    )
    from stablediffusion_tpu.utils.bench_utils import record_result

    size_gb = 0.0
    for root, _, files in os.walk(args.dir):
        size_gb += sum(
            os.path.getsize(os.path.join(root, f)) for f in files
        ) / 2**30

    import numpy as np

    # First device round-trip pays a large VARIABLE backend-attach cost on
    # the tunneled chip (70-460 s observed across fresh processes for a
    # single 1 MB put+fetch — benchmarks/probe_load4.py; after it, puts run
    # 57-75 MB/s).  Production TPU VMs attach locally and have no such
    # phase, so measure it separately instead of letting it pollute
    # load_sec.
    t0 = time.perf_counter()
    np.asarray(jnp.asarray(np.ones(2**19, np.float16))).ravel()[0]
    backend_init_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    if args.model == "sd3":
        from stablediffusion_tpu.io.loader import load_sd3_model

        model = load_sd3_model(args.dir, dtype=jnp.bfloat16)
        sync_trees = [model.transformer_params, model.vae_params,
                      model.text_encoder_params, model.text_encoder_2_params]
        if model.text_encoder_3_params is not None:
            sync_trees.append(model.text_encoder_3_params)
    else:
        model = load_sd_model(args.dir, dtype=jnp.bfloat16)
        sync_trees = [model.unet_params, model.vae_params,
                      model.text_encoder_params]
    host_load_sec = time.perf_counter() - t0
    # force a device sync point WITHOUT compiling anything (a jnp.sum would
    # bill its first-time remote compile to the load): round-trip one leaf
    # per component tree through np.asarray.  Transfers ride one in-order
    # stream on this backend, so fetching a leaf implies the queue drained
    # up to it; any straggler is absorbed into first_image_sec anyway.
    for tree in sync_trees:
        np.asarray(jax.tree.leaves(tree)[-1]).ravel()[0]
    load_sec = time.perf_counter() - t0

    if args.model == "sd3":
        from stablediffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

        pipe = StableDiffusion3Pipeline(do_cfg=True)
    else:
        pipe = StableDiffusionUnifiedPipeline(do_cfg=True)
    req = dict(prompt="a photograph of an astronaut riding a horse",
               height=args.size, width=args.size,
               num_inference_steps=args.steps,
               guidance_scale=7.5, seed=0, output_type="uint8")
    t1 = time.perf_counter()
    out = pipe(model, **req)
    first_image_sec = time.perf_counter() - t1
    assert out.images is not None
    t2 = time.perf_counter()
    pipe(model, **req)
    warm_image_sec = time.perf_counter() - t2

    prefix = f"coldstart_{args.model}{suffix}"
    payload = {
        "metric": args.record.replace(prefix, f"{prefix}_{args.size}px", 1)
        if args.record.startswith(prefix) else args.record,
        "unit": "sec",
        "value": round(load_sec + first_image_sec, 2),
        "detail": {
            "checkpoint_gb": round(size_gb, 2),
            "backend_init_sec": round(backend_init_sec, 2),
            "load_sec": round(load_sec, 2),
            "host_load_sec": round(host_load_sec, 2),
            "first_image_sec_incl_compile": round(first_image_sec, 2),
            "warm_image_sec": round(warm_image_sec, 3),
            "steps": args.steps,
            "quantize": args.quantize,
            "scope": "diffusers-layout "
                     + (f"int8({args.quantize})" if args.quantize else "fp16")
                     + " folder -> device-resident "
                     + ("SD3Model"
                        + (" (with T5-XXL)" if args.t5 else " (T5-free)")
                        if args.model == "sd3" else "SDModel")
                     + f" -> first/warm {args.size}² images",
        },
    }
    record_result(args.record, payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
