"""SDXL LoRA training throughput on one chip (1024² default, rank 16, UNet
LoRA only, frozen towers/VAE).  Mirrors bench_train16.py methodology.

Usage: bench_train_sdxl.py [B] [res] [remat_policy] [split] [vae_bf16]
  remat_policy: none | full | dots | offload
  split: 1 = encode VAE/text in a SEPARATE jitted program (--cache_latents
  path, train_step.make_encode_fn) so encoder activations and CLIP towers
  never share a program with the UNet backward.

Round-2 finding being attacked: the fused single-program step needs
15.9-16.9G at batch 2-4 (> the 15.75G v5e chip) under every remat policy,
peak = UNet backward, non-monotone in batch.  Round 3: the split-encode
step + offload/full remat is measured here; results recorded to
benchmarks/RESULTS.json.
"""

import json
import sys
import time

from stablediffusion_tpu.utils.bench_utils import hbm_stats




def run(B, res, policy, split, vae_bf16=False, accum=1, accum_dtype=None):
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stablediffusion_tpu.core.config import (
        SD15_TEXT_ENCODER,
        SDXL_SCHEDULER,
        SDXL_TEXT_ENCODER_2,
        SDXL_UNET,
        SDXL_VAE,
    )
    from stablediffusion_tpu.lora.core import UNET_TARGET_SUFFIXES, init_lora
    from stablediffusion_tpu.models import clip, unet, vae
    from stablediffusion_tpu.schedulers import DDPMScheduler
    from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
    from stablediffusion_tpu.train.train_step import (
        TrainStatics,
        make_encode_fn,
        make_train_step,
    )
    from stablediffusion_tpu.utils.testing import random_model_params

    dt = jnp.bfloat16
    frozen = {
        "unet": random_model_params(unet.init_params, SDXL_UNET, dtype=dt),
        "vae": random_model_params(vae.init_params, SDXL_VAE, dtype=jnp.float32),
        "text_encoder": random_model_params(
            clip.init_params, SD15_TEXT_ENCODER, dtype=dt
        ),
        "text_encoder_2": random_model_params(
            clip.init_params, SDXL_TEXT_ENCODER_2, dtype=dt
        ),
    }
    lora = {
        "unet": init_lora(
            jax.random.key(0), frozen["unet"], 16, UNET_TARGET_SUFFIXES,
            store_alpha=False,
        )
    }
    statics = TrainStatics(
        unet_config=SDXL_UNET,
        vae_config=SDXL_VAE,
        text_config=SD15_TEXT_ENCODER,
        text_config_2=SDXL_TEXT_ENCODER_2,
        scheduler_config=SDXL_SCHEDULER,
        train_text_encoder=False,
        snr_gamma=5.0,
        compute_dtype=dt,
        remat_policy=policy,
        vae_dtype=jnp.bfloat16 if vae_bf16 else jnp.float32,
        vae_microbatch=min(4, B),
    )
    optimizer = make_optimizer(
        make_lr_schedule("constant", 1e-4), grad_accum_steps=accum,
        accum_dtype=accum_dtype,
    )
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(statics, DDPMScheduler(SDXL_SCHEDULER), optimizer)
    encode_fn = make_encode_fn(statics) if split else None

    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, res, res, 3)) * 0.5, jnp.float32
        ),
        "input_ids": jnp.asarray(rng.integers(0, 49407, (B, 77)), jnp.int32),
        "input_ids_2": jnp.asarray(rng.integers(0, 49407, (B, 77)), jnp.int32),
        "original_sizes": jnp.asarray([[res, res]] * B, jnp.float32),
        "crop_top_lefts": jnp.asarray([[0, 0]] * B, jnp.float32),
        "target_sizes": jnp.asarray([[res, res]] * B, jnp.float32),
    }

    def one_step(key):
        b = batch
        if encode_fn is not None:
            key, k_enc = jax.random.split(key)
            b = encode_fn(frozen, b, k_enc)
        return step_fn(lora, opt_state, frozen, b, key)

    t0 = time.perf_counter()
    lora, opt_state, m = one_step(jax.random.key(1))
    loss = float(m["loss"])
    print(
        f"B={B} res={res} policy={policy} split={split} accum={accum}: "
        f"compiled+step1 in {time.perf_counter()-t0:.1f}s loss={loss:.4f} "
        f"hbm={hbm_stats()}",
        flush=True,
    )
    times = []
    for i in range(3):
        # one OPTIMIZER update = `accum` microbatch steps (effective batch
        # B*accum — the single-chip answer when B*accum doesn't fit as one
        # microbatch; optax.MultiSteps accumulates on-chip)
        t0 = time.perf_counter()
        for a in range(accum):
            lora, opt_state, m = one_step(jax.random.key(2 + i * accum + a))
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    B = B * accum  # effective batch for the img/s metric
    payload = {
        "metric": f"sdxl_{res}px_lora_train_images_per_sec_per_chip",
        "value": round(B / best, 3),
        "unit": "images/sec",
        "detail": {
            "batch": B,
            "sec_per_step": round(best, 3),
            "rank": 16,
            "remat_policy": policy,
            "split_encode": bool(split),
            "grad_accum_steps": accum,
            "hbm": hbm_stats(),
        },
    }
    print(json.dumps(payload), flush=True)
    import os

    from stablediffusion_tpu.utils.bench_utils import record_result

    # SDTPU_RECORD_KEY: record under a different RESULTS.json key (e.g. the
    # accum probes must not overwrite the canonical accum=1 anchor)
    record_result(os.environ.get("SDTPU_RECORD_KEY")
                  or f"sdxl_{res}_lora_train", payload)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    policy = sys.argv[3] if len(sys.argv) > 3 else "none"
    split = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
    vae_bf16 = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    accum = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    accum_dtype = sys.argv[7] if len(sys.argv) > 7 else None
    run(B, res, policy, split, vae_bf16, accum, accum_dtype)
