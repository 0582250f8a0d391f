"""Batch-16 LoRA training validation on one chip (VERDICT r1 item 8).

Same program as bench_train.py at B=16 with the VAE micro-batched encode
(vae_microbatch=8) and remat (gradient_checkpointing) variants, to validate
that the larger training graph compiles and record its throughput.
"""

import json
import sys
import time


def run(B, mb, remat):
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stablediffusion_tpu.core.config import (
        SD15_TEXT_ENCODER,
        SD15_UNET,
        SD15_VAE,
        SchedulerConfig,
    )
    from stablediffusion_tpu.lora.core import UNET_TARGET_SUFFIXES, init_lora
    from stablediffusion_tpu.models import clip, unet, vae
    from stablediffusion_tpu.schedulers import DDPMScheduler
    from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
    from stablediffusion_tpu.train.train_step import TrainStatics, make_train_step
    from stablediffusion_tpu.utils.testing import random_model_params

    dt = jnp.bfloat16
    frozen = {
        "unet": random_model_params(unet.init_params, SD15_UNET, dtype=dt),
        "vae": random_model_params(vae.init_params, SD15_VAE, dtype=jnp.float32),
        "text_encoder": random_model_params(
            clip.init_params, SD15_TEXT_ENCODER, dtype=dt
        ),
    }
    lora = {
        "unet": init_lora(
            jax.random.key(0), frozen["unet"], 16, UNET_TARGET_SUFFIXES,
            store_alpha=False,
        )
    }
    sched_cfg = SchedulerConfig()
    statics = TrainStatics(
        unet_config=SD15_UNET,
        vae_config=SD15_VAE,
        text_config=SD15_TEXT_ENCODER,
        text_config_2=None,
        scheduler_config=sched_cfg,
        train_text_encoder=False,
        snr_gamma=5.0,
        compute_dtype=dt,
        gradient_checkpointing=remat,
        vae_microbatch=mb,
    )
    optimizer = make_optimizer(make_lr_schedule("constant", 1e-4))
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(statics, DDPMScheduler(sched_cfg), optimizer)

    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, 512, 512, 3)) * 0.5, jnp.float32
        ),
        "input_ids": jnp.asarray(rng.integers(0, 49407, (B, 77)), jnp.int32),
    }

    t0 = time.perf_counter()
    lora, opt_state, m = step_fn(lora, opt_state, frozen, batch, jax.random.key(1))
    loss = float(m["loss"])
    print(f"B={B} mb={mb} remat={remat}: compiled+step1 in "
          f"{time.perf_counter()-t0:.1f}s loss={loss:.4f}", flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        lora, opt_state, m = step_fn(
            lora, opt_state, frozen, batch, jax.random.key(2 + i)
        )
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "metric": "sd15_512px_lora_train_images_per_sec_per_chip",
                "value": round(B / best, 3),
                "detail": {"batch": B, "sec_per_step": round(best, 3),
                           "vae_microbatch": mb, "remat": remat},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    remat = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    run(B, mb, remat)
