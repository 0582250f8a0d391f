"""LoRA training throughput: full-size SD1.5 at 512², one chip.

One jitted train step (VAE encode -> add_noise -> CLIP encode -> UNet
forward+backward to rank-16 LoRA factors -> AdamW), random weights.
"""

import json
import time


def main():
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

    B = 8
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

    lora, opt_state, m = step_fn(lora, opt_state, frozen, batch, jax.random.key(1))
    float(m["loss"])  # force compile + first step
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        lora, opt_state, m = step_fn(
            lora, opt_state, frozen, batch, jax.random.key(2 + i)
        )
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)

    # FLOPs of the whole fwd+bwd+optimizer step (same trace-time flash mode)
    from stablediffusion_tpu.utils.bench_utils import (
        compiled_cost,
        flops_fields,
        record_result,
    )

    with step_fn._flash_all():
        cost = compiled_cost(
            step_fn._jitted.lower(
                lora, opt_state, frozen, batch, jax.random.key(1)
            ).compile()
        )
    payload = {
        "metric": "sd15_512px_lora_train_images_per_sec_per_chip",
        "value": round(B / best, 3),
        "unit": "images/sec",
        "detail": {
            "batch": B,
            "sec_per_step": round(best, 3),
            "rank": 16,
            **flops_fields(cost.get("flops"), best, per=B),
        },
    }
    record_result("sd15_lora_train", payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
