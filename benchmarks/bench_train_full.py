"""Full-model fine-tune throughput: full-size SD1.5 UNet at 512², one chip.

One jitted step (VAE encode -> add_noise -> CLIP encode -> UNet fwd+bwd to
the WHOLE UNet tree -> AdamW), random weights.  The 8-bit Adam flag is the
memory lever: fp32 moments for the 0.86B-param UNet are ~6.9G of HBM, the
blockwise int8/uint8 moments ~1.8G — the difference between fitting and not
fitting on a 16G chip at this batch.

Usage: bench_train_full.py [batch=4] [res=512] [use_8bit=1] [remat=none]
"""

import json
import sys
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
    from stablediffusion_tpu.models import clip, unet, vae
    from stablediffusion_tpu.schedulers import DDPMScheduler
    from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
    from stablediffusion_tpu.train.train_step import (
        TrainStatics,
        full_finetune_loss_fn,
        make_train_step,
    )
    from stablediffusion_tpu.utils.testing import random_model_params

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    use_8bit = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    remat = sys.argv[4] if len(sys.argv) > 4 else "none"

    dt = jnp.bfloat16
    trainable = random_model_params(unet.init_params, SD15_UNET,
                                    dtype=jnp.float32)
    frozen = {
        "vae": random_model_params(vae.init_params, SD15_VAE,
                                   dtype=jnp.float32),
        "text_encoder": random_model_params(
            clip.init_params, SD15_TEXT_ENCODER, dtype=dt
        ),
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
        remat_policy=remat,
    )
    optimizer = make_optimizer(make_lr_schedule("constant", 1e-5),
                               use_8bit=use_8bit)
    opt_state = optimizer.init(trainable)
    step_fn = make_train_step(statics, DDPMScheduler(sched_cfg), optimizer,
                              loss=full_finetune_loss_fn)

    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, res, res, 3)) * 0.5, jnp.float32
        ),
        "input_ids": jnp.asarray(rng.integers(0, 49407, (B, 77)), jnp.int32),
    }

    trainable, opt_state, m = step_fn(
        trainable, opt_state, frozen, batch, jax.random.key(1)
    )
    float(m["loss"])  # force compile + first step
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        trainable, opt_state, m = step_fn(
            trainable, opt_state, frozen, batch, jax.random.key(2 + i)
        )
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)

    from stablediffusion_tpu.utils.bench_utils import (
        compiled_cost,
        flops_fields,
        record_result,
    )

    with step_fn._flash_all():
        cost = compiled_cost(
            step_fn._jitted.lower(
                trainable, opt_state, frozen, batch, jax.random.key(1)
            ).compile()
        )
    payload = {
        "metric": f"sd15_{res}px_full_finetune_images_per_sec_per_chip",
        "value": round(B / best, 3),
        "unit": "images/sec",
        "detail": {
            "batch": B,
            "sec_per_step": round(best, 3),
            "use_8bit_adam": use_8bit,
            "remat": remat,
            **flops_fields(cost.get("flops"), best, per=B),
        },
    }
    record_result(f"sd15_full_finetune_b{B}_8bit{int(use_8bit)}", payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
