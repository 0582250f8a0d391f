"""SD3-medium LoRA training throughput on one chip (1024² or 512² images,
flow-matching loss, rank-16 factors on both MM-DiT streams, frozen
VAE/CLIP/T5-dropped).  Mirrors bench_train16.py methodology: one jitted step,
time by fetching the loss scalar."""

import json
import sys
import time

from stablediffusion_tpu.utils.bench_utils import hbm_stats




def run(B, res, policy="none", split=0, mb=None):
    from stablediffusion_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stablediffusion_tpu.core.config import (
        SD3_MEDIUM,
        SD3_VAE,
        SDXL_TEXT_ENCODER_2,
        SD15_TEXT_ENCODER,
        SchedulerConfig,
    )
    from stablediffusion_tpu.lora.core import init_lora
    from stablediffusion_tpu.models import clip, mmdit, vae
    from stablediffusion_tpu.schedulers.flow_match import FlowMatchEulerScheduler
    from stablediffusion_tpu.train.optim import make_lr_schedule, make_optimizer
    from stablediffusion_tpu.train.sd3_train import (
        MMDIT_TARGET_SUFFIXES,
        SD3TrainStatics,
        make_sd3_encode_fn,
        sd3_lora_loss_fn,
    )
    from stablediffusion_tpu.train.train_step import make_train_step
    from stablediffusion_tpu.utils.testing import random_model_params
    import dataclasses

    dt = jnp.bfloat16
    te_cfg = dataclasses.replace(SD15_TEXT_ENCODER, with_projection=True)
    te2_cfg = SDXL_TEXT_ENCODER_2
    frozen = {
        "transformer": random_model_params(mmdit.init_params, SD3_MEDIUM, dtype=dt),
        "vae": random_model_params(vae.init_params, SD3_VAE, dtype=jnp.float32),
        "text_encoder": random_model_params(clip.init_params, te_cfg, dtype=dt),
        "text_encoder_2": random_model_params(clip.init_params, te2_cfg, dtype=dt),
    }
    lora = {
        "transformer": init_lora(
            jax.random.key(0), frozen["transformer"], 16,
            MMDIT_TARGET_SUFFIXES, store_alpha=False,
        )
    }
    sched_cfg = SchedulerConfig(shift=3.0)
    statics = SD3TrainStatics(
        transformer_config=SD3_MEDIUM,
        vae_config=SD3_VAE,
        text_config=te_cfg,
        text_config_2=te2_cfg,
        text_config_3=None,  # T5-dropped training configuration
        scheduler_config=sched_cfg,
        compute_dtype=dt,
        remat_policy=policy,
        vae_microbatch=mb if mb is not None else min(8, B),
    )
    optimizer = make_optimizer(make_lr_schedule("constant", 1e-4))
    opt_state = optimizer.init(lora)
    step_fn = make_train_step(
        statics, FlowMatchEulerScheduler(sched_cfg), optimizer,
        loss=sd3_lora_loss_fn,
    )
    encode_fn = make_sd3_encode_fn(statics) if split else None

    def one_step(key):
        b = batch
        if encode_fn is not None:
            key, k_enc = jax.random.split(key)
            b = encode_fn(frozen, b, k_enc)
        return step_fn(lora, opt_state, frozen, b, key)

    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, res, res, 3)) * 0.5, jnp.float32
        ),
        "input_ids": jnp.asarray(rng.integers(0, 49407, (B, 77)), jnp.int32),
        "input_ids_2": jnp.asarray(rng.integers(0, 49407, (B, 77)), jnp.int32),
    }

    t0 = time.perf_counter()
    lora, opt_state, m = one_step(jax.random.key(1))
    loss = float(m["loss"])
    print(f"B={B} res={res} policy={policy} split={split}: compiled+step1 in "
          f"{time.perf_counter()-t0:.1f}s loss={loss:.4f} hbm={hbm_stats()}",
          flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        lora, opt_state, m = one_step(jax.random.key(2 + i))
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    payload = {
                "metric": f"sd3m_{res}px_lora_train_images_per_sec_per_chip",
                "value": round(B / best, 3),
                "unit": "images/sec",
                "detail": {"batch": B, "sec_per_step": round(best, 3),
                           "remat_policy": policy, "split_encode": bool(split),
                           "hbm": hbm_stats()},
    }
    print(json.dumps(payload), flush=True)
    from stablediffusion_tpu.utils.bench_utils import record_result

    record_result(f"sd3m_{res}_lora_train", payload)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    policy = sys.argv[3] if len(sys.argv) > 3 else "none"
    split = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    mb = int(sys.argv[5]) if len(sys.argv) > 5 else None
    run(B, res, policy, split, mb)
