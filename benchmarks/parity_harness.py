"""Per-step MSE parity harness (the BASELINE "output MSE parity" metric).

diffusers/torch-CUDA is not installed in this environment, so parity is a
two-sided artifact exchange:

  record   — run OUR pipeline with injected initial latents and a fixed
             prompt-embedding tensor, recording every post-step latent to an
             .npz (plus the decoded image);
  compare  — given two trace files (ours vs one recorded from diffusers with
             the sibling script printed by `--print-diffusers-script`),
             report per-step MSE.

Identical initial latents/noise are injected on both sides (torch and JAX
RNGs cannot match; BASELINE.md defines parity at fixed-latents level).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def record(args):
    import jax
    import jax.numpy as jnp

    from stablediffusion_tpu.io.loader import load_sd_model
    from stablediffusion_tpu.models import unet as unet_model
    from stablediffusion_tpu.pipelines.unified import _vae_decode

    model = load_sd_model(args.model)
    scheduler = model.scheduler
    plan = scheduler.plan(args.steps)

    rng = np.random.default_rng(args.seed)
    B = 1
    h = w = args.resolution // model.vae_scale_factor
    lat0 = rng.standard_normal((B, h, w, 4)).astype(np.float32)
    embeds = rng.standard_normal(
        (2 * B, 77, model.unet_config.cross_attention_dim)
    ).astype(np.float32)

    lat = jnp.asarray(lat0) * plan.init_noise_sigma
    state = scheduler.init_state(plan, lat.shape)
    traces = []
    for i in range(plan.num_steps):
        x = jnp.concatenate([lat, lat], 0)
        x = scheduler.scale_model_input(plan, x, i)
        pred = unet_model.apply(
            model.unet_params, model.unet_config, x,
            plan.timesteps[i], jnp.asarray(embeds),
        )
        u, t = jnp.split(pred, 2, 0)
        pred = u + args.cfg * (t - u)
        lat, state = scheduler.step(plan, state, jnp.asarray(i), pred, lat,
                                    key=jax.random.key(i))
        traces.append(np.asarray(lat, np.float32))
    img = np.asarray(
        _vae_decode(model.vae_params, lat, config=model.vae_config,
                    force_upcast=model.vae_config.force_upcast)
    )
    np.savez(
        args.out,
        latents=np.stack(traces),  # [N, B, h, w, 4] NHWC
        image=img,
        init=lat0,
        embeds=embeds,
        timesteps=np.asarray(plan.timesteps),
        layout="NHWC",
    )
    print(f"recorded {plan.num_steps} steps -> {args.out}")


def compare(args):
    a = np.load(args.trace_a)
    b = np.load(args.trace_b)
    la, lb = a["latents"], b["latents"]
    if la.shape[-1] != 4 and la.shape[2] == 4:
        la = np.moveaxis(la, 2, -1)  # NCHW trace -> NHWC
    if lb.shape[-1] != 4 and lb.shape[2] == 4:
        lb = np.moveaxis(lb, 2, -1)
    n = min(len(la), len(lb))
    mses = [float(np.mean((la[i] - lb[i]) ** 2)) for i in range(n)]
    result = {
        "per_step_mse": mses,
        "max_step_mse": max(mses),
        "final_mse": mses[-1],
        "image_mse": float(np.mean((a["image"] - b["image"]) ** 2))
        if "image" in a and "image" in b
        else None,
    }
    print(json.dumps(result))


DIFFUSERS_SCRIPT = r'''
# Run in a diffusers environment to record the matching trace:
import numpy as np, torch
from diffusers import StableDiffusionPipeline, DDIMScheduler
ours = np.load("TRACE_FROM_SDTPU.npz")
pipe = StableDiffusionPipeline.from_pretrained(MODEL, torch_dtype=torch.float32)
pipe.scheduler = DDIMScheduler.from_config(pipe.scheduler.config)
pipe.scheduler.set_timesteps(len(ours["timesteps"]))
lat = torch.from_numpy(ours["init"]).permute(0, 3, 1, 2) * pipe.scheduler.init_noise_sigma
emb = torch.from_numpy(ours["embeds"])
traces = []
for i, t in enumerate(pipe.scheduler.timesteps):
    x = torch.cat([lat, lat])
    x = pipe.scheduler.scale_model_input(x, t)
    with torch.no_grad():
        pred = pipe.unet(x, t, encoder_hidden_states=emb).sample
    u, c = pred.chunk(2)
    pred = u + CFG * (c - u)
    lat = pipe.scheduler.step(pred, t, lat).prev_sample
    traces.append(lat.permute(0, 2, 3, 1).numpy())
np.savez("diffusers_trace.npz", latents=np.stack(traces), layout="NHWC")
'''


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("record")
    r.add_argument("--model", required=True)
    r.add_argument("--steps", type=int, default=20)
    r.add_argument("--resolution", type=int, default=512)
    r.add_argument("--cfg", type=float, default=7.5)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--out", default="sdtpu_trace.npz")
    c = sub.add_parser("compare")
    c.add_argument("trace_a")
    c.add_argument("trace_b")
    sub.add_parser("print-diffusers-script")
    args = p.parse_args()
    if args.cmd == "record":
        record(args)
    elif args.cmd == "compare":
        compare(args)
    else:
        print(DIFFUSERS_SCRIPT)


if __name__ == "__main__":
    main()
