"""convert_from_A1111 CLI — single-file LDM/A1111 checkpoint -> diffusers
layout (ref: scripts/convert_from_A1111.py:1337-1393).

Usage:
    python -m stablediffusion_tpu.io.convert_cli \
        --checkpoint_path model.safetensors --save_path out/ [--extract_ema]
"""

from __future__ import annotations

import argparse
import json
import os


def load_single_file(path: str) -> dict:
    """Load .safetensors (ours) or .ckpt (torch pickle) state dict."""
    if path.endswith(".safetensors"):
        from stablediffusion_tpu.io.safetensors_io import load_safetensors

        return load_safetensors(path)
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in state:
        state = state["state_dict"]
    return {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}


def convert(
    checkpoint_path: str,
    save_path: str,
    extract_ema: bool = False,
    scheduler_type: str = "ddim",
    half: bool = False,
    controlnet: bool = False,
):
    import numpy as np

    from stablediffusion_tpu.io.a1111 import convert_a1111_checkpoint
    from stablediffusion_tpu.io.safetensors_io import save_safetensors

    state = load_single_file(checkpoint_path)
    if controlnet:
        from stablediffusion_tpu.io.a1111 import (
            convert_controlnet,
            create_unet_config,
            infer_unet_params_from_state,
        )

        # controlnet single-file: trunk config inferred from its own shapes
        trunk = {
            "model.diffusion_model." + k[len("control_model."):]: v
            for k, v in state.items()
            if k.startswith("control_model.")
            and not k.startswith(("control_model.input_hint_block",
                                  "control_model.zero_convs",
                                  "control_model.middle_block_out"))
        }
        cfg = create_unet_config(infer_unet_params_from_state(trunk))
        flat = convert_controlnet(state, cfg)
        os.makedirs(save_path, exist_ok=True)
        if half:
            flat = {k: (v.astype(np.float16) if v.dtype == np.float32 else v)
                    for k, v in flat.items()}
        save_safetensors(
            flat,
            os.path.join(save_path,
                         f"diffusion_pytorch_model{'.fp16' if half else ''}.safetensors"),
        )
        with open(os.path.join(save_path, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2)
        return "controlnet"

    weights, configs = convert_a1111_checkpoint(state, extract_ema_weights=extract_ema)
    model_type = configs["model_type"]

    os.makedirs(save_path, exist_ok=True)
    sub_fname = {
        "unet": "diffusion_pytorch_model",
        "vae": "diffusion_pytorch_model",
        "text_encoder": "model",
        "text_encoder_2": "model",
    }
    for comp, flat in weights.items():
        d = os.path.join(save_path, comp)
        os.makedirs(d, exist_ok=True)
        if half:
            flat = {
                k: (v.astype(np.float16) if v.dtype == np.float32 else v)
                for k, v in flat.items()
            }
        variant = ".fp16" if half else ""
        save_safetensors(
            flat, os.path.join(d, f"{sub_fname[comp]}{variant}.safetensors")
        )
        cfg = configs.get(comp)
        if cfg:
            with open(os.path.join(d, "config.json"), "w") as f:
                json.dump(cfg, f, indent=2)

    # scheduler config (ref builds per --scheduler_type,
    # convert_from_A1111.py:940-1003)
    sched = {
        "num_train_timesteps": 1000,
        "beta_start": 0.00085,
        "beta_end": 0.012,
        "beta_schedule": "scaled_linear",
        "steps_offset": 1,
        "timestep_spacing": "leading",
        "prediction_type": "epsilon",
    }
    os.makedirs(os.path.join(save_path, "scheduler"), exist_ok=True)
    with open(os.path.join(save_path, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(sched, f, indent=2)
    with open(os.path.join(save_path, "model_index.json"), "w") as f:
        json.dump(
            {
                "_class_name": "StableDiffusionXLPipeline"
                if model_type == "sdxl"
                else "StableDiffusionPipeline",
                "_converted_from": os.path.basename(checkpoint_path),
                "_scheduler_type": scheduler_type,
            },
            f,
            indent=2,
        )
    return model_type


def main(argv=None):
    p = argparse.ArgumentParser(description="A1111/LDM -> diffusers layout")
    p.add_argument("--checkpoint_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--scheduler_type", default="ddim",
                   choices=["pndm", "lms", "heun", "euler", "euler-ancestral",
                            "dpm", "ddim"])
    p.add_argument("--extract_ema", action="store_true")
    p.add_argument("--from_safetensors", action="store_true",
                   help="accepted for parity; format is auto-detected")
    p.add_argument("--controlnet", action="store_true",
                   help="input is a ControlNet single-file checkpoint")
    p.add_argument("--half", action="store_true", help="save fp16 variant")
    args = p.parse_args(argv)
    mtype = convert(
        args.checkpoint_path,
        args.save_path,
        extract_ema=args.extract_ema,
        scheduler_type=args.scheduler_type,
        half=args.half,
        controlnet=args.controlnet,
    )
    print(f"converted {mtype} checkpoint -> {args.save_path}")


if __name__ == "__main__":
    main()
