"""Serving request router — the runpod-worker analog (L5).

Mirrors the reference's handler (runpod-worker/handler_logic.py:54-151):
  * request schema {id, input: {mode?, model?, params?, prompt...}};
  * modes: "inference" (default) | "inference_wandb" | "constructor" | "train";
  * optional model block {type, name, loras, scheduler} hot-reloads the model
    (maybe_reload_model, :135-151);
  * `params` merge into top-level args; auto-seed when absent, seed echoed
    (:94-96);
  * images returned as base64 JPEG.

Fixed vs the reference (SURVEY.md behavior-vs-bug ledger): the wandb-mode
arity mismatch (crash, :108 vs :196) and constructor_mode's undefined
`self.last_adapters` (:253) — adapters are tracked on the model wrapper.
The model-reload mutation is the one critical section (SURVEY.md §5.2);
requests are serialized by the worker loop (single-writer).
"""

from __future__ import annotations

import base64
import io
import logging
import os
import time
import traceback
from typing import Any, Dict, Optional

import numpy as np

from stablediffusion_tpu.io.loader import load_sd_model, resolve_checkpoint
from stablediffusion_tpu.models.wrapper import SDModel
from stablediffusion_tpu.pipelines.unified import StableDiffusionUnifiedPipeline

logger = logging.getLogger(__name__)

INFERENCE_ARG_KEYS = (
    "prompt",
    "prompt_2",
    "negative_prompt",
    "negative_prompt_2",
    "height",
    "width",
    "num_images_per_prompt",
    "num_inference_steps",
    "denoising_start",
    "denoising_end",
    "guidance_scale",
    "guidance_rescale",
    "clip_skip",
    "prompt_weighting",
    "seed",
    "image",
    "strength",
    "image_guidance_scale",
    "mask_image",
    "masked_image_latents",
    "padding_mask_crop",
    "cache_interval",
    "vae_tiling",
    "freeu",
    "pag_scale",
    "pag_applied_layers",
    "hires_scale",
    "hires_strength",
    "hires_steps",
    "timesteps",
    "sigmas",
    "control_image",
    "controlnet_conditioning_scale",
    "cross_attention_kwargs",
    "ip_adapter_image",
    "ip_adapter_scale",
    # SD3-family extras (pipelines/sd3.py)
    "prompt_3",
    "negative_prompt_3",
    "max_sequence_length",
)


def encode_images_b64(images01: np.ndarray, fmt: str = "JPEG") -> list:
    """[B,H,W,3] in [0,1] float OR uint8 -> list of base64 strings
    (convert_pt_to_numpy + JPEG/base64, handler_logic.py:21-29,177-191)."""
    from PIL import Image

    from stablediffusion_tpu.utils.images import as_uint8

    out = []
    for im in as_uint8(images01):
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, format=fmt, quality=95)
        out.append(base64.b64encode(buf.getvalue()).decode("ascii"))
    return out


def decode_image_b64(data: str) -> np.ndarray:
    from PIL import Image

    im = Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")
    return np.asarray(im, np.float32) / 255.0


class Handler:
    """Request router bound to one model slot."""

    def __init__(
        self,
        model: Optional[SDModel] = None,
        model_dir: Optional[str] = None,
        lora_dir: Optional[str] = None,
        uploader=None,
        mesh=None,  # jax.sharding.Mesh: shard request batches over `data`
        #   (multi-chip throughput serving, SURVEY §2.10; per-sample seed
        #   streams keep per-request results identical to single-chip)
    ):
        from stablediffusion_tpu.serve.upload import make_uploader

        self.model = model
        self.model_dir = model_dir
        self.lora_dir = lora_dir or model_dir
        self.mesh = mesh
        # bumped on every request that may mutate model state (model block,
        # constructor sweep, train mode); the Batcher snapshots it at enqueue
        # and falls back to serial handling for requests that were queued
        # under a different model state (see serve/batcher.py)
        self.model_generation = 0
        # identities of the param trees at last TP placement: LoRA fuses /
        # reloads REPLACE the attribute objects, so identity change (not a
        # generation counter, which is bumped at request entry BEFORE any
        # in-request set_adapters) is what signals a needed re-placement
        self._tp_placed_ids = None
        # BUCKET_ENDPOINT_URL-gated image sink (ref handler_logic.py:32-51):
        # when configured, responses carry URLs instead of base64
        self.uploader = uploader if uploader is not None else make_uploader()
        # expected merge-batch size for quantize="auto" resolution; the
        # serving worker sets this to the Batcher's max_batch (throughput
        # regime) — standalone/handler-only use stays at the latency optimum
        self.expected_batch = 1

    # -- model hot-swap (maybe_reload_model analog) --------------------------
    def maybe_reload_model(self, model_cfg: Dict[str, Any]) -> None:
        mtype = model_cfg.get("type", getattr(self.model, "model_type", "sdxl"))
        name = model_cfg.get("name")
        if name is not None:
            path = resolve_checkpoint(mtype, name, cache_dir=self.model_dir)
            if self.model is None or self.model.path not in (
                path, os.path.abspath(path)
            ):
                logger.info("loading model %s (%s)", name, path)
                if os.path.isfile(path):
                    if mtype == "sd3":
                        raise ValueError(
                            "SD3 single-file checkpoints are not supported; "
                            "provide a diffusers-layout folder"
                        )
                    # A1111 single-file checkpoint; tokenizer folders live
                    # next to it or in the model dir
                    from stablediffusion_tpu.io.loader import (
                        load_sd_single_file,
                    )

                    tok_dir = None
                    for cand in (os.path.dirname(path), self.model_dir):
                        if cand and os.path.isdir(
                            os.path.join(cand, "tokenizer")
                        ):
                            tok_dir = cand
                            break
                    self.model = load_sd_single_file(
                        path,
                        tokenizer_dir=tok_dir,
                        prediction_type=model_cfg.get("prediction_type"),
                    )
                elif mtype == "sd3":
                    from stablediffusion_tpu.io.loader import load_sd3_model

                    self.model = load_sd3_model(path)
                else:
                    self.model = load_sd_model(path, model_type=mtype)
        if self.model is None:
            raise ValueError("no model loaded and no model.name provided")
        if "prediction_type" in model_cfg and model_cfg["prediction_type"]:
            # applies even when the idempotency check skipped a reload (a
            # v-pred single file first loaded without the hint would
            # otherwise silently stay epsilon)
            import dataclasses

            if (self.model.scheduler_config.prediction_type
                    != model_cfg["prediction_type"]):
                self.model.scheduler_config = dataclasses.replace(
                    self.model.scheduler_config,
                    prediction_type=model_cfg["prediction_type"],
                )
                self.model._scheduler = None  # rebuild from the new config
        if "loras" in model_cfg:
            loras = model_cfg["loras"]
            if loras:
                self.model.load_loras(loras, lora_dir=self.lora_dir)
            else:
                self.model.delete_adapters()
        if "scheduler" in model_cfg:
            self.model.set_scheduler(model_cfg["scheduler"])
        if "textual_inversion" in model_cfg:
            tis = model_cfg["textual_inversion"]
            if not hasattr(self.model, "load_textual_inversion"):
                if tis:
                    raise ValueError(
                        "textual_inversion is not supported for model type "
                        f"{getattr(self.model, 'model_type', '?')!r}"
                    )
            else:

                # declarative: the list IS the desired state.  Trust
                # boundary: requests name files on disk, so .pt embeddings
                # load with weights_only=True only — a file needing full
                # pickle deserialization is rejected, never executed.
                self.model.unload_textual_inversion()
                for ti in tis or []:
                    src = ti["path"] if isinstance(ti, dict) else str(ti)
                    if not os.path.exists(src) and self.model_dir:
                        src = os.path.join(self.model_dir, src)
                    self.model.load_textual_inversion(
                        src, token=ti.get("token") if isinstance(ti, dict) else None
                    )
        if "ip_adapter" in model_cfg:
            ip = model_cfg["ip_adapter"]
            if not hasattr(self.model, "load_ip_adapter"):
                # SD3Model has no IP-Adapter; clearing (falsy) is a no-op
                if ip:
                    raise ValueError(
                        "ip_adapter is not supported for model type "
                        f"{getattr(self.model, 'model_type', '?')!r}"
                    )
            elif ip:
                path = (
                    ip
                    if os.path.exists(str(ip))
                    else os.path.join(self.model_dir or ".", str(ip))
                )
                self.model.load_ip_adapter(path)
            else:
                self.model.unload_ip_adapter()
        if "quantize" in model_cfg:
            # opt-in int8 UNet ("auto" | "w8a8" | "w8" | "w8a8:N" mixed |
            # null to revert); declarative like the other keys — idempotent
            # when unchanged.  "auto" resolves against the server's
            # expected merge batch (self.expected_batch, set by the worker
            # to the batcher's max_batch) HERE so idempotence compares
            # concrete strings — a client sending "auto" on every request
            # must not re-quantize each time.
            q = model_cfg["quantize"] or None
            if not hasattr(self.model, "quantize"):
                if q:
                    raise ValueError(
                        "quantize is not supported for model type "
                        f"{getattr(self.model, 'model_type', '?')!r}"
                    )
            else:
                from stablediffusion_tpu.ops.quant import resolve_quant_mode

                q = resolve_quant_mode(
                    q, getattr(self, "expected_batch", 1)
                )
                if q != self.model.quant_mode:
                    # model.quantize validates the mode string BEFORE
                    # mutating state (ops/quant.validate_quant_mode), so a
                    # bad request surfaces cleanly with the model untouched
                    self.model.quantize(q)

    # -- entry ----------------------------------------------------------------
    def __call__(self, request_input: Dict[str, Any], request_id: str = "") -> Dict:
        t0 = time.time()
        try:
            mode = request_input.get("mode", "inference")
            if "model" in request_input and request_input["model"]:
                self.maybe_reload_model(request_input["model"])
                self.model_generation += 1
            if mode in ("constructor", "train"):
                # these modes mutate scheduler / adapter / LoRA state
                self.model_generation += 1
            if self.model is None:
                raise ValueError("no model loaded")

            args = dict(request_input.get("params") or {})
            for k in INFERENCE_ARG_KEYS:
                if k in request_input:
                    args[k] = request_input[k]
            # auto-seed + echo (ref: handler_logic.py:94-96)
            if args.get("seed") is None:
                args["seed"] = int(np.random.randint(0, int(1e9)))

            if mode == "inference":
                return self.inference_mode(args, t0, request_id=request_id)
            if mode == "inference_wandb":
                return self.inference_wandb_mode(args, t0)
            if mode == "constructor":
                return self.constructor_mode(args, t0)
            if mode == "train":
                return self.train_mode(request_input)
            raise ValueError(f"unknown mode {mode!r}")
        except Exception as e:  # error channel (ref: handler_logic.py:90-92)
            logger.error("request %s failed: %s", request_id, e)
            return {
                "error": f"{type(e).__name__}: {e}",
                "traceback": traceback.format_exc(),
            }

    _TP_PARAM_ATTRS = (
        "unet_params",
        "text_encoder_params",
        "text_encoder_2_params",
        "transformer_params",
    )

    def _ensure_tp_placement(self) -> None:
        """With a tensor>1 serving mesh, (re-)place the model's attention/MLP
        kernels sharded over the `tensor` axis (parallel/tp.py).  Re-applied
        whenever any param-tree OBJECT changed: checkpoint reloads and LoRA
        fuses (set_adapters — including the ones constructor mode issues
        mid-request, after the generation counter was already bumped)
        replace the attribute with a new replicated tree."""
        if self.mesh is None or self.mesh.shape.get("tensor", 1) <= 1:
            return
        ids = tuple(
            id(getattr(self.model, a, None)) for a in self._TP_PARAM_ATTRS
        )
        if ids == self._tp_placed_ids:
            return
        from stablediffusion_tpu.parallel.tp import shard_params_tp

        for attr in self._TP_PARAM_ATTRS:
            p = getattr(self.model, attr, None)
            if p is not None:
                setattr(self.model, attr, shard_params_tp(p, self.mesh))
        self._tp_placed_ids = tuple(
            id(getattr(self.model, a, None)) for a in self._TP_PARAM_ATTRS
        )

    # -- modes ----------------------------------------------------------------
    def _generate(self, args: Dict[str, Any], output_type: str = "uint8"):
        self._ensure_tp_placement()
        if "image" in args and isinstance(args["image"], str):
            args = dict(args, image=decode_image_b64(args["image"]))
        if "mask_image" in args and isinstance(args["mask_image"], str):
            args = dict(args, mask_image=decode_image_b64(args["mask_image"]))
        if "control_image" in args and isinstance(args["control_image"], str):
            args = dict(args, control_image=decode_image_b64(args["control_image"]))
        if "ip_adapter_image" in args and isinstance(args["ip_adapter_image"], str):
            args = dict(
                args, ip_adapter_image=decode_image_b64(args["ip_adapter_image"])
            )
        if getattr(self.model, "model_type", None) == "sd3":
            import inspect

            from stablediffusion_tpu.pipelines.sd3 import StableDiffusion3Pipeline

            # SD3 has a narrower arg surface (no controlnet/ip-adapter/
            # refiner); drop keys its __call__ doesn't take, with a warning,
            # instead of 500ing on a reused SDXL payload
            known = set(
                inspect.signature(StableDiffusion3Pipeline.__call__).parameters
            )
            dropped = sorted(k for k in args if k not in known)
            if dropped:
                logger.warning("sd3: ignoring unsupported args %s", dropped)
            args = {k: v for k, v in args.items() if k in known}
            return StableDiffusion3Pipeline(
                do_cfg=True, mesh=self.mesh, output_type=output_type
            )(self.model, **args)
        # output_type="uint8": quantize on device — the serving fetch is 4x
        # smaller and every sink (JPEG b64, uploader, wandb) wants uint8.
        # The batcher passes "uint8_device" to keep the fetch off the
        # dispatch thread (overlapped with the next device batch).
        pipe = StableDiffusionUnifiedPipeline(
            do_cfg=True, mesh=self.mesh, output_type=output_type
        )
        return pipe(self.model, **args)

    def warmup(
        self,
        steps: int = 25,
        size: Optional[int] = None,
        batches=(1,),
    ) -> float:
        """Pre-compile the serving hot path so the FIRST real request does
        not pay the XLA compile (1-15 min through a remote-compile tunnel;
        the persistent compile cache makes this a once-per-pod cost).  One
        generation per requested batch size — num_images_per_prompt=k
        compiles the same [k, h, w, C] denoise/decode programs a merged
        k-request micro-batch uses.  Returns seconds spent."""
        t0 = time.time()
        for k in batches:
            args: Dict[str, Any] = {
                "prompt": "warmup",
                "num_inference_steps": int(steps),
                "num_images_per_prompt": int(k),
                "seed": 0,
            }
            if size:
                args["height"] = args["width"] = int(size)
            self._generate(args)
        dt = time.time() - t0
        logger.info(
            "warmup: batches %s, %d steps in %.1f s", tuple(batches), steps, dt
        )
        return dt

    def inference_mode(
        self, args: Dict[str, Any], t0: float, request_id: str = ""
    ) -> Dict:
        out = self._generate(args)
        if self.uploader is not None:
            images = self.uploader.upload(out.images, request_id)
        else:
            images = encode_images_b64(out.images)
        return {
            "images": images,
            "seed": out.seed,
            "time_sec": round(time.time() - t0, 3),
        }

    def inference_wandb_mode(self, args: Dict[str, Any], t0: float) -> Dict:
        """Generation + experiment logging.  wandb is optional; without it the
        run config is returned inline (the reference crashes here — fixed)."""
        out = self._generate(args)
        config = {
            "prompt": args.get("prompt"),
            "negative_prompt": args.get("negative_prompt"),
            "scheduler": self.model.scheduler_name,
            "steps": args.get("num_inference_steps", 50),
            "cfg": args.get("guidance_scale", 5.0),
            "clip_skip": args.get("clip_skip"),
            "seed": out.seed,
            "adapters": self.model.get_list_adapters(),
        }
        run_url = None
        try:
            import wandb

            run = wandb.init(project="sdtpu-inference", config=config)
            # per-prompt config *table*, one row per image
            # (ref: handler_logic.py:293-351)
            columns = [
                "prompt", "negative_prompt", "scheduler", "steps", "cfg",
                "clip_skip", "seed", "adapters", "image",
            ]
            table = wandb.Table(columns=columns)
            for im in out.images:
                table.add_data(
                    config["prompt"], config["negative_prompt"],
                    config["scheduler"], config["steps"], config["cfg"],
                    config["clip_skip"], config["seed"],
                    str(config["adapters"]), wandb.Image(im),
                )
            run.log({
                "images": [wandb.Image(im) for im in out.images],
                "generations": table,
            })
            run_url = run.get_url()
            run.finish()
        except ImportError:
            logger.info("wandb unavailable; returning config inline")
        return {
            "images": encode_images_b64(out.images),
            "seed": out.seed,
            "config": config,
            "wandb_url": run_url,
            "time_sec": round(time.time() - t0, 3),
        }

    def constructor_mode(self, args: Dict[str, Any], t0: float) -> Dict:
        """Hyperparameter grid sweep (ref: handler_logic.py:241-290).
        Defaults mirror the reference (:244-251)."""
        schedulers = args.pop("schedulers", ["DPM++ 2M SDE Karras"])
        lora_scales = args.pop("lora_scales", [0.7])
        steps_grid = args.pop("steps_grid", [30])
        cfg_grid = args.pop("guidance_grid", [7])
        base_adapters = self.model.get_list_adapters()
        results = []
        for sched in schedulers:
            self.model.set_scheduler(sched)
            for scale in lora_scales:
                if base_adapters:
                    self.model.set_adapters(
                        {n: scale for n in base_adapters}
                    )
                for steps in steps_grid:
                    for cfg in cfg_grid:
                        out = self._generate(
                            dict(
                                args,
                                num_inference_steps=int(steps),
                                guidance_scale=float(cfg),
                            )
                        )
                        results.append(
                            {
                                "scheduler": sched,
                                "lora_scale": scale,
                                "steps": steps,
                                "guidance_scale": cfg,
                                "seed": out.seed,
                                "images": encode_images_b64(out.images),
                            }
                        )
        if base_adapters:
            self.model.set_adapters(base_adapters)
        return {"grid": results, "time_sec": round(time.time() - t0, 3)}

    def train_mode(self, request_input: Dict[str, Any]) -> Dict:
        """In-process LoRA training (the reference's mode is an empty stub,
        handler_logic.py:125-127 — implemented here)."""
        from stablediffusion_tpu.train.trainer import SDLoRATrainer, SDTrainingArgs

        cfg = request_input.get("train") or {}
        data_dir = cfg.pop("data_dir", None)
        if not data_dir:
            raise ValueError("train mode requires train.data_dir")
        args = SDTrainingArgs(**cfg)
        trainer = SDLoRATrainer(self.model, args, data_dir)
        trainer.train()
        out: Dict[str, Any] = {"history": trainer.history}
        if args.full_finetune:
            # full mode saves a diffusers-layout model folder, no LoRA file
            out["model_path"] = args.output_dir
        else:
            out["lora_path"] = (
                f"{args.output_dir}/pytorch_lora_weights.safetensors"
            )
        return out
