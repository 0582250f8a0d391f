"""Scheduler registry — the reference's name→class switch
(models/stable_diffusion.py:199-227), including the Karras variants.

All schedulers share the stateless plan/step interface of
:mod:`stablediffusion_tpu.schedulers.common`, so the pipeline can compile any
of them into a single `lax.scan`.
"""

from __future__ import annotations

import dataclasses

from stablediffusion_tpu.core.config import SchedulerConfig
from stablediffusion_tpu.schedulers.common import BaseScheduler, Plan
from stablediffusion_tpu.schedulers.ddim import DDIMScheduler
from stablediffusion_tpu.schedulers.ddpm import DDPMScheduler
from stablediffusion_tpu.schedulers.dpm import DPMSolverMultistepScheduler
from stablediffusion_tpu.schedulers.euler import (
    EulerAncestralScheduler,
    EulerDiscreteScheduler,
)
from stablediffusion_tpu.schedulers.flow_match import FlowMatchEulerScheduler
from stablediffusion_tpu.schedulers.heun import HeunDiscreteScheduler
from stablediffusion_tpu.schedulers.lcm import LCMScheduler
from stablediffusion_tpu.schedulers.lms import LMSDiscreteScheduler
from stablediffusion_tpu.schedulers.pndm import PNDMScheduler
from stablediffusion_tpu.schedulers.unipc import UniPCScheduler

# name → (class, config overrides); names mirror the reference's switch
SCHEDULER_REGISTRY = {
    "DDIM": (DDIMScheduler, {}),
    "euler": (EulerDiscreteScheduler, {}),
    "euler_a": (EulerAncestralScheduler, {}),
    "DPM++ 2M": (DPMSolverMultistepScheduler, {"algorithm_type": "dpmsolver++"}),
    "DPM++ 2M Karras": (
        DPMSolverMultistepScheduler,
        {"algorithm_type": "dpmsolver++", "use_karras_sigmas": True},
    ),
    # the reference's `se_karras_sigmas` typo silently disabled Karras here
    # (models/stable_diffusion.py:217); we enable it for real.
    "DPM++ 2M SDE Karras": (
        DPMSolverMultistepScheduler,
        {"algorithm_type": "sde-dpmsolver++", "use_karras_sigmas": True},
    ),
    # A1111's third-order SDE family (k-diffusion sample_dpmpp_3m_sde)
    "DPM++ 3M SDE": (
        DPMSolverMultistepScheduler,
        {"algorithm_type": "sde-dpmsolver++", "solver_order": 3},
    ),
    "DPM++ 3M SDE Karras": (
        DPMSolverMultistepScheduler,
        {"algorithm_type": "sde-dpmsolver++", "solver_order": 3,
         "use_karras_sigmas": True},
    ),
    "PNDM": (PNDMScheduler, {}),
    "uni_pc": (UniPCScheduler, {}),
    # the A1111 converter's remaining scheduler_type choices
    # (scripts/convert_from_A1111.py:946-1003): Heun (2nd-order
    # predictor-corrector, interleaved plan) and LMS (Adams-Bashforth 4)
    "heun": (HeunDiscreteScheduler, {}),
    "lms": (LMSDiscreteScheduler, {}),
    "DDPM": (DDPMScheduler, {}),
    # 4-8 step generation with a distilled LCM-LoRA adapter (PAPERS.md)
    "LCM": (LCMScheduler, {}),
    # SD3 rectified flow (beyond-parity; diffusers FlowMatchEulerDiscrete)
    "FlowMatchEuler": (FlowMatchEulerScheduler, {}),
}

SCHEDULER_NAMES = tuple(SCHEDULER_REGISTRY.keys())


def make_scheduler(
    name: str, config: SchedulerConfig = SchedulerConfig()
) -> BaseScheduler:
    """Build a scheduler by its serving-API name over a shared base config
    (the `set_scheduler` equivalent, models/stable_diffusion.py:199)."""
    if name not in SCHEDULER_REGISTRY:
        raise ValueError(
            f"unknown scheduler {name!r}; available: {sorted(SCHEDULER_REGISTRY)}"
        )
    cls, overrides = SCHEDULER_REGISTRY[name]
    if overrides:
        config = dataclasses.replace(config, **overrides)
    return cls(config)


__all__ = [
    "BaseScheduler",
    "Plan",
    "SchedulerConfig",
    "DDIMScheduler",
    "DDPMScheduler",
    "FlowMatchEulerScheduler",
    "LCMScheduler",
    "DPMSolverMultistepScheduler",
    "EulerAncestralScheduler",
    "EulerDiscreteScheduler",
    "HeunDiscreteScheduler",
    "LMSDiscreteScheduler",
    "PNDMScheduler",
    "UniPCScheduler",
    "SCHEDULER_REGISTRY",
    "SCHEDULER_NAMES",
    "make_scheduler",
]
