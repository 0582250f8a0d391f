"""SDModel — the model-management layer (SDModelWrapper analog, L3).

The reference's SDModelWrapper (models/stable_diffusion.py:40-335) holds
vae / unet / text encoder(s) / tokenizer(s) / scheduler, distinguishes sd15
vs sdxl by the presence of a second text encoder, switches schedulers by name
over a shared config, and manages LoRA adapters.  Here it is a mutable holder
of (config, params) pairs; checkpoint loading lives in io/loader.py and LoRA
management in lora/.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax

from stablediffusion_tpu.core.config import (
    CLIPTextConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from stablediffusion_tpu.schedulers import BaseScheduler, make_scheduler


@dataclass
class SDModel:
    model_type: str  # "sd15" | "sdxl"
    unet_config: UNetConfig
    unet_params: Any
    vae_config: VAEConfig
    vae_params: Any
    text_encoder_config: CLIPTextConfig
    text_encoder_params: Any
    tokenizer: Any
    # SDXL second tower (presence == sdxl, mirroring the reference's
    # attribute-deletion dispatch at models/stable_diffusion.py:60-76)
    text_encoder_2_config: Optional[CLIPTextConfig] = None
    text_encoder_2_params: Optional[Any] = None
    tokenizer_2: Optional[Any] = None
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    scheduler_name: str = "DDIM"
    refiner_config: Optional[UNetConfig] = None
    refiner_params: Optional[Any] = None
    # LoRA bookkeeping (adapter name -> weight); see lora/
    adapters: Dict[str, float] = field(default_factory=dict)
    path: Optional[str] = None

    _scheduler: Optional[BaseScheduler] = field(default=None, repr=False)

    @property
    def is_sdxl(self) -> bool:
        return self.text_encoder_2_params is not None

    @property
    def vae_scale_factor(self) -> int:
        return self.vae_config.vae_scale_factor

    @property
    def scheduler(self) -> BaseScheduler:
        if self._scheduler is None:
            self._scheduler = make_scheduler(
                self.scheduler_name, self.scheduler_config
            )
        return self._scheduler

    def set_scheduler(self, name: str) -> None:
        """Idempotent name switch over the shared config
        (ref: models/stable_diffusion.py:199-227)."""
        if name == self.scheduler_name and self._scheduler is not None:
            return
        self._scheduler = make_scheduler(name, self.scheduler_config)
        self.scheduler_name = name

    def get_list_adapters(self) -> Dict[str, float]:
        return dict(self.adapters)
