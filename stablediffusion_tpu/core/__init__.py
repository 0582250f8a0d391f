from stablediffusion_tpu.core.config import (
    CLIPTextConfig,
    UNetConfig,
    VAEConfig,
    SchedulerConfig,
    SD15_UNET,
    SD15_VAE,
    SD15_TEXT_ENCODER,
    SDXL_UNET,
    SDXL_VAE,
    SDXL_TEXT_ENCODER,
    SDXL_TEXT_ENCODER_2,
    tiny_unet_config,
    tiny_vae_config,
    tiny_clip_config,
)
from stablediffusion_tpu.core.dtypes import Policy, DEFAULT_POLICY, FP32_POLICY
