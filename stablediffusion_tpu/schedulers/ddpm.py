"""DDPM (Ho et al. 2020) — the training-side scheduler.

The reference uses DDPMScheduler for forward diffusion during LoRA training
(`add_noise`, `get_velocity`; ref: train_lora_pipeline.py:428,463).  Those two
live on :class:`BaseScheduler`; this class adds the ancestral sampling step
for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.core.config import SchedulerConfig
from stablediffusion_tpu.schedulers.common import (
    step_noise,
    BaseScheduler,
    Plan,
    make_betas,
    make_timestep_grid,
    prediction_to_x0_eps,
    reject_custom_sigmas,
)


class DDPMScheduler(BaseScheduler):
    order = 1

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        super().__init__(config)
        self.betas = jnp.asarray(make_betas(config), jnp.float32)

    def uses_noise(self) -> bool:
        return True

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        reject_custom_sigmas(self, sigmas)
        if timesteps is None:
            timesteps = make_timestep_grid(self.config, num_steps)
        return Plan(
            timesteps=jnp.asarray(timesteps, jnp.int32),
            sigmas=jnp.zeros((len(timesteps) + 1,), jnp.float32),
            alphas_cumprod=self.alphas_cumprod,
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            final_alpha_cumprod=jnp.asarray(1.0, jnp.float32),
            num_steps=len(timesteps),
            step_ratio=self.config.num_train_timesteps // num_steps,
        )

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        assert key is not None, "DDPM step needs a PRNG key"
        t = plan.timesteps[i]
        ratio = plan.step_ratio or (
            self.config.num_train_timesteps // plan.num_steps
        )
        prev_t = t - ratio

        ac_t = plan.alphas_cumprod[t]
        ac_prev = jnp.where(prev_t >= 0, plan.alphas_cumprod[jnp.clip(prev_t, 0)], 1.0)
        current_alpha = ac_t / ac_prev
        current_beta = 1.0 - current_alpha

        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        x0, eps = prediction_to_x0_eps(
            self.config.prediction_type, out32, sample32, jnp.sqrt(ac_t), jnp.sqrt(1 - ac_t)
        )
        if self.config.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        x0_coeff = jnp.sqrt(ac_prev) * current_beta / (1.0 - ac_t)
        cur_coeff = jnp.sqrt(current_alpha) * (1.0 - ac_prev) / (1.0 - ac_t)
        mean = x0_coeff * x0 + cur_coeff * sample32

        variance = (1.0 - ac_prev) / (1.0 - ac_t) * current_beta
        variance = jnp.clip(variance, 1e-20)
        noise = step_noise(key, sample32)
        prev = mean + jnp.where(t > 0, jnp.sqrt(variance), 0.0) * noise
        return prev.astype(sample.dtype), state

    def add_noise_index(self, plan: Plan, original, noise, i):
        return self.add_noise(original, noise, plan.timesteps[i])
