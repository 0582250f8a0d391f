"""LCM scheduler (Latent Consistency Models, Luo et al. 2023).

PAPERS.md retrieved the LCM-LoRA acceleration papers twice: a distilled
LCM-LoRA adapter (loadable through our standard LoRA path) plus this
scheduler gives 4-8-step generation.  Conventions follow the published
LCM formulation: timesteps subsampled from the 50-step origin grid,
consistency boundary scalings (sigma_data 0.5, timestep scaling 10), and
ancestral re-noising between steps (fresh noise each step, none after the
last).
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
    prediction_to_x0_eps,
    reject_custom_sigmas,
)

ORIGIN_STEPS = 50
SIGMA_DATA = 0.5
TIMESTEP_SCALING = 10.0


class LCMScheduler(BaseScheduler):
    order = 1

    def uses_noise(self) -> bool:
        return True

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        reject_custom_sigmas(self, sigmas)
        T = self.config.num_train_timesteps
        if timesteps is None:
            if num_steps > ORIGIN_STEPS:
                raise ValueError(
                    f"LCM supports at most {ORIGIN_STEPS} steps, got {num_steps}"
                )
            c = T // ORIGIN_STEPS
            origin = np.arange(1, ORIGIN_STEPS + 1) * c - 1  # ascending
            # diffusers LCMScheduler convention: floor-linspace indices into
            # the descending origin grid (NOT a fixed stride — they differ
            # from index 2 on, e.g. 4 steps: [999, 759, 499, 259])
            idx = np.floor(
                np.linspace(0, len(origin), num_steps, endpoint=False)
            ).astype(np.int64)
            timesteps = origin[::-1][idx]
        timesteps = np.asarray(timesteps)
        return Plan(
            timesteps=jnp.asarray(timesteps, jnp.int32),
            sigmas=jnp.zeros((len(timesteps) + 1,), jnp.float32),
            alphas_cumprod=self.alphas_cumprod,
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            final_alpha_cumprod=jnp.asarray(1.0, jnp.float32),
            num_steps=len(timesteps),
            step_ratio=T // ORIGIN_STEPS,
        )

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        assert key is not None, "LCM step needs a PRNG key"
        t = plan.timesteps[i]
        ac_t = plan.alphas_cumprod[t]
        prev_t = plan.timesteps[jnp.clip(i + 1, 0, plan.num_steps - 1)]
        ac_prev = plan.alphas_cumprod[prev_t]

        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        x0, _ = prediction_to_x0_eps(
            self.config.prediction_type, out32, sample32,
            jnp.sqrt(ac_t), jnp.sqrt(1.0 - ac_t),
        )
        # consistency boundary conditions: scaled_timestep = t * 10 (the
        # LCM-paper/LCM-LoRA distillation convention), so c_skip -> ~0 and
        # c_out -> ~1 at the final (small-t) step
        st = t.astype(jnp.float32) * TIMESTEP_SCALING
        c_skip = SIGMA_DATA**2 / (st**2 + SIGMA_DATA**2)
        c_out = st / jnp.sqrt(st**2 + SIGMA_DATA**2)
        denoised = c_out * x0 + c_skip * sample32

        noise = step_noise(key, sample32)
        renoised = jnp.sqrt(ac_prev) * denoised + jnp.sqrt(1.0 - ac_prev) * noise
        prev = jnp.where(i < plan.num_steps - 1, renoised, denoised)
        return prev.astype(sample.dtype), state

    def add_noise_index(self, plan: Plan, original, noise, i):
        return self.add_noise(original, noise, plan.timesteps[i])
