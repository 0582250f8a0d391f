"""DDIM (Song et al. 2020), deterministic eta=0 variant.

Reference binding: "DDIM" name at models/stable_diffusion.py:205-224; used in
the denoise loop at sd_unified_pipeline.py:489.  Stateless: all per-run tables
live in a :class:`Plan`, the step is a pure function of (plan, i, model_out,
sample) suitable for ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.schedulers.common import (
    BaseScheduler,
    Plan,
    make_timestep_grid,
    prediction_to_x0_eps,
    reject_custom_sigmas,
)


class DDIMScheduler(BaseScheduler):
    order = 1

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        reject_custom_sigmas(self, sigmas)
        if timesteps is None:
            timesteps = make_timestep_grid(self.config, num_steps)
        timesteps = np.asarray(timesteps)
        final_alpha = (
            1.0 if self.config.set_alpha_to_one else float(self._alphas_cumprod_np[0])
        )
        return Plan(
            timesteps=jnp.asarray(timesteps, jnp.int32),
            sigmas=jnp.zeros((len(timesteps) + 1,), jnp.float32),
            alphas_cumprod=self.alphas_cumprod,
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            final_alpha_cumprod=jnp.asarray(final_alpha, jnp.float32),
            num_steps=len(timesteps),
            step_ratio=self.config.num_train_timesteps // num_steps,
        )

    def init_state(self, plan: Plan, sample_shape, dtype=jnp.float32):
        return ()

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        t = plan.timesteps[i]
        ratio = plan.step_ratio or (
            self.config.num_train_timesteps // plan.num_steps
        )
        prev_t = t - ratio

        ac_t = plan.alphas_cumprod[t]
        ac_prev = jnp.where(
            prev_t >= 0,
            plan.alphas_cumprod[jnp.clip(prev_t, 0)],
            plan.final_alpha_cumprod,
        )
        alpha_t = jnp.sqrt(ac_t)
        sigma_t = jnp.sqrt(1.0 - ac_t)

        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        x0, eps = prediction_to_x0_eps(
            self.config.prediction_type, out32, sample32, alpha_t, sigma_t
        )
        if self.config.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (sample32 - jnp.sqrt(ac_t) * x0) / sigma_t

        # eta = 0 (deterministic): x_{t-1} = sqrt(ac_prev) x0 + sqrt(1-ac_prev) eps
        prev = jnp.sqrt(ac_prev) * x0 + jnp.sqrt(1.0 - ac_prev) * eps
        return prev.astype(sample.dtype), state

    def add_noise_index(self, plan: Plan, original, noise, i):
        """add_noise at inference step index i (img2img latent prep,
        ref: sd_unified_pipeline.py:841)."""
        t = plan.timesteps[i]
        return self.add_noise(original, noise, t)
