"""Euler discrete and Euler-ancestral samplers (k-diffusion family).

Reference binding: "euler" / "euler_a" names at models/stable_diffusion.py:
205-224.  These work in the sigma ("variance-exploding view") parametrization:
latents carry magnitude x0 + sigma*eps, `scale_model_input` divides by
sqrt(sigma^2+1) before the UNet, and txt2img initial noise is scaled by
`init_noise_sigma` (ref: sd_unified_pipeline.py:472,785).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.schedulers.common import (
    step_noise,
    BaseScheduler,
    Plan,
    karras_sigma_grid,
    make_timestep_grid,
    sigmas_from_alphas_cumprod,
    timesteps_from_sigmas,
)


class EulerDiscreteScheduler(BaseScheduler):
    order = 1

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        if timesteps is not None and sigmas is not None:
            raise ValueError("pass only one of `timesteps` or `sigmas`")
        if timesteps is not None and self.config.use_karras_sigmas:
            raise ValueError(
                "cannot use custom `timesteps` with use_karras_sigmas=True"
            )
        full_sigmas = sigmas_from_alphas_cumprod(self._alphas_cumprod_np)
        if sigmas is not None:
            # user sigma list (descending, no terminal 0): timesteps by
            # log-sigma interpolation; the Karras branch is skipped
            sigmas = np.asarray(sigmas, np.float64)
            timesteps = timesteps_from_sigmas(sigmas, full_sigmas)
        else:
            if timesteps is None:
                timesteps = make_timestep_grid(self.config, num_steps).astype(
                    np.float64
                )
            else:
                timesteps = np.asarray(timesteps, np.float64)
            sigmas = np.interp(timesteps, np.arange(len(full_sigmas)), full_sigmas)
            if self.config.use_karras_sigmas:
                sigmas = karras_sigma_grid(sigmas[-1], sigmas[0], len(timesteps))
                timesteps = timesteps_from_sigmas(sigmas, full_sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

        if self.config.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)

        return Plan(
            timesteps=jnp.asarray(timesteps, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            alphas_cumprod=self.alphas_cumprod,
            init_noise_sigma=jnp.asarray(init_noise_sigma, jnp.float32),
            final_alpha_cumprod=jnp.asarray(
                float(self._alphas_cumprod_np[0]), jnp.float32
            ),
            num_steps=len(timesteps),
        )

    def scale_model_input(self, plan: Plan, sample, i):
        sigma = plan.sigmas[i]
        return (sample.astype(jnp.float32) / jnp.sqrt(sigma**2 + 1.0)).astype(
            sample.dtype
        )

    def _pred_x0(self, model_output, sample, sigma):
        pt = self.config.prediction_type
        if pt == "epsilon":
            return sample - sigma * model_output
        if pt == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample / (
                sigma**2 + 1
            )
        if pt == "sample":
            return model_output
        raise ValueError(pt)

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        sigma = plan.sigmas[i]
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        x0 = self._pred_x0(out32, sample32, sigma)
        derivative = (sample32 - x0) / sigma
        dt = plan.sigmas[i + 1] - sigma
        prev = sample32 + derivative * dt
        return prev.astype(sample.dtype), state

    # img2img: Euler-family add_noise works in sigma space (x0 + sigma*noise)
    def add_noise_index(self, plan: Plan, original, noise, i):
        sigma = plan.sigmas[i]
        return (original.astype(jnp.float32) + sigma * noise.astype(jnp.float32)).astype(
            original.dtype
        )


class EulerAncestralScheduler(EulerDiscreteScheduler):
    """Euler-ancestral: Euler step to sigma_down plus fresh noise sigma_up."""

    def uses_noise(self) -> bool:
        return True

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        assert key is not None, "euler_a step needs a PRNG key"
        sigma_from = plan.sigmas[i]
        sigma_to = plan.sigmas[i + 1]
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        x0 = self._pred_x0(out32, sample32, sigma_from)

        sigma_up2 = sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2
        sigma_up = jnp.sqrt(jnp.maximum(sigma_up2, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up2, 0.0))

        derivative = (sample32 - x0) / sigma_from
        dt = sigma_down - sigma_from
        prev = sample32 + derivative * dt
        noise = step_noise(key, prev)
        prev = prev + noise * sigma_up
        return prev.astype(sample.dtype), state
