"""Flow-matching Euler scheduler — the SD3 / rectified-flow sampler.

Beyond-parity (the reference repo is SD1.5/SDXL only); semantics follow
diffusers' FlowMatchEulerDiscreteScheduler so SD3-family checkpoints sample
identically:

  * train table: sigmas = t/T for t = T..1, resolution-shifted
    sigma' = shift*sigma / (1 + (shift-1)*sigma)  (shift=3.0 for SD3);
  * inference grid: linspace over t in [T*sigma_max', T*sigma_min'], mapped
    to sigmas and shifted again (the documented diffusers behavior);
  * the transformer predicts the flow velocity dx/dsigma = eps - x0, so the
    Euler step is  x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v;
  * noising:  x_t = (1 - sigma_t) * x0 + sigma_t * eps  (sigma_max' = 1, so
    txt2img starts from pure noise: init_noise_sigma = 1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.schedulers.common import (
    BaseScheduler,
    Plan,
    broadcast_to_sample,
)


class FlowMatchEulerScheduler(BaseScheduler):
    order = 1

    def __init__(self, config=None):
        from stablediffusion_tpu.core.config import SchedulerConfig

        self.config = config or SchedulerConfig()
        T = self.config.num_train_timesteps
        raw = np.arange(T, 0, -1, dtype=np.float64) / T  # 1 .. 1/T descending
        self._train_sigmas = self._shift(raw)
        self.sigma_min = float(self._train_sigmas[-1])
        self.sigma_max = float(self._train_sigmas[0])
        # alphas_cumprod has no meaning under rectified flow; keep a table so
        # shared Plan plumbing stays uniform
        self.alphas_cumprod = jnp.ones((T,), jnp.float32)
        self._alphas_cumprod_np = np.ones((T,), np.float64)

    def _shift(self, sigmas: np.ndarray) -> np.ndarray:
        s = self.config.shift
        return s * sigmas / (1.0 + (s - 1.0) * sigmas)

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        if timesteps is not None and sigmas is not None:
            raise ValueError("pass only one of `timesteps` or `sigmas`")
        T = self.config.num_train_timesteps
        if sigmas is not None:
            # user sigma list in (0, 1]: shifted as diffusers does
            sig = self._shift(np.asarray(sigmas, np.float64))
        elif timesteps is not None:
            sig = self._shift(np.asarray(timesteps, np.float64) / T)
        else:
            ts = np.linspace(T * self.sigma_max, T * self.sigma_min, num_steps)
            sig = self._shift(ts / T)
        ts_out = sig * T
        sig = np.concatenate([sig, [0.0]]).astype(np.float32)
        return Plan(
            timesteps=jnp.asarray(ts_out, jnp.float32),
            sigmas=jnp.asarray(sig, jnp.float32),
            alphas_cumprod=self.alphas_cumprod,
            init_noise_sigma=jnp.asarray(float(sig[0]), jnp.float32),
            final_alpha_cumprod=jnp.asarray(1.0, jnp.float32),
            num_steps=len(ts_out),
        )

    # -- inference ----------------------------------------------------------
    def scale_model_input(self, plan: Plan, sample, i):
        return sample

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        sigma = plan.sigmas[i]
        sigma_next = plan.sigmas[i + 1]
        prev = sample.astype(jnp.float32) + (sigma_next - sigma) * (
            model_output.astype(jnp.float32)
        )
        return prev.astype(sample.dtype), state

    def add_noise_index(self, plan: Plan, original, noise, i):
        sigma = plan.sigmas[i]
        out = (1.0 - sigma) * original.astype(jnp.float32) + sigma * (
            noise.astype(jnp.float32)
        )
        return out.astype(original.dtype)

    # -- training -----------------------------------------------------------
    def add_noise(self, original, noise, timesteps):
        """`timesteps` are flow timesteps (sigma * T, float)."""
        sigma = broadcast_to_sample(
            jnp.asarray(timesteps, jnp.float32)
            / self.config.num_train_timesteps,
            original,
        )
        return (
            (1.0 - sigma) * original.astype(jnp.float32)
            + sigma * noise.astype(jnp.float32)
        ).astype(original.dtype)

    def get_velocity(self, sample, noise, timesteps):
        """Flow-matching target: v = eps - x0."""
        return (noise.astype(jnp.float32) - sample.astype(jnp.float32)).astype(
            sample.dtype
        )
