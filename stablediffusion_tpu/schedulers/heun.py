"""Heun discrete sampler (k-diffusion 2nd-order, predictor-corrector).

Reference binding: the A1111 converter constructs ``HeunDiscreteScheduler``
for ``--scheduler_type heun`` (/root/reference/scripts/convert_from_A1111.py:
946-975); diffusers semantics are the published k-diffusion ``sample_heun``
with churn 0.

Scan-compatibility: Heun needs TWO model evals per output step, so the plan
interleaves the grid — timesteps ``[t0, t1, t1, t2, t2, ...]`` (2N-1 entries)
and sigmas ``[s0, s1, s1, ..., s_{N-1}, s_{N-1}, 0]`` — and the pipeline's
single `lax.scan` runs one UNet eval per scan index.  Even indices are the
first-order (Euler predictor) stage, odd indices the trapezoidal corrector;
the final step (even index, to sigma 0) stays first-order, exactly like
diffusers (a corrector there would need a model eval at sigma=0).  The
carried state is (predictor derivative, saved pre-predictor sample).

``Plan.order == 2`` so the pipeline's strength / denoising_start slices land
on pair boundaries (the diffusers ``t_start * scheduler.order`` convention).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.schedulers.common import Plan
from stablediffusion_tpu.schedulers.euler import EulerDiscreteScheduler

_TINY = 1e-10


class HeunDiscreteScheduler(EulerDiscreteScheduler):
    order = 2  # two scan indices per output step (plan is interleaved)

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        base = super().plan(num_steps, timesteps=timesteps, sigmas=sigmas)
        ts = np.asarray(base.timesteps)  # [N]
        sg = np.asarray(base.sigmas)  # [N+1] (terminal appended)
        ts2 = np.concatenate([ts[:1], np.repeat(ts[1:], 2)])
        sg2 = np.concatenate([sg[:1], np.repeat(sg[1:-1], 2), sg[-1:]])
        return Plan(
            timesteps=jnp.asarray(ts2, jnp.float32),
            sigmas=jnp.asarray(sg2, jnp.float32),
            alphas_cumprod=base.alphas_cumprod,
            init_noise_sigma=base.init_noise_sigma,
            final_alpha_cumprod=base.final_alpha_cumprod,
            num_steps=len(ts2),
            order=2,
        )

    def init_state(self, plan: Plan, sample_shape, dtype=jnp.float32):
        # (predictor derivative, sample the predictor started from)
        return (
            jnp.zeros(sample_shape, jnp.float32),
            jnp.zeros(sample_shape, jnp.float32),
        )

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        prev_deriv, saved_sample = state
        s = plan.sigmas
        first = (i % 2) == 0  # predictor stage at even scan indices
        sigma = jnp.where(first, s[i], s[jnp.clip(i - 1, 0)])
        sigma_next = jnp.where(first, s[i + 1], s[i])
        # predictor evaluates the model at sigma; the corrector's `sample` is
        # the Euler-predicted latent AT sigma_next, so x0/derivative use it
        sigma_input = jnp.where(first, sigma, sigma_next)

        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        x0 = self._pred_x0(out32, sample32, sigma_input)
        deriv = (sample32 - x0) / jnp.maximum(sigma_input, _TINY)

        dt = sigma_next - sigma
        predict = sample32 + deriv * dt
        correct = saved_sample + 0.5 * (prev_deriv + deriv) * dt
        prev = jnp.where(first, predict, correct)

        zero = jnp.zeros_like(sample32)
        new_state = (
            jnp.where(first, deriv, zero),
            jnp.where(first, sample32, zero),
        )
        return prev.astype(sample.dtype), new_state
