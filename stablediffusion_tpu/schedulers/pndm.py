"""PNDM / PLMS (Liu et al. 2022) — linear multistep over a 4-deep epsilon
history with the SD `skip_prk_steps=True` convention.

Reference binding: "PNDM" at models/stable_diffusion.py:205-224.  The PLMS
grid duplicates the second-to-last base timestep (a warm-up Heun-like double
evaluation), so a request for N steps runs N+1 UNet evaluations.

Scan design: the epsilon history is a fixed [4, ...] ring buffer (newest at
index 0); the AB-style combination weights are a pure function of the step
index, selected from a constant table — no data-dependent Python control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.schedulers.common import (
    BaseScheduler,
    Plan,
    reject_custom_sigmas,
)


class PNDMScheduler(BaseScheduler):
    order = 1

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        reject_custom_sigmas(self, sigmas)
        if timesteps is None:
            T = self.config.num_train_timesteps
            ratio = T // num_steps
            base = (np.arange(num_steps) * ratio).round().astype(np.int64)
            base += self.config.steps_offset
            # PLMS: duplicate second-to-last, then reverse
            ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
        else:
            ts = np.asarray(timesteps)
        return Plan(
            timesteps=jnp.asarray(ts, jnp.int32),
            sigmas=jnp.zeros((len(ts) + 1,), jnp.float32),
            alphas_cumprod=self.alphas_cumprod,
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            final_alpha_cumprod=jnp.asarray(
                float(self._alphas_cumprod_np[0]), jnp.float32
            ),
            num_steps=len(ts),
            step_ratio=self.config.num_train_timesteps // num_steps,
        )

    def init_state(self, plan: Plan, sample_shape, dtype=jnp.float32):
        return (
            jnp.zeros((4,) + tuple(sample_shape), jnp.float32),  # eps ring buffer
            jnp.zeros(sample_shape, jnp.float32),  # cur_sample (step-0 stash)
        )

    def _prev_sample(self, plan, sample, t, prev_t, eps):
        ac_t = plan.alphas_cumprod[t]
        ac_prev = jnp.where(
            prev_t >= 0,
            plan.alphas_cumprod[jnp.clip(prev_t, 0)],
            plan.final_alpha_cumprod,
        )
        if self.config.prediction_type == "v_prediction":
            eps = jnp.sqrt(ac_t) * eps + jnp.sqrt(1 - ac_t) * sample
        coeff = jnp.sqrt(ac_prev / ac_t)
        denom = ac_t * jnp.sqrt(1 - ac_prev) + jnp.sqrt(ac_t * (1 - ac_t) * ac_prev)
        return coeff * sample - (ac_prev - ac_t) * eps / denom

    # PLMS AB weights over the eps history [newest, ..., oldest], rows by
    # history depth 2..4
    _AB = np.array(
        [
            [3 / 2, -1 / 2, 0, 0],
            [23 / 12, -16 / 12, 5 / 12, 0],
            [55 / 24, -59 / 24, 37 / 24, -9 / 24],
        ],
        dtype=np.float32,
    )

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        ets, cur_sample = state
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        # base-grid step ratio (plan has N+1 plms steps for N base steps)
        ratio = plan.step_ratio or (
            self.config.num_train_timesteps // (plan.num_steps - 1)
        )

        t = plan.timesteps[i]
        is_warm = i == 1  # the duplicated warm-up evaluation
        prev_t = jnp.where(is_warm, t, t - ratio)
        t_use = jnp.where(is_warm, t + ratio, t)

        # push eps into the ring buffer except at the warm-up step
        pushed = jnp.concatenate([out32[None], ets[:-1]], axis=0)
        ets_new = jnp.where(is_warm, ets, pushed)

        # combined model output
        depth = jnp.clip(i, 2, 4) - 2  # row in _AB for i >= 2
        weights = jnp.asarray(self._AB)[depth]  # [4]
        ab = jnp.tensordot(weights, ets_new, axes=1)
        eps = jnp.where(
            i == 0,
            out32,
            jnp.where(is_warm, 0.5 * (out32 + ets_new[0]), ab),
        )
        sample_used = jnp.where(is_warm, cur_sample, sample32)
        cur_new = jnp.where(i == 0, sample32, cur_sample)

        prev = self._prev_sample(plan, sample_used, t_use, prev_t, eps)
        return prev.astype(sample.dtype), (ets_new, cur_new)

    def add_noise_index(self, plan: Plan, original, noise, i):
        t = plan.timesteps[i]
        return self.add_noise(original, noise, t)
