"""DPM-Solver++ multistep (Lu et al. 2022), orders 1-3, with Karras-sigma
and SDE variants — including A1111's "DPM++ 3M SDE" (k-diffusion
sample_dpmpp_3m_sde, eta=1, translated to VP coordinates; warm-up and
order-lowered steps use the order-2 midpoint form, matching diffusers'
lower-order convention rather than k-diffusion's phi2 warm-up).

Reference binding: "DPM++ 2M", "DPM++ 2M Karras", "DPM++ 2M SDE Karras" at
models/stable_diffusion.py:205-224.  Note the reference has a typo
(`se_karras_sigmas`) that silently disables Karras sigmas for the SDE variant
(models/stable_diffusion.py:217); per SURVEY.md's behavior-vs-bug ledger we
implement real Karras sigmas.

Scan-compatibility notes: the step index `i` is traced inside lax.scan, so
first-order (warm-up / final) vs second-order selection is done with
`jnp.where` over both branches; every log/div is guarded so the *unselected*
branch stays finite (NaN in an unselected `where` branch is value-safe but we
avoid it anyway for debuggability).
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
    karras_sigma_grid,
    sigmas_from_alphas_cumprod,
    timesteps_from_sigmas,
)

_TINY = 1e-10


def dpm_timestep_grid(config: SchedulerConfig, num_steps: int) -> np.ndarray:
    """DPM/UniPC grid: N+1 anchor points with the last dropped (the terminal
    anchor is the appended final sigma)."""
    T = config.num_train_timesteps
    spacing = config.timestep_spacing
    if spacing == "linspace":
        ts = (
            np.linspace(0, T - 1, num_steps + 1).round()[::-1][:-1].astype(np.int64)
        )
    elif spacing == "leading":
        ratio = T // (num_steps + 1)
        ts = (np.arange(num_steps + 1) * ratio).round()[::-1][:-1].astype(np.int64)
        ts += config.steps_offset
    elif spacing == "trailing":
        ratio = T / num_steps
        ts = np.arange(T, 0, -ratio).round().astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep_spacing {spacing!r}")
    return ts


class DPMSolverMultistepScheduler(BaseScheduler):
    """algorithm_type: "dpmsolver++" (ODE) or "sde-dpmsolver++"; order 2,
    midpoint solver."""

    order = 1  # pipeline-visible order (one model eval per step)

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        super().__init__(config)
        assert config.solver_order in (1, 2, 3), "orders 1/2/3 implemented"
        self.sde = config.algorithm_type == "sde-dpmsolver++"

    def uses_noise(self) -> bool:
        return self.sde

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        if timesteps is not None and sigmas is not None:
            raise ValueError("pass only one of `timesteps` or `sigmas`")
        if timesteps is not None and self.config.use_karras_sigmas:
            # diffusers raises identically: a Karras ramp would silently
            # re-grid the user's timesteps
            raise ValueError(
                "cannot use custom `timesteps` with use_karras_sigmas=True"
            )
        full_sigmas = sigmas_from_alphas_cumprod(self._alphas_cumprod_np)
        if sigmas is not None:
            # user sigma list (descending, no terminal); Karras branch skipped
            sigmas = np.asarray(sigmas, np.float64)
            timesteps = timesteps_from_sigmas(sigmas, full_sigmas).round()
        else:
            if timesteps is None:
                timesteps = dpm_timestep_grid(self.config, num_steps)
            timesteps = np.asarray(timesteps, np.float64)
            sigmas = np.interp(timesteps, np.arange(len(full_sigmas)), full_sigmas)
            if self.config.use_karras_sigmas:
                # Karras ramp spans the *interpolated* grid's endpoints (the
                # diffusers convention; euler.py does the same)
                sigmas = karras_sigma_grid(
                    float(sigmas[-1]), float(sigmas[0]), len(timesteps)
                )
                timesteps = timesteps_from_sigmas(sigmas, full_sigmas).round()
        if self.config.final_sigmas_type == "zero":
            sigma_last = 0.0
        else:
            sigma_last = float(
                sigmas_from_alphas_cumprod(self._alphas_cumprod_np[:1])[0]
            )
        sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)
        return Plan(
            timesteps=jnp.asarray(timesteps, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            alphas_cumprod=self.alphas_cumprod,
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
            final_alpha_cumprod=jnp.asarray(
                float(self._alphas_cumprod_np[0]), jnp.float32
            ),
            num_steps=len(timesteps),
        )

    def init_state(self, plan: Plan, sample_shape, dtype=jnp.float32):
        # carry: previous x0 prediction(s) (zeros before first step);
        # order 3 keeps two steps of history
        if self.config.solver_order == 3:
            return (
                jnp.zeros(sample_shape, jnp.float32),
                jnp.zeros(sample_shape, jnp.float32),
            )
        return (jnp.zeros(sample_shape, jnp.float32),)

    @staticmethod
    def _alpha_sigma(sigma):
        alpha_t = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        sigma_t = sigma * alpha_t
        return alpha_t, sigma_t

    def _convert_to_x0(self, model_output, sample, sigma):
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        pt = self.config.prediction_type
        if pt == "epsilon":
            return (sample - sigma_t * model_output) / alpha_t
        if pt == "v_prediction":
            return alpha_t * sample - sigma_t * model_output
        if pt == "sample":
            return model_output
        raise ValueError(pt)

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        third_order = self.config.solver_order == 3
        if third_order:
            x0_prev, x0_prev2 = state
        else:
            (x0_prev,) = state
        N = plan.num_steps
        s = plan.sigmas
        sigma_s0 = s[i]  # current
        sigma_t = s[i + 1]  # target
        sigma_s1 = s[jnp.clip(i - 1, 0)]  # previous (garbage-safe at i=0)

        sample32 = sample.astype(jnp.float32)
        x0 = self._convert_to_x0(model_output.astype(jnp.float32), sample32, sigma_s0)

        alpha_t, sig_t = self._alpha_sigma(sigma_t)
        alpha_s0, sig_s0 = self._alpha_sigma(sigma_s0)

        lam = lambda a, sg: jnp.log(a) - jnp.log(jnp.maximum(sg, _TINY))
        lambda_t = lam(alpha_t, sig_t)
        lambda_s0 = lam(alpha_s0, sig_s0)
        alpha_s1, sig_s1 = self._alpha_sigma(sigma_s1)
        lambda_s1 = lam(alpha_s1, sig_s1)

        h = lambda_t - lambda_s0
        h_0 = lambda_s0 - lambda_s1
        r0 = h_0 / jnp.where(h == 0, 1.0, h)
        D0 = x0
        D1 = (x0 - x0_prev) / jnp.where(r0 == 0, 1.0, r0)

        if not self.sde:
            # e^{-h} = (sig_t * alpha_s0) / (sig_s0 * alpha_t): exact 0 at sigma_t=0
            exp_mh = (sig_t * alpha_s0) / (sig_s0 * alpha_t)
            emh1 = exp_mh - 1.0  # expm1(-h)
            first = (sig_t / sig_s0) * sample32 - alpha_t * emh1 * D0
            second = first - 0.5 * alpha_t * emh1 * D1
        else:
            assert key is not None, "sde-dpmsolver++ step needs a PRNG key"
            exp_mh = (sig_t * alpha_s0) / (sig_s0 * alpha_t)
            exp_m2h = exp_mh**2
            noise = step_noise(key, sample32)
            base = (
                (sig_t / sig_s0) * exp_mh * sample32
                + alpha_t * (1.0 - exp_m2h) * D0
                + sig_t * jnp.sqrt(jnp.maximum(1.0 - exp_m2h, 0.0)) * noise
            )
            first = base
            second = base + 0.5 * alpha_t * (1.0 - exp_m2h) * D1

        # order selection (diffusers parity): first-order at warm-up (i==0)
        # and at the final step when the final sigma is zero (mandatory:
        # lambda diverges there) or the run is short.
        lower_final = (i == N - 1) & (
            (self.config.final_sigmas_type == "zero") or (N < 15)
        )
        use_first = (i == 0) | lower_final | (self.config.solver_order == 1)
        if not third_order:
            prev = jnp.where(use_first, first, second)
            return prev.astype(sample.dtype), (x0,)

        # third order: two steps of x0 history (garbage-safe index clips;
        # the selection below never picks `third` before i==2)
        sigma_s2 = s[jnp.clip(i - 2, 0)]
        alpha_s2, sig_s2 = self._alpha_sigma(sigma_s2)
        lambda_s2 = lam(alpha_s2, sig_s2)
        h_1 = lambda_s1 - lambda_s2
        hh = jnp.where(h == 0, 1.0, h)
        r1 = h_1 / hh
        D1_0 = D1  # (x0 - x0_prev) / r0, computed above
        D1_1 = (x0_prev - x0_prev2) / jnp.where(r1 == 0, 1.0, r1)
        rsum = jnp.where(r0 + r1 == 0, 1.0, r0 + r1)
        D1_3 = D1_0 + (r0 / rsum) * (D1_0 - D1_1)
        D2 = (D1_0 - D1_1) / rsum
        if not self.sde:
            # Lu et al. 2022 eq. (3.3) / diffusers third-order dpmsolver++
            third = (
                (sig_t / sig_s0) * sample32
                - alpha_t * emh1 * D0
                + alpha_t * (emh1 / hh + 1.0) * D1_3
                - alpha_t * ((emh1 + h) / (hh * hh) - 0.5) * D2
            )
        else:
            # k-diffusion sample_dpmpp_3m_sde with eta=1: h_eta = 2h,
            # phi2 = expm1(-h_eta)/h_eta + 1, phi3 = phi2/h_eta - 0.5;
            # denoised-space terms pick up alpha_t in VP coordinates
            h_eta = jnp.where(h == 0, 1.0, 2.0 * h)
            phi2 = (exp_m2h - 1.0) / h_eta + 1.0
            phi3 = phi2 / h_eta - 0.5
            third = base + alpha_t * (phi2 * D1_3 - phi3 * D2)

        lower_second = (i == N - 2) & (N < 15)
        use_second = (i == 1) | lower_second
        prev = jnp.where(
            use_first, first, jnp.where(use_second, second, third)
        )
        return prev.astype(sample.dtype), (x0, x0_prev)

    def add_noise_index(self, plan: Plan, original, noise, i):
        sigma = plan.sigmas[i]
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        return (
            alpha_t * original.astype(jnp.float32) + sigma_t * noise.astype(jnp.float32)
        ).astype(original.dtype)
