"""UniPC (Zhao et al. 2023) — unified predictor-corrector multistep, order 2,
B(h) = expm1(h) ("bh2") variant.

Reference binding: "uni_pc" at models/stable_diffusion.py:205-224.

Scan design: the corrector at step i refines the sample produced by step i-1's
predictor using the *current* model evaluation, then the predictor advances.
State carries the last two x0 predictions, the pre-predictor sample, and the
predictor order used at i-1 (the corrector must reuse it).  Order selection
(warm-up at i=0, order-1 at the terminal zero-sigma step) is `jnp.where` over
both closed-form branches — order <= 2 needs no linear solves beyond a 2x2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.core.config import SchedulerConfig
from stablediffusion_tpu.schedulers.common import BaseScheduler, Plan
from stablediffusion_tpu.schedulers.dpm import dpm_timestep_grid

_TINY = 1e-10


class UniPCScheduler(BaseScheduler):
    order = 1

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        super().__init__(config)
        assert config.solver_order in (1, 2), "only orders 1/2 implemented"
        assert config.solver_type in ("bh1", "bh2")

    def plan(
        self,
        num_steps: int,
        timesteps: np.ndarray | None = None,
        sigmas: np.ndarray | None = None,
    ) -> Plan:
        from stablediffusion_tpu.schedulers.common import (
            sigmas_from_alphas_cumprod,
            timesteps_from_sigmas,
        )

        if timesteps is not None and sigmas is not None:
            raise ValueError("pass only one of `timesteps` or `sigmas`")
        full_sigmas = sigmas_from_alphas_cumprod(self._alphas_cumprod_np)
        if sigmas is not None:
            sigmas = np.asarray(sigmas, np.float64)
            timesteps = timesteps_from_sigmas(sigmas, full_sigmas).round()
        else:
            if timesteps is None:
                timesteps = dpm_timestep_grid(self.config, num_steps)
            timesteps = np.asarray(timesteps, np.float64)
            sigmas = np.interp(timesteps, np.arange(len(full_sigmas)), full_sigmas)
        sigma_last = (
            0.0
            if self.config.final_sigmas_type == "zero"
            else float(full_sigmas[0])
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
        z = jnp.zeros(sample_shape, jnp.float32)
        return (
            z,  # m_prev: x0 prediction at step i-1
            z,  # m_prev2: x0 prediction at step i-2
            z,  # last_sample: pre-predictor sample at step i-1
            jnp.asarray(0, jnp.int32),  # predictor order used at step i-1
        )

    @staticmethod
    def _alpha_sigma(sigma):
        alpha_t = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        return alpha_t, sigma * alpha_t

    def _lambda(self, sigma):
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        return jnp.log(alpha_t) - jnp.log(jnp.maximum(sigma_t, _TINY))

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

    def _bh_coeffs(self, h):
        """(h_phi_1, B_h, b1, b2) for hh = -h, guarded against h ~ 0/inf."""
        hh = -h
        hh_safe = jnp.where(jnp.abs(hh) < _TINY, -1.0, hh)
        h_phi_1 = jnp.expm1(hh)  # e^{-h} - 1
        B_h = hh if self.config.solver_type == "bh1" else h_phi_1
        B_h_safe = jnp.where(jnp.abs(B_h) < _TINY, 1.0, B_h)
        h_phi_k1 = h_phi_1 / hh_safe - 1.0
        b1 = h_phi_k1 * 1.0 / B_h_safe
        h_phi_k2 = h_phi_k1 / hh_safe - 0.5
        b2 = h_phi_k2 * 2.0 / B_h_safe
        return h_phi_1, B_h, b1, b2

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        m_prev, m_prev2, last_sample, prev_order = state
        N = plan.num_steps
        s = plan.sigmas
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)

        sigma_cur = s[i]
        m_this = self._convert_to_x0(out32, sample32, sigma_cur)

        # ---- corrector (refine step i-1's predictor output) ---------------
        sigma_c0 = s[jnp.clip(i - 1, 0)]  # where the predictor started
        lambda_ct = self._lambda(sigma_cur)
        lambda_c0 = self._lambda(sigma_c0)
        h_c = lambda_ct - lambda_c0
        alpha_ct, sig_ct = self._alpha_sigma(sigma_cur)
        _, sig_c0 = self._alpha_sigma(sigma_c0)
        h_phi_1c, B_hc, b1c, b2c = self._bh_coeffs(h_c)

        x_t_c = (sig_ct / jnp.maximum(sig_c0, _TINY)) * last_sample - (
            alpha_ct * h_phi_1c
        ) * m_prev
        D1_t = m_this - m_prev
        # order-1 corrector: rhos_c = [0.5]
        corr1 = x_t_c - alpha_ct * B_hc * (0.5 * D1_t)
        # order-2 corrector: rks = [r0, 1]; R = [[1,1],[r0,1]]; solve 2x2
        lambda_c1 = self._lambda(s[jnp.clip(i - 2, 0)])
        h_c_safe = jnp.where(jnp.abs(h_c) < _TINY, 1.0, h_c)
        r0_c = (lambda_c1 - lambda_c0) / h_c_safe
        det = jnp.where(jnp.abs(1.0 - r0_c) < _TINY, 1.0, 1.0 - r0_c)
        rho1_c = (b1c - b2c) / det
        rho2_c = (b2c - r0_c * b1c) / det
        r0_c_safe = jnp.where(jnp.abs(r0_c) < _TINY, 1.0, r0_c)
        D1_hist = (m_prev2 - m_prev) / r0_c_safe
        corr2 = x_t_c - alpha_ct * B_hc * (rho1_c * D1_hist + rho2_c * D1_t)

        corrected = jnp.where(prev_order >= 2, corr2, corr1)
        use_corrector = i > 0
        sample_eff = jnp.where(use_corrector, corrected, sample32)
        # NOTE: the x0 history entry stays the PRE-corrector conversion
        # (UniPC paper / diffusers `convert_model_output` runs before the
        # corrector and its result is what lands in model_outputs); the
        # round-3 full-loop torch anchor caught the re-conversion variant
        # diverging at MSE ~7e-4 (tests/test_scheduler_anchors.py).

        # ---- predictor (advance from sigma_cur to sigmas[i+1]) ------------
        sigma_t = s[i + 1]
        alpha_t, sig_t = self._alpha_sigma(sigma_t)
        alpha_s0, sig_s0 = self._alpha_sigma(sigma_cur)
        lambda_t = self._lambda(sigma_t)
        lambda_s0 = self._lambda(sigma_cur)
        h = lambda_t - lambda_s0
        h_phi_1, B_h, b1, b2 = self._bh_coeffs(h)

        x_t_ = (sig_t / jnp.maximum(sig_s0, _TINY)) * sample_eff - (
            alpha_t * h_phi_1
        ) * m_this
        pred1 = x_t_
        # order-2 predictor: rhos_p = [0.5]; D1 from history
        lambda_s1 = self._lambda(s[jnp.clip(i - 1, 0)])
        h_safe = jnp.where(jnp.abs(h) < _TINY, 1.0, h)
        r0_p = (lambda_s1 - lambda_s0) / h_safe
        r0_p_safe = jnp.where(jnp.abs(r0_p) < _TINY, 1.0, r0_p)
        D1_p = (m_prev - m_this) / r0_p_safe
        pred2 = x_t_ - alpha_t * B_h * (0.5 * D1_p)

        # this_order = min(solver_order, N - i, i + 1)
        this_order = jnp.minimum(
            jnp.asarray(self.config.solver_order, jnp.int32),
            jnp.minimum(N - i, i + 1).astype(jnp.int32),
        )
        prev = jnp.where(this_order >= 2, pred2, pred1)

        new_state = (m_this, m_prev, sample_eff, this_order)
        return prev.astype(sample.dtype), new_state

    def add_noise_index(self, plan: Plan, original, noise, i):
        sigma = plan.sigmas[i]
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        return (
            alpha_t * original.astype(jnp.float32) + sigma_t * noise.astype(jnp.float32)
        ).astype(original.dtype)
