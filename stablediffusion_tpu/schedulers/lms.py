"""Linear multistep (LMS / Adams-Bashforth order 4) k-diffusion sampler.

Reference binding: the A1111 converter constructs ``LMSDiscreteScheduler``
for ``--scheduler_type lms`` (/root/reference/scripts/convert_from_A1111.py:
976-1003).

diffusers integrates the Lagrange basis polynomials numerically
(``scipy.integrate.quad``) on the host at every step.  Here the integral is
ANALYTIC and on-device: each basis function is a product of at most three
linear factors over the sigma grid, i.e. a cubic — expanded into monomial
coefficients and integrated exactly over ``[sigma_i, sigma_{i+1}]``.  That
keeps the whole denoise inside one `lax.scan` (the step index is traced, so
host-side quad is impossible anyway) and is *more* accurate than quad's
epsrel=1e-4.

Warm-up ramps the order 1→4 as history accumulates (diffusers
``order = min(step+1, 4)``): inactive history slots contribute factor 1 to
the basis products and coefficient 0 to the update.  State carries the last
four derivatives ``(sample - x0) / sigma``.
"""

from __future__ import annotations

import jax.numpy as jnp

from stablediffusion_tpu.schedulers.common import Plan
from stablediffusion_tpu.schedulers.euler import EulerDiscreteScheduler

_TINY = 1e-10
_ORDER = 4  # diffusers LMSDiscreteScheduler.step(order=4) default


def _lms_coefficients(sigmas, i):
    """[4] Adams-Bashforth weights for history slots 0 (newest) .. 3, at
    traced step i: c_j = integral over [sigmas[i], sigmas[i+1]] of
    prod_{k != j, k <= i} (tau - a_k) / (a_j - a_k),  a_k = sigmas[i - k];
    c_j = 0 for j > i (no history yet)."""
    a = [sigmas[jnp.clip(i - k, 0)] for k in range(_ORDER)]
    lo, hi = sigmas[i], sigmas[i + 1]
    coeffs = []
    for j in range(_ORDER):
        # expand the basis product into ascending monomial coefficients
        p = [jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
             jnp.float32(0.0)]
        for k in range(_ORDER):
            if k == j:
                continue
            active = k <= i  # slot k holds real history
            denom = a[j] - a[k]
            denom = jnp.where(denom == 0, 1.0, denom)  # inactive/unused guard
            d0 = jnp.where(active, -a[k] / denom, 1.0)  # constant term
            d1 = jnp.where(active, 1.0 / denom, 0.0)  # linear term
            p = [
                p[0] * d0,
                p[1] * d0 + p[0] * d1,
                p[2] * d0 + p[1] * d1,
                p[3] * d0 + p[2] * d1,
            ]
        integral = sum(
            p[m] * (hi ** (m + 1) - lo ** (m + 1)) / (m + 1) for m in range(4)
        )
        coeffs.append(jnp.where(j <= i, integral, 0.0))
    return jnp.stack(coeffs)


class LMSDiscreteScheduler(EulerDiscreteScheduler):
    order = 1  # one model eval per scan index

    def init_state(self, plan: Plan, sample_shape, dtype=jnp.float32):
        # newest-first ring of the last 4 derivatives
        return (jnp.zeros((_ORDER,) + tuple(sample_shape), jnp.float32),)

    def step(self, plan: Plan, state, i, model_output, sample, key=None):
        (derivs,) = state
        sigma = plan.sigmas[i]
        sample32 = sample.astype(jnp.float32)
        x0 = self._pred_x0(model_output.astype(jnp.float32), sample32, sigma)
        deriv = (sample32 - x0) / jnp.maximum(sigma, _TINY)
        derivs = jnp.concatenate([deriv[None], derivs[:-1]], axis=0)
        coeffs = _lms_coefficients(plan.sigmas, i)
        prev = sample32 + jnp.tensordot(coeffs, derivs, axes=1)
        return prev.astype(sample.dtype), (derivs,)
