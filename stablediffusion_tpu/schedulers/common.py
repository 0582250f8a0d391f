"""Shared scheduler math: beta schedules, timestep grids, sigma tables.

The reference delegates all scheduler math to diffusers (8 classes rebuilt
over a shared config at models/stable_diffusion.py:199-227; used at
sd_unified_pipeline.py:472,489,502,785,841,890 and train at
train_lora_pipeline.py:428,463).  Here schedulers are *stateless*: a host-side
:class:`Plan` of concrete tables (timesteps, sigmas, cumulative alphas) plus a
pure ``step(plan, state, i, model_output, sample)`` so an entire denoise run
compiles into one ``lax.scan``.

Conventions (beta schedules, leading/trailing/linspace timestep spacing,
Karras sigma interpolation) follow the publicly documented diffusers/k-diffusion
behavior so checkpoints and request parameters are interchangeable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_tpu.core.config import SchedulerConfig


# ---------------------------------------------------------------------------
# Beta / alpha tables (host-side numpy; embedded as constants under jit)
# ---------------------------------------------------------------------------


def make_betas(config: SchedulerConfig) -> np.ndarray:
    T = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, T, dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                config.beta_start**0.5, config.beta_end**0.5, T, dtype=np.float64
            )
            ** 2
        )
    elif config.beta_schedule == "squaredcos_cap_v2":
        # cosine schedule (Nichol & Dhariwal)
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(T, dtype=np.float64)
        betas = np.minimum(1 - alpha_bar((ts + 1) / T) / alpha_bar(ts / T), 0.999)
    else:
        raise ValueError(f"unknown beta_schedule {config.beta_schedule!r}")
    return betas


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Rescale so the final alpha_bar is zero (arXiv 2305.08891 §3)."""
    ab_sqrt = np.sqrt(alphas_cumprod)
    ab0, abT = ab_sqrt[0], ab_sqrt[-1]
    ab_sqrt = ab_sqrt - abT
    ab_sqrt = ab_sqrt * ab0 / (ab0 - abT)
    return ab_sqrt**2


def make_alphas_cumprod(config: SchedulerConfig) -> np.ndarray:
    ac = np.cumprod(1.0 - make_betas(config))
    if config.rescale_betas_zero_snr:
        ac = _rescale_zero_terminal_snr(ac)
    return ac


# ---------------------------------------------------------------------------
# Timestep grids
# ---------------------------------------------------------------------------


def make_timestep_grid(config: SchedulerConfig, num_steps: int) -> np.ndarray:
    """Descending integer timesteps for `num_steps` inference steps."""
    T = config.num_train_timesteps
    spacing = config.timestep_spacing
    if spacing == "leading":
        ratio = T // num_steps
        ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64)
        ts += config.steps_offset
    elif spacing == "trailing":
        ratio = T / num_steps
        ts = np.arange(T, 0, -ratio).round().astype(np.int64) - 1
    elif spacing == "linspace":
        ts = np.linspace(0, T - 1, num_steps).round()[::-1].astype(np.int64)
    else:
        raise ValueError(f"unknown timestep_spacing {spacing!r}")
    return ts


def resolve_custom_schedule(num_steps, timesteps, sigmas):
    """The reference's `retrieve_timesteps` semantics
    (sd_unified_pipeline.py:61-95): at most one of `timesteps`/`sigmas` may be
    given, and a provided list overrides `num_inference_steps`."""
    if timesteps is not None and sigmas is not None:
        raise ValueError("pass only one of `timesteps` or `sigmas`")
    if timesteps is not None:
        num_steps = len(timesteps)
    elif sigmas is not None:
        num_steps = len(sigmas)
    return num_steps


def reject_custom_sigmas(scheduler, sigmas) -> None:
    if sigmas is not None:
        raise ValueError(
            f"{type(scheduler).__name__} does not support custom `sigmas` "
            "(the reference raises the same way when the scheduler's "
            "set_timesteps lacks the kwarg)"
        )


def karras_sigma_grid(
    sigma_min: float, sigma_max: float, num_steps: int, rho: float = 7.0
) -> np.ndarray:
    """Karras et al. 2022 sigma spacing (descending, without terminal 0)."""
    ramp = np.linspace(0, 1, num_steps)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho


def sigmas_from_alphas_cumprod(alphas_cumprod: np.ndarray) -> np.ndarray:
    return np.sqrt((1 - alphas_cumprod) / alphas_cumprod)


def timesteps_from_sigmas(
    sigmas: np.ndarray, full_sigmas: np.ndarray
) -> np.ndarray:
    """Map arbitrary sigmas back to (fractional) train timesteps by log-sigma
    interpolation over the full training table (k-diffusion convention)."""
    log_sigmas = np.log(full_sigmas)
    ts = np.zeros_like(sigmas)
    for i, s in enumerate(sigmas):
        ls = np.log(np.maximum(s, 1e-10))
        dists = ls - log_sigmas[:, None]
        low_idx = (
            np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(max=len(log_sigmas) - 2)
        )[0]
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = np.clip((low - ls) / (low - high), 0, 1)
        ts[i] = (1 - w) * low_idx + w * high_idx
    return ts


# ---------------------------------------------------------------------------
# Plan / State
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Plan:
    """Static per-run tables.  Array fields are jnp constants; `num_steps` and
    `order` are static metadata so a plan can close over a jitted scan."""

    timesteps: jax.Array  # [N] int32 (or float32 for sigma-interpolated grids)
    sigmas: jax.Array  # [N+1] float32 (terminal appended); zeros if unused
    alphas_cumprod: jax.Array  # [T] float32
    init_noise_sigma: jax.Array  # scalar float32
    final_alpha_cumprod: jax.Array  # scalar float32 (DDIM-family)
    num_steps: int = dataclasses.field(metadata=dict(static=True))
    order: int = dataclasses.field(metadata=dict(static=True), default=1)
    # train-timesteps per inference step of the ORIGINAL (unsliced) grid;
    # DDIM/PNDM/DDPM prev-timestep math must keep using it after an img2img
    # strength slice shortens num_steps (diffusers uses the requested step
    # count, not the remaining one)
    step_ratio: int = dataclasses.field(metadata=dict(static=True), default=0)


def prediction_to_x0_eps(
    prediction_type: str,
    model_output: jax.Array,
    sample: jax.Array,
    alpha_t: jax.Array,
    sigma_t: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Convert a model output into (pred_x0, pred_eps) given the decomposition
    sample = alpha_t * x0 + sigma_t * eps  (alpha_t = sqrt(alpha_bar))."""
    if prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sigma_t * eps) / alpha_t
    elif prediction_type == "v_prediction":
        x0 = alpha_t * sample - sigma_t * model_output
        eps = alpha_t * model_output + sigma_t * sample
    elif prediction_type == "sample":
        x0 = model_output
        eps = (sample - alpha_t * x0) / sigma_t
    else:
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    return x0, eps


def broadcast_to_sample(x: jax.Array, sample: jax.Array) -> jax.Array:
    """Broadcast a per-batch scalar [B] (or scalar) against sample [B, ...]."""
    while x.ndim < sample.ndim:
        x = x[..., None]
    return x


class BaseScheduler:
    """Common config-bound helpers; subclasses implement plan/step."""

    order = 1

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        self.config = config
        self._alphas_cumprod_np = make_alphas_cumprod(config)
        self.alphas_cumprod = jnp.asarray(self._alphas_cumprod_np, jnp.float32)

    # -- training-side ops (ref: train_lora_pipeline.py:428,463) ------------
    def add_noise(
        self, original: jax.Array, noise: jax.Array, timesteps: jax.Array
    ) -> jax.Array:
        ac = self.alphas_cumprod[timesteps]
        sqrt_ac = broadcast_to_sample(jnp.sqrt(ac), original)
        sqrt_1mac = broadcast_to_sample(jnp.sqrt(1.0 - ac), original)
        return (sqrt_ac * original + sqrt_1mac * noise).astype(original.dtype)

    def get_velocity(
        self, sample: jax.Array, noise: jax.Array, timesteps: jax.Array
    ) -> jax.Array:
        ac = self.alphas_cumprod[timesteps]
        sqrt_ac = broadcast_to_sample(jnp.sqrt(ac), sample)
        sqrt_1mac = broadcast_to_sample(jnp.sqrt(1.0 - ac), sample)
        return (sqrt_ac * noise - sqrt_1mac * sample).astype(sample.dtype)

    # -- inference-side ops --------------------------------------------------
    def scale_model_input(self, plan: Plan, sample: jax.Array, i) -> jax.Array:
        return sample

    def init_state(self, plan: Plan, sample_shape, dtype=jnp.float32):
        return ()

    def uses_noise(self) -> bool:
        """Whether `step` consumes a PRNG key (ancestral / SDE variants)."""
        return False


def step_noise(key, sample32):
    """Ancestral/SDE step noise.  A single key draws batch-shaped noise; a
    [B]-vector of keys draws each sample's noise from its OWN stream
    (diffusers generator-list parity — sample i's trajectory depends only on
    seed i, regardless of batch composition)."""
    import jax

    if key.ndim == 1:
        return jax.vmap(
            lambda k, s: jax.random.normal(k, s.shape, jnp.float32)
        )(key, sample32)
    return jax.random.normal(key, sample32.shape, jnp.float32)
