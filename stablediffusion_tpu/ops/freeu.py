"""FreeU (arXiv 2309.11497): training-free quality lever for diffusion UNets.

Scales the backbone half-channels and low-pass-filters the skip connections
in the two deepest decoder stages.  The reference has no FreeU path (its
pipeline is stock diffusers, /root/reference/pipelines/
sd_unified_pipeline.py:465-507); semantics here follow the
diffusers `enable_freeu(s1, s2, b1, b2)` convention so A1111/diffusers
settings transfer directly.

TPU notes: the Fourier filter is two small-batch 2-D FFTs per filtered skip
(XLA lowers jnp.fft natively on TPU); it runs at the two LOWEST resolutions
only, so the cost is noise next to the attention/conv stack.  All shapes are
static — the (b1, b2, s1, s2) tuple is a static jit argument, so toggling
FreeU recompiles (same contract as cache_interval).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# diffusers-recommended defaults (b1, b2, s1, s2)
SD15_DEFAULTS: Tuple[float, float, float, float] = (1.5, 1.6, 0.9, 0.2)
SDXL_DEFAULTS: Tuple[float, float, float, float] = (1.3, 1.4, 0.9, 0.2)


def fourier_filter(x: jax.Array, threshold: int, scale: float) -> jax.Array:
    """Scale the low-frequency (centered) 2-D Fourier components of an NHWC
    feature map by `scale`; frequencies outside the (2*threshold)² center
    box pass through unchanged."""
    B, H, W, C = x.shape
    xf = jnp.fft.fftn(x.astype(jnp.complex64), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    crow, ccol = H // 2, W // 2
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    # the diffusers mask is the half-open slice [c-thr, c+thr) on each axis
    low = (
        (rows >= crow - threshold) & (rows < crow + threshold)
        & (cols >= ccol - threshold) & (cols < ccol + threshold)
    )
    mask = jnp.where(low, scale, 1.0).astype(jnp.complex64)
    xf = xf * mask[None, :, :, None]
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(x.dtype)


def apply_freeu(
    backbone: jax.Array,
    skip: jax.Array,
    resolution_idx: int,
    params: Tuple[float, float, float, float],
):
    """FreeU at one decoder skip concat (diffusers apply_freeu semantics,
    NHWC): amplify the first half of the BACKBONE channels by b, low-pass
    the SKIP by s.  Active at resolution_idx 0 (deepest, b1/s1) and 1
    (b2/s2); passthrough elsewhere."""
    if resolution_idx not in (0, 1):
        return backbone, skip
    b1, b2, s1, s2 = params
    b, s = (b1, s1) if resolution_idx == 0 else (b2, s2)
    half = backbone.shape[-1] // 2
    backbone = jnp.concatenate(
        [backbone[..., :half] * jnp.asarray(b, backbone.dtype),
         backbone[..., half:]],
        axis=-1,
    )
    skip = fourier_filter(skip, threshold=1, scale=s)
    return backbone, skip
