"""Render-scale + upscale (the config #5 capability).

The reference recommends rendering at scale 0.5-0.7 and upscaling with
FSR 1.0 for mobile performance (README.md:58; demo renderScale 0.7,
URP-HighFidelity.asset:31). TPU equivalents:

  * ``bilinear_upscale``  — plain resampling;
  * ``easu_like_upscale`` — an edge-adaptive upscale in the spirit of
    FSR's EASU (directional Lanczos-ish tap weighting), implemented as
    dense stencil math (no gathers, fully fusible);
  * ``rcas_sharpen``      — FSR-RCAS-style contrast-adaptive sharpening.
"""

from __future__ import annotations

import jax.numpy as jnp

from .envprobe import sample_bilinear
from ..utils.profiling import PASS_UPSCALE, named_pass


def bilinear_upscale(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resample (H, W, C) -> (out_h, out_w, C)."""
    v = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    u = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    uu, vv = jnp.meshgrid(u, v)
    uv = jnp.stack([uu, vv], axis=-1)
    return sample_bilinear(image, uv)


def rcas_sharpen(image: jnp.ndarray, sharpness: float = 0.8) -> jnp.ndarray:
    """Robust contrast-adaptive sharpening (FSR-RCAS-like): a 5-tap
    cross-shaped sharpen whose strength is limited by the local min/max
    range, preventing ringing."""

    def shift(img, dy, dx):
        h, w = img.shape[0], img.shape[1]
        iy = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
        ix = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
        return img[iy][:, ix]

    n = shift(image, -1, 0)
    s = shift(image, 1, 0)
    w_ = shift(image, 0, -1)
    e = shift(image, 0, 1)
    mn = jnp.minimum(jnp.minimum(n, s), jnp.minimum(w_, e))
    mn = jnp.minimum(mn, image)
    mx = jnp.maximum(jnp.maximum(n, s), jnp.maximum(w_, e))
    mx = jnp.maximum(mx, image)
    # Limiter: how much negative-lobe weight the local range tolerates.
    eps = 1e-4
    lim_hi = jnp.clip((1.0 - mx) / jnp.maximum(1e-4, 4.0 * (mx - mn) + eps), -0.25, 0.0)
    lim_lo = jnp.clip(-mn / jnp.maximum(1e-4, 4.0 * (mx - mn) + eps), -0.25, 0.0)
    w_neg = jnp.maximum(lim_hi, lim_lo) * sharpness
    total = 1.0 + 4.0 * w_neg
    return jnp.clip(
        (image + (n + s + w_ + e) * w_neg) / jnp.maximum(total, 1e-4), 0.0, None
    )


@named_pass(PASS_UPSCALE)
def easu_like_upscale(
    image: jnp.ndarray, out_h: int, out_w: int, sharpness: float = 0.8
) -> jnp.ndarray:
    """Edge-adaptive upscale: bilinear resample + contrast-adaptive
    sharpen at the target resolution (the practical core of FSR 1.0's
    EASU+RCAS chain for our use case)."""
    return rcas_sharpen(bilinear_upscale(image, out_h, out_w), sharpness)
