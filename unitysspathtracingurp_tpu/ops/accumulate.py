"""Offline (progressive) accumulation + convergence progress bar.

Rebuild of the reference's offline chain (C9b): the alpha-blended
progressive average of shader pass 3 (ScreenSpacePathTracing.shader:
287-344, alpha = 1/(sample+1), 1 on restart, 0 when paused/complete)
and the pass-4 progress bar (AddConvergenceCue, shader:381-407).
Expressed as a pure state-step: accum' = lerp(accum, frame, alpha).

The sample counter and invalidation rules (camera move, scene-light
change, pause; cs:772-823) live in models/renderer.py — they are host
control flow, like the reference's C# side.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..utils.image import luminance
from ..utils.profiling import PASS_OFFLINE_ACCUM, named_pass


@struct.dataclass
class OfflineAccumState:
    """Persistent accumulation target + sample counter
    (the _PathTracingAccumulationTexture RT + CPU `sample`, cs:739-823)."""

    accum: jnp.ndarray  # (H, W, 3)
    sample: jnp.ndarray  # () int32, samples accumulated so far

    @classmethod
    def create(cls, height: int, width: int, dtype=jnp.float32) -> "OfflineAccumState":
        """``dtype`` is the accumulation-buffer precision axis (SURVEY
        C15): float32 models the reference's 64-bit HDR target,
        bfloat16 the 11-bit-float one (which is why the low-precision
        mode caps at 64 samples, cs:810-814 — blend increments below
        the mantissa step round away as the weight 1/(n+1) shrinks)."""
        return cls(
            accum=jnp.zeros((height, width, 3), dtype),
            sample=jnp.zeros((), jnp.int32),
        )


@named_pass(PASS_OFFLINE_ACCUM)
def offline_accumulate(
    state: OfflineAccumState,
    frame: jnp.ndarray,
    max_sample: int,
    paused=False,
) -> OfflineAccumState:
    """One accumulation step (shader pass 3 blend math, :323-342):
    alpha = 1/(sample+1); 1 when restarting (sample==0); 0 when paused or
    sample count reached max."""
    sample = state.sample
    restart = sample == 0
    pause = (sample >= max_sample) | jnp.asarray(paused)
    alpha = 1.0 / (sample.astype(jnp.float32) + 1.0)
    alpha = jnp.where(restart, 1.0, alpha)
    alpha = jnp.where(pause, 0.0, alpha)
    # Blend in f32, store at buffer precision — the GPU blend-unit
    # semantics of the reference's pass 3 against its HDR target.
    prev = state.accum.astype(jnp.float32)
    accum = (prev + (frame - prev) * alpha).astype(state.accum.dtype)
    new_sample = jnp.where(pause, sample, sample + 1)
    return OfflineAccumState(accum=accum, sample=new_sample)


def add_convergence_cue(color, sample, max_sample: int, height: int, width: int):
    """Progress bar over the bottom of the frame (shader:381-407): height
    0.5% of the screen (>= 4 px), width = sample/max_sample, colors
    luminance-inverted against the underlying image."""
    sample_f = jnp.asarray(sample, jnp.float32)
    done = sample_f >= max_sample
    bar_height_px = jnp.maximum(4.0, jnp.ceil(height * 0.005))
    bar_height_uv = bar_height_px / height

    v = (jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5) / height
    u = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) / width
    in_bar = (v < bar_height_uv) & (u <= sample_f / max_sample) & ~done

    lum = luminance(color)
    over = lum > 1.0
    normed = jnp.where(
        over[..., None], color / jnp.maximum(lum, 1e-12)[..., None], color
    )
    lum = jnp.minimum(lum, 1.0)
    shifted = normed + jnp.where(lum > 0.5, -0.5 * lum, 0.05 + 0.5 * lum)[..., None]
    return jnp.where(in_bar[..., None], shifted, color)
