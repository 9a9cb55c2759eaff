"""Edge-avoiding À-Trous spatial denoiser (shader pass 5).

Rebuild of the inline pass (ScreenSpacePathTracing.shader:421-639):
one À-Trous iteration = 9-tap 3x3 Gaussian at a per-pixel randomized
dilation radius floor(lerp(3, 9, hash)), with joint-bilateral weights
from color/emission/normal/albedo differences (exponents 1.1 / 2000 /
20 / 400, :574-627), gated by the history sample count (blurAmount,
:493-495 remapped :629-632). Sky pixels pass through. When refraction
is on, refractive pixels use the transparent G-buffer guides and skip
the emission weight (:531-560).

The renderer ping-pongs this pass 1/3/5 times for Low/Medium/High
quality (cs:866-876).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..camera import RAW_FAR_CLIP
from ..config import PTConfig
from ..gbuffer import GBuffers, SURFACE_TYPE_REFRACTION, gather2d
from .brdf import saturate
from .rng import hashed_random_float
from ..utils.profiling import PASS_DENOISE, named_pass

_OFFSETS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
_KERNEL = [0.0625, 0.125, 0.0625, 0.125, 0.25, 0.125, 0.0625, 0.125, 0.0625]


@named_pass(PASS_DENOISE)
def atrous_filter(
    color: jnp.ndarray,
    gb: GBuffers,
    emission: jnp.ndarray,
    sample_count: jnp.ndarray,
    cfg: PTConfig,
    support_refraction: bool = False,
    row_offset=0,
) -> jnp.ndarray:
    """One edge-avoiding À-Trous iteration. ``emission`` is the current
    frame's scene-color copy (_PathTracingEmissionTexture); ``sample_count``
    is the per-pixel history length driving the blur gate.

    ``row_offset`` is the global image row of array row 0 — the
    row-sharded pipeline (parallel/dist.realtime_step_sharded) filters
    halo-extended bands, and the per-pixel dilation hash must see
    global pixel coordinates to match the unsharded filter."""
    h, w = color.shape[0], color.shape[1]
    max_n = float(cfg.max_accum_frame_num)

    # Blur gate (shader:493-495): fades out as history accumulates.
    blur_amount = 1.0 - saturate(
        jnp.minimum(sample_count / max_n, max_n) - 1.0 / max_n
    )
    # Remap (shader:629-632): 1 - (1-b)^4.
    inv = 1.0 - blur_amount
    inv = inv * inv
    inv = inv * inv
    blur_remapped = 1.0 - inv

    # Randomized dilation radius (shader:497): hash of (pixel, 1).
    xs = jnp.arange(w, dtype=jnp.uint32)
    ys = jnp.arange(h, dtype=jnp.uint32) + jnp.asarray(row_offset).astype(jnp.uint32)
    px, py = jnp.meshgrid(xs, ys)
    rnd = hashed_random_float(px, py, jnp.uint32(1))
    intensity = jnp.floor(3.0 + (9.0 - 3.0) * rnd).astype(jnp.int32)

    # Guides (shader:531-560): transparent G-buffer for refractive pixels,
    # falling back to the opaque G-buffer where the transparent one is 0.
    normal_img = gb.normal
    albedo_img = gb.albedo
    if support_refraction and gb.t_surface_type is not None:
        is_refr_center = gb.t_surface_type == SURFACE_TYPE_REFRACTION
        t_norm_valid = jnp.any(gb.t_normal != 0.0, axis=-1)
        t_alb_valid = jnp.any(gb.t_albedo != 0.0, axis=-1)
        normal_img = jnp.where(
            (is_refr_center & t_norm_valid)[..., None], gb.t_normal, gb.normal
        )
        albedo_img = jnp.where(
            (is_refr_center & t_alb_valid)[..., None], gb.t_albedo, gb.albedo
        )
        use_emission_weight = ~is_refr_center
    else:
        use_emission_weight = jnp.ones((h, w), bool)

    center_color = color
    center_emission = jnp.where(use_emission_weight[..., None], emission, 0.0)
    center_normal = normal_img
    center_albedo = albedo_img

    sum_color = jnp.zeros_like(color)
    sum_weight = jnp.zeros((h, w), jnp.float32)

    def _shift(img, dy, dx):
        """Clamped static shift — a dense slice/pad, no gather."""
        iy = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
        ix = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
        return img[iy][:, ix]

    # The per-pixel random dilation radius takes 7 values (3..9). Rather
    # than one arbitrary gather per tap (15 ms each at 1080p on v5e), we
    # read every radius as a static shift (dense, ~0.1 ms) and select
    # per pixel — identical results.
    for (dx, dy), k in zip(_OFFSETS, _KERNEL):
        if dx == 0 and dy == 0:
            tap_color = color
            tap_emission = emission
            tap_normal = normal_img
            tap_albedo = albedo_img
        else:
            def sel(img):
                out = _shift(img, dy * 3, dx * 3)
                for r in range(4, 10):
                    out = jnp.where(
                        (intensity == r)[..., None] if img.ndim == 3 else (intensity == r),
                        _shift(img, dy * r, dx * r),
                        out,
                    )
                return out

            tap_color = sel(color)
            tap_emission = sel(emission)
            tap_normal = sel(normal_img)
            tap_albedo = sel(albedo_img)

        d = center_color - tap_color
        color_w = jnp.minimum(jnp.exp(-jnp.sum(d * d, -1) * 1.1), 1.0)

        d = center_emission - tap_emission
        emission_w = jnp.minimum(jnp.exp(-jnp.sum(d * d, -1) * 2000.0), 1.0)
        emission_w = jnp.where(use_emission_weight, emission_w, 1.0)

        d = center_normal - tap_normal
        normal_w = jnp.minimum(jnp.exp(-jnp.maximum(jnp.sum(d * d, -1), 0.0) * 20.0), 1.0)

        d = jnp.sqrt(jnp.maximum(center_albedo, 0.0)) - jnp.sqrt(
            jnp.maximum(tap_albedo, 0.0)
        )
        albedo_w = jnp.minimum(jnp.exp(-jnp.sum(d * d, -1) * 400.0), 1.0)

        weight = color_w * emission_w * normal_w * albedo_w * k
        sum_color = sum_color + tap_color * weight[..., None]
        sum_weight = sum_weight + weight

    filtered = sum_color / jnp.maximum(sum_weight, 1e-12)[..., None]
    out = center_color + (filtered - center_color) * blur_remapped[..., None]

    # Sky and fully-converged pixels pass through (shader:494-495, 517-528).
    passthrough = (gb.layer1_depth() == RAW_FAR_CLIP) | (blur_amount == 0.0)
    return jnp.where(passthrough[..., None], color, out)
