"""Temporal reprojection denoiser (real-time accumulation, pass 1).

Rebuild of accumulationFrag (PathTracingDenoise.hlsl:111-294) as one
jitted gather/stencil op over the pixel grid:

  * motion-vector reprojection with sky/off-screen rejection,
  * world-distance rejection against a pixel-footprint-scaled radius
    (ComputeMaxReprojectionWorldRadius, :8-19),
  * emission-change rejection (:181-196),
  * rough branch (roughness > 0.5): linear accumulation n/(n+1) capped
    at MAX_ACCUM_FRAME_NUM then _TemporalIntensity (:200-238),
  * smooth branch: TAA neighborhood with velocity-scaled nudge, virtual
    reprojection of the reflected hit (GetVirtualPosition :94-98), AABB
    history clip (:46-61), parallax-aware accumulation speed
    (GetSpecAccumSpeed :75-85).

Quirks reproduced: the rough branch computes (and discards) a color box;
the Lottes feedback weight is computed but unused (:271-277) except
through the weight^2 term that *is* used in the roughness lerp; the
virtual position uses length(positionWS) — distance from the world
origin — as hit distance (:163). We keep the used terms and skip the
dead ones.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..camera import linear_eye_depth  # noqa: F401  (re-exported convenience)
from ..camera import RAW_FAR_CLIP, pixel_uv, world_from_uv_depth
from ..config import PTConfig
from ..gbuffer import GBuffers, SURFACE_TYPE_REFRACTION, gather2d
from ..utils.image import luminance
from .brdf import dot3, normalize, saturate
from .envprobe import sample_bilinear
from ..utils.profiling import named_pass, PASS_ACCUMULATION


@struct.dataclass
class TemporalState:
    """The five history RTs + previous-frame camera data
    (cs:739-764, 880-896)."""

    history_color: jnp.ndarray  # (H, W, 3) _PathTracingHistoryTexture
    history_sample: jnp.ndarray  # (H, W)   _PathTracingHistorySampleTexture
    history_depth: jnp.ndarray  # (H, W)    _PathTracingHistoryDepthTexture
    history_emission: jnp.ndarray  # (H, W, 3) _PathTracingHistoryEmissionTexture
    prev_inv_view_proj: jnp.ndarray  # (4, 4)
    prev_view_proj: jnp.ndarray  # (4, 4)
    prev_camera_position: jnp.ndarray  # (3,)

    @classmethod
    def create(cls, height: int, width: int, cam, dtype=jnp.float32) -> "TemporalState":
        """``dtype`` sets the color/emission history precision (the
        HDR-target axis, SURVEY C15): bfloat16 halves history HBM at
        the 11-bit-float quality point; depth/count stay f32 (RFloat/
        RHalf in the reference, cs:739-764)."""
        return cls(
            history_color=jnp.zeros((height, width, 3), dtype),
            history_sample=jnp.zeros((height, width), jnp.float32),
            history_depth=jnp.zeros((height, width), jnp.float32),
            history_emission=jnp.zeros((height, width, 3), dtype),
            prev_inv_view_proj=cam.inv_view_proj,
            prev_view_proj=cam.view_proj,
            prev_camera_position=cam.position,
        )


class TemporalResult(NamedTuple):
    color: jnp.ndarray  # (H, W, 3) denoised output
    sample_count: jnp.ndarray  # (H, W) updated per-pixel history length


def _point(img, uv):
    h, w = img.shape[0], img.shape[1]
    ix = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return gather2d(img, iy, ix)


def _bilinear_corners(uv, h, w):
    """The corner indices + weights of sample_bilinear, factored out so
    the packed path hits the exact same texels/lerp factors."""
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0.astype(x.dtype))[..., None]
    fy = (y - y0.astype(y.dtype))[..., None]
    return x0, y0, x1, y1, fx, fy


def _pack_history(state: "TemporalState") -> jnp.ndarray:
    """(H, W, 8) f32 row table: [color rgb, sample, depth, emission
    rgb]. One wide row gather fetches every history RT at a texel in a
    single per-index-priced op (PTConfig.packed_temporal; bf16 history
    widens losslessly, interpolation is f32 either way)."""
    return jnp.concatenate(
        [
            state.history_color.astype(jnp.float32),
            state.history_sample[..., None],
            state.history_depth[..., None],
            state.history_emission.astype(jnp.float32),
        ],
        axis=-1,
    )


def _bilinear_rows(table, uv):
    """Bilinear-interpolated packed rows at uv (4 wide gathers)."""
    from ..gbuffer_packed import gather_wide

    h, w = table.shape[0], table.shape[1]
    x0, y0, x1, y1, fx, fy = _bilinear_corners(uv, h, w)
    top = gather_wide(table, y0, x0) * (1 - fx) + gather_wide(table, y0, x1) * fx
    bot = gather_wide(table, y1, x0) * (1 - fx) + gather_wide(table, y1, x1) * fx
    return top * (1 - fy) + bot * fy


def _shift(img, dx, dy):
    """Point sample at uv + texel*(dx, dy) == clamped integer shift
    (dense slice, no gather)."""
    h, w = img.shape[0], img.shape[1]
    iy = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    ix = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[iy][:, ix]


def _spec_accum_speed(linear_roughness, nov, parallax, cfg: PTConfig):
    """GetSpecAccumSpeed (Denoise.hlsl:75-85)."""
    acos01sq = 1.0 - nov
    a = saturate(acos01sq) ** cfg.spec_accum_curve
    b = 1.1 + linear_roughness * linear_roughness
    sensitivity = (b + a) / (b - a)
    power_scale = 1.0 + parallax * sensitivity
    f = 1.0 - jnp.exp2(-200.0 * linear_roughness * linear_roughness)
    f = f * saturate(linear_roughness) ** (cfg.spec_accum_base_power * power_scale)
    return cfg.max_accum_frame_num * f


def _spec_dominant_factor(nov, linear_roughness):
    """GetSpecularDominantFactor (Denoise.hlsl:87-92)."""
    a = 0.298475 * jnp.log(39.4115 - 39.0029 * linear_roughness)
    return saturate(saturate(1.0 - nov) ** 10.8649 * (1.0 - a) + a)


def _clip_to_aabb(history, minimum, maximum):
    """DirectClipToAABB (Denoise.hlsl:46-61): clip toward the box center."""
    center = 0.5 * (maximum + minimum)
    extents = jnp.maximum(0.5 * (maximum - minimum), 1e-12)
    offset = history - center
    unit = jnp.abs(offset / extents)
    max_unit = jnp.max(unit, axis=-1, keepdims=True)
    clipped = center + offset / max_unit
    return jnp.where(max_unit > 1.0, clipped, history)


@named_pass(PASS_ACCUMULATION)
def temporal_reproject(
    current: jnp.ndarray,
    gb: GBuffers,
    cam,
    state: TemporalState,
    emission: jnp.ndarray,
    cfg: PTConfig,
    temporal_intensity,
    pixel_spread_angle_tangent,
    support_refraction: bool = False,
) -> TemporalResult:
    """One temporal accumulation step; returns the denoised color and the
    new per-pixel sample count (the pass-1 MRT outputs)."""
    h, w = current.shape[0], current.shape[1]
    uv = pixel_uv(h, w)
    max_n = float(cfg.max_accum_frame_num)

    velocity = gb.motion if gb.motion is not None else jnp.zeros((h, w, 2))
    prev_uv = uv - velocity

    packed = cfg.packed_temporal
    if packed is None:
        packed = jax.default_backend() == "tpu"

    # The four prev_uv history reads depend only on prev_uv/state —
    # hoisted together so the packed path can serve them from one
    # (H*W, 8) row table (5 wide gathers; the virtual-uv read below
    # adds 4 more), instead of ~20 channel-plane takes.
    if packed:
        table = _pack_history(state)
        bil = _bilinear_rows(table, prev_uv)
        prev_color_mv = bil[..., 0:3]
        history_sample = bil[..., 3]
        from ..gbuffer_packed import gather_wide

        ixp = jnp.clip(jnp.floor(prev_uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        iyp = jnp.clip(jnp.floor(prev_uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        rp = gather_wide(table, iyp, ixp)
        prev_depth = rp[..., 4]
        prev_emis = rp[..., 5:8]
    else:
        table = None
        prev_depth = _point(state.history_depth[..., None], prev_uv)[..., 0]
        prev_emis = _point(state.history_emission, prev_uv)
        history_sample = sample_bilinear(state.history_sample[..., None], prev_uv)[
            ..., 0
        ]
        prev_color_mv = sample_bilinear(state.history_color, prev_uv)

    device_depth = gb.layer1_depth()

    # Guide normal/smoothness: transparent G-buffer when refractive
    # (Denoise.hlsl:122-132).
    normal = gb.normal
    smoothness = gb.smoothness
    if support_refraction and gb.t_surface_type is not None:
        is_refr = gb.t_surface_type == SURFACE_TYPE_REFRACTION
        normal = jnp.where(is_refr[..., None], gb.t_normal, normal)
        smoothness = jnp.where(is_refr, gb.t_smoothness, smoothness)
    roughness = 1.0 - smoothness

    is_sky = device_depth == RAW_FAR_CLIP
    off_screen = (
        (prev_uv[..., 0] > 1.0)
        | (prev_uv[..., 0] < 0.0)
        | (prev_uv[..., 1] > 1.0)
        | (prev_uv[..., 1] < 0.0)
    )
    can_reproject = ~(is_sky | off_screen)

    position = world_from_uv_depth(cam.inv_view_proj, uv, device_depth)
    prev_position = world_from_uv_depth(state.prev_inv_view_proj, prev_uv, prev_depth)
    view = normalize(cam.position - position)
    ndotv = jnp.abs(dot3(normal, view))

    # Parallax (Denoise.hlsl:63-73).
    prev_view = normalize(state.prev_camera_position - prev_position)
    cosa = saturate(dot3(view, prev_view))
    parallax = jnp.sqrt(jnp.maximum(1.0 - cosa * cosa, 0.0)) / jnp.maximum(cosa, 1e-6)

    # World-radius rejection (Denoise.hlsl:8-19, 171-179).
    parallel_footprint = pixel_spread_angle_tangent * jnp.linalg.norm(position, axis=-1)
    real_footprint = parallel_footprint / jnp.maximum(
        jnp.abs(dot3(normal, view)), cfg.projection_epsilon
    )
    max_radius = jnp.maximum(
        cfg.max_reprojection_distance, real_footprint * cfg.max_pixel_tolerance
    )
    radius = jnp.linalg.norm(prev_position - position, axis=-1) / max_radius
    can_reproject = can_reproject & (radius <= 1.0)

    # Emission-change rejection (Denoise.hlsl:181-196).
    cur_emis = emission
    el = luminance(cur_emis)
    pl = luminance(prev_emis)
    ediff = 1.0 - jnp.abs(el - pl) / jnp.maximum(jnp.maximum(el, pl), 0.2)
    ediff = ediff * ediff
    emission_diff = jnp.where(can_reproject, ediff, 1.0)
    can_reproject = can_reproject & (emission_diff >= 0.5)

    # ---------------- Rough branch (Denoise.hlsl:200-238) ----------------
    acc_rough = jnp.where(
        history_sample >= max_n,
        jnp.asarray(temporal_intensity, jnp.float32),
        history_sample / (history_sample + 1.0),
    ) * jnp.maximum(emission_diff, 0.1) * (1.0 - radius)
    rough_ok = can_reproject & (history_sample != 0.0)
    rough_result = jnp.where(
        rough_ok[..., None],
        current * (1.0 - acc_rough[..., None]) + prev_color_mv * acc_rough[..., None],
        current,
    )
    rough_count = jnp.where(
        rough_ok, jnp.clip(history_sample + 1.0, 0.0, max_n), 1.0
    )

    # ---------------- Smooth branch (Denoise.hlsl:239-288) ----------------
    top_left = _shift(current, -1, -1)
    bottom_right = _shift(current, 1, 1)
    corners = 4.0 * (top_left + bottom_right) - 2.0 * current
    color = jnp.clip(current, 0.0, cfg.clamp_max)
    average = (corners + color) / 7.0
    color_luma = luminance(color)
    average_luma = luminance(average)
    vel_len = jnp.linalg.norm(velocity, axis=-1)
    nudge_scale = 4.0 + (0.25 - 4.0) * saturate(vel_len * 100.0)
    nudge = nudge_scale * jnp.abs(average_luma - color_luma)
    minimum = jnp.minimum(bottom_right, top_left) - nudge[..., None]
    maximum = jnp.maximum(top_left, bottom_right) + nudge[..., None]

    # Virtual reprojection of the reflected hit; hitDist quirk ==
    # length(positionWS) (Denoise.hlsl:163, 260).
    dominant = _spec_dominant_factor(ndotv, roughness)
    virtual_pos = position - view * (
        jnp.linalg.norm(position, axis=-1) * dominant
    )[..., None]
    # Planar expansion (camera.world_to_ndc rationale): the TPU
    # default-precision dot put texel-scale error on virtual_uv.
    pm = state.prev_view_proj
    vx, vy, vz = virtual_pos[..., 0], virtual_pos[..., 1], virtual_pos[..., 2]
    clipx = vx * pm[0, 0] + vy * pm[0, 1] + vz * pm[0, 2] + pm[0, 3]
    clipy = vx * pm[1, 0] + vy * pm[1, 1] + vz * pm[1, 2] + pm[1, 3]
    clipw = vx * pm[3, 0] + vy * pm[3, 1] + vz * pm[3, 2] + pm[3, 3]
    wdiv = jnp.where(jnp.abs(clipw) < 1e-12, 1e-12, clipw)[..., None]
    virtual_uv = (jnp.stack([clipx, clipy], -1) / wdiv) * 0.5 + 0.5
    if packed:
        prev_color_virtual = _bilinear_rows(table, virtual_uv)[..., 0:3]
    else:
        prev_color_virtual = sample_bilinear(state.history_color, virtual_uv)
    prev_clipped = _clip_to_aabb(prev_color_virtual, minimum, maximum)

    hist_luma = luminance(prev_clipped)
    diff = jnp.abs(color_luma - hist_luma) / jnp.maximum(
        jnp.maximum(color_luma, hist_luma), 0.2
    )
    weight = 1.0 - diff
    w2 = weight * weight

    eff_rough = jnp.maximum(roughness, 0.06) * (1.0 - w2)  # lerp(max(r,.06),0,w2)
    acc_spec = _spec_accum_speed(eff_rough, ndotv, parallax, cfg)
    acc_spec = jnp.where(
        (history_sample + 1.0) >= max_n,
        jnp.asarray(temporal_intensity, jnp.float32),
        saturate(jnp.minimum(acc_spec, (history_sample + 1.0) / max_n)),
    )
    blended = color + (prev_clipped - color) * acc_spec[..., None]
    smooth_result = jnp.where(
        can_reproject[..., None], jnp.clip(blended, 0.0, cfg.clamp_max), current
    )
    smooth_count = jnp.where(
        can_reproject, jnp.clip(history_sample + 1.0, 0.0, max_n), 1.0
    )

    use_rough = (roughness > cfg.roughness_accumulation_threshold) & (
        emission_diff > 0.5
    )
    result = jnp.where(use_rough[..., None], rough_result, smooth_result)
    count = jnp.where(use_rough, rough_count, smooth_count)
    return TemporalResult(color=result, sample_count=count)
