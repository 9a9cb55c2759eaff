"""G-buffer pytree and surface-data decode.

The reference consumes URP's deferred G-buffer plus auxiliary layers it
rasterizes itself (reference: PathTracingInput.hlsl:23-43 for layouts;
PathTracingUtilities.hlsl:115-211 for HitSurfaceDataFromGBuffer). In the
TPU framework these are *inputs* — device arrays produced by the fixture
rasterizer or a host engine — and the decode is a pure function.

Array layout: all images are (H, W, C) or (H, W); row 0 = bottom
(see camera.py conventions). Depth buffers hold raw reversed-Z device
depth; 0.0 == sky.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from .config import PTVariants

# Material flag constants (reference: PathTracingInput.hlsl:8-21, mirroring
# URP's kMaterialFlag* values).
MATERIAL_FLAG_RECEIVE_SHADOWS_OFF = 1
MATERIAL_FLAG_SPECULAR_HIGHLIGHTS_OFF = 2
MATERIAL_FLAG_SUBTRACTIVE_MIXED_LIGHTING = 4
MATERIAL_FLAG_SPECULAR_SETUP = 8
SURFACE_TYPE_REFRACTION = 2  # kSurfaceTypeRefraction (transparent GB flag)

DIELECTRIC_SPEC = 0.04  # kDieletricSpec.rgb (PathTracingUtilities.hlsl:15)


@struct.dataclass
class GBuffers:
    """Frame inputs: deferred G-buffer + auxiliary layers.

    Required layers (deferred G-buffer, PathTracingInput.hlsl:23-26):
      albedo         (H, W, 3)  GBuffer0.rgb
      material_flags (H, W) u32 GBuffer0.a unpacked (x255)
      gbuffer1       (H, W, 3)  specular rgb (specular setup) or metallic in .r
      normal         (H, W, 3)  GBuffer2.rgb world-space unit normal
      smoothness     (H, W)     GBuffer2.a
      emission       (H, W, 3)  GBuffer3 = scene color (emission + lighting)
      depth          (H, W)     opaque raw device depth (_CameraDepthTexture)

    Optional layers:
      depth_layer1 (H, W)    depth incl. first transparent layer
                             (_CameraDepthAttachment); defaults to depth.
      back_depth   (H, W)    backface raw depth (_CameraBackDepthTexture)
      back_normal  (H, W, 3) backface world normals (_CameraBackNormalsTexture)
      t_albedo     (H, W, 3) TransparentGBuffer0.rgb
      t_ior_raw    (H, W)    TransparentGBuffer1.r (ior = raw*2 + 0.921875)
      t_surface_type (H, W) u32  TransparentGBuffer1.a unpacked
      t_normal     (H, W, 3) TransparentGBuffer2.rgb
      t_smoothness (H, W)    TransparentGBuffer2.a
      motion       (H, W, 2) uv-space motion vectors (curr_uv - prev_uv)
    """

    albedo: jnp.ndarray
    material_flags: jnp.ndarray
    gbuffer1: jnp.ndarray
    normal: jnp.ndarray
    smoothness: jnp.ndarray
    emission: jnp.ndarray
    depth: jnp.ndarray
    depth_layer1: Optional[jnp.ndarray] = None
    back_depth: Optional[jnp.ndarray] = None
    back_normal: Optional[jnp.ndarray] = None
    t_albedo: Optional[jnp.ndarray] = None
    t_ior_raw: Optional[jnp.ndarray] = None
    t_surface_type: Optional[jnp.ndarray] = None
    t_normal: Optional[jnp.ndarray] = None
    t_smoothness: Optional[jnp.ndarray] = None
    motion: Optional[jnp.ndarray] = None

    @property
    def height(self) -> int:
        return self.depth.shape[0]

    @property
    def width(self) -> int:
        return self.depth.shape[1]

    def layer1_depth(self) -> jnp.ndarray:
        return self.depth if self.depth_layer1 is None else self.depth_layer1


@struct.dataclass
class SurfaceData:
    """Decoded hit-surface material data (the RayHit material fields,
    PathTracingUtilities.hlsl:37-48). All leaves are batched (...,)."""

    albedo: jnp.ndarray  # (..., 3)
    specular: jnp.ndarray  # (..., 3)
    normal: jnp.ndarray  # (..., 3)
    emission: jnp.ndarray  # (..., 3)
    smoothness: jnp.ndarray  # (...)
    ior: jnp.ndarray  # (...), -1.0 == opaque
    inside_object: jnp.ndarray  # (...), refraction state machine 0/1/2


def uv_to_pixel(uv, height: int, width: int):
    """Point-sampling index for a [0,1]^2 uv (nearest texel, clamped) —
    the my_point_clamp_sampler analog."""
    ix = jnp.clip(jnp.floor(uv[..., 0] * width).astype(jnp.int32), 0, width - 1)
    iy = jnp.clip(jnp.floor(uv[..., 1] * height).astype(jnp.int32), 0, height - 1)
    return iy, ix


def gather2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather img[iy, ix] for arbitrary-shaped integer index arrays.

    Channels are gathered one at a time from flat (H*W,) planes: a row
    gather of (N, C) with C=3 pads each row to a full 128-lane tile on
    TPU (measured 35-50 ms per gather at 1080p vs ~0.3 ms per channel
    plane — profiled on v5e).
    """
    h, w = img.shape[0], img.shape[1]
    idx = iy * w + ix
    if img.ndim == 2:
        return jnp.take(img.reshape(h * w), idx, axis=0, mode="clip")
    flat = img.reshape((h * w,) + img.shape[2:])
    channels = [
        jnp.take(flat[:, c], idx, axis=0, mode="clip")
        for c in range(img.shape[2])
    ]
    return jnp.stack(channels, axis=-1)


def pack_normal_oct_quad(normal: jnp.ndarray) -> jnp.ndarray:
    """Unit normal -> oct-encoded GBuffer2.rgb in [0, 1].

    DELIBERATE storage deviation from URP's _GBUFFER_NORMALS_OCT: URP
    additionally spreads the two oct components across all three 8-bit
    channels via Unpack888ToFloat2 (the reference decodes that first,
    PathTracingUtilities.hlsl:201: Unpack888ToFloat2(rayHit.normal)).
    Our fixtures store float arrays, so the 888<->float2 bit-spreading
    stage buys nothing — we store the raw [0,1] oct uv in rgb[:2] with
    rgb[2] = 0. The octahedral fold itself (the precision-relevant
    part) matches; these helpers roundtrip each other, not raw URP
    texture bytes."""
    from .ops.envprobe import oct_encode

    uv = oct_encode(normal)
    return jnp.concatenate([uv, jnp.zeros_like(uv[..., :1])], axis=-1)


def unpack_normal_oct_quad(rgb: jnp.ndarray) -> jnp.ndarray:
    """Oct-encoded GBuffer2.rgb -> unit normal. Inverse of
    pack_normal_oct_quad; covers the UnpackNormalOctQuadEncode stage of
    the reference decode (PathTracingUtilities.hlsl:203-205) but NOT
    the 888->float2 byte-spreading stage (see pack_normal_oct_quad —
    deliberate storage deviation)."""
    from .ops.envprobe import oct_decode

    return oct_decode(rgb[..., :2])


def hit_surface_from_gbuffer(
    gb: GBuffers,
    uv: jnp.ndarray,
    inside_object: jnp.ndarray,
    variants: PTVariants,
    back_depth_enabled: int = 0,
    direct: bool = False,
) -> SurfaceData:
    """Reconstruct hit-point material data from the G-buffer at ``uv``.

    Pure-function rebuild of HitSurfaceDataFromGBuffer
    (PathTracingUtilities.hlsl:115-211): transparent path when refraction
    is supported and the transparent G-buffer marks a refractive surface,
    opaque path otherwise; includes the metallic->specular conversion,
    the ior unpack (raw*2 + 0.921875, ref :137), the backface normal flip
    for rays inside an object (ref :146-161), and the insideObject state
    machine 0->1->2->0 (ref :166).

    ``uv``: (..., 2); ``inside_object``: (...) float. Static behavior is
    selected by ``variants`` (jit specialization, not runtime branching).

    ``direct=True`` skips the gathers and reads the arrays as-is — valid
    only when ``uv`` is exactly the full pixel grid (the primary-hit
    shortcut, PathTracing.hlsl:423-428). Gathers cost ~15 ms each at
    1080p on v5e; the primary decode needs none.
    """
    h, w = gb.height, gb.width
    if direct:
        fetch = lambda img: img  # noqa: E731
    else:
        iy, ix = uv_to_pixel(uv, h, w)
        fetch = lambda img: gather2d(img, iy, ix)  # noqa: E731

    # --- Opaque path (ref :168-210) ---
    albedo = fetch(gb.albedo)
    flags = fetch(gb.material_flags)
    g1 = fetch(gb.gbuffer1)
    normal = fetch(gb.normal)
    if variants.gbuffer_normals_oct:
        # _GBUFFER_NORMALS_OCT: GBuffer2.rgb holds the oct-quad-encoded
        # normal, not a unit vector (PathTracingUtilities.hlsl:201-205:
        # UnpackNormalOctQuadEncode(packedNormalWS.xyz * 2 - 1)).
        normal = unpack_normal_oct_quad(normal)
    smoothness = fetch(gb.smoothness)
    emission = fetch(gb.emission)

    is_forward = jnp.zeros_like(smoothness, dtype=bool)
    if variants.ignore_forward_objects:
        # Forward-only objects can't be traced; sentinel smoothness == 0
        # (ref :184-186 and PathTracing.hlsl:403-406).
        is_forward = smoothness == 0.0

    albedo = jnp.where(is_forward[..., None], 0.0, albedo)
    specular_setup = (flags & MATERIAL_FLAG_SPECULAR_SETUP) == MATERIAL_FLAG_SPECULAR_SETUP
    metallic = g1[..., 0]
    spec_from_metallic = (
        DIELECTRIC_SPEC * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    )
    specular = jnp.where(specular_setup[..., None], g1, spec_from_metallic)
    specular = jnp.where(is_forward[..., None], 0.0, specular)
    ior = jnp.full(smoothness.shape, -1.0, dtype=albedo.dtype)
    out_inside = inside_object

    if variants.support_refraction and gb.t_surface_type is not None:
        # --- Transparent path (ref :125-167) ---
        # A transparent G-buffer lookup applies while the ray is not about
        # to exit (insideObject != 2).
        is_t_layer = inside_object != 2.0
        t_type = fetch(gb.t_surface_type)
        use_t = is_t_layer & (t_type == SURFACE_TYPE_REFRACTION)

        t_albedo = fetch(gb.t_albedo)
        t_ior = fetch(gb.t_ior_raw) * 2.0 + 0.921875
        t_normal = fetch(gb.t_normal)
        t_smooth = fetch(gb.t_smoothness)

        # Normal flip for rays inside the object (ref :146-161).
        entering_back = inside_object == 1.0
        if back_depth_enabled == 2 and gb.back_normal is not None:
            bn = fetch(gb.back_normal)
            has_bn = jnp.any(bn != 0.0, axis=-1)
            flipped = jnp.where(has_bn[..., None], -bn, -t_normal)
        else:
            flipped = -t_normal
        t_normal = jnp.where(entering_back[..., None], flipped, t_normal)

        albedo = jnp.where(use_t[..., None], t_albedo, albedo)
        specular = jnp.where(use_t[..., None], DIELECTRIC_SPEC, specular)
        normal = jnp.where(use_t[..., None], t_normal, normal)
        smoothness = jnp.where(use_t, t_smooth, smoothness)
        emission = jnp.where(use_t[..., None], 0.0, emission)
        ior = jnp.where(use_t, t_ior, ior)
        # Enter/exit state machine: 2 -> 0, else +1 (ref :166).
        stepped = jnp.where(inside_object == 2.0, 0.0, inside_object + 1.0)
        out_inside = jnp.where(use_t, stepped, inside_object)

    return SurfaceData(
        albedo=albedo,
        specular=specular,
        normal=normal,
        emission=emission,
        smoothness=smoothness,
        ior=ior,
        inside_object=out_inside,
    )
