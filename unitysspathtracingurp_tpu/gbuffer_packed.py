"""Bit-packed G-buffer: one u32 word per G-buffer slot per pixel.

The reference's G-buffer lives in packed render targets — GBuffer0/1/2
are RGBA8, GBuffer3 is B10G11R11F (PathTracingInput.hlsl:23-26; format
selection GetGBufferFormat cs:1486-1504) — and the tracer *unpacks on
read*. The unpacked GBuffers pytree (gbuffer.py) keeps f32 planes for
fixtures/tests; this module is the device-side packed layout:

  pack0  u32  albedo.rgb (unorm8 x3)  | materialFlags (u8)     [GBuffer0]
  pack1  u32  gbuffer1.rgb (unorm8 x3)| unused                  [GBuffer1]
  pack2  u32  normal (oct 12+12)      | smoothness (unorm8)     [GBuffer2]
  pack3  u32  emission (RGBE shared-exponent HDR)               [GBuffer3]
  t_pack0 u32 t_albedo.rgb (unorm8x3) | ior raw (unorm8)        [TGBuffer0/1]
  t_pack1 u32 t_normal (oct 12+12)    | t_smoothness (u7) + refractive bit
  bn_pack u32 back_normal (oct 12+12) | has-normal bit

Why: every texel fetch in the bounce decode is a ~15 ms random gather at
1080p on this TPU stack; packing turns ~14 gathers per decode into 4
(+2 for refraction). Quantization matches (or beats: 12-bit oct normals
vs the reference's 8-bit) the reference's own storage precision.

Depth layers stay f32 planes (precision-critical; one gather per march
step regardless).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .config import PTVariants
from .gbuffer import (
    DIELECTRIC_SPEC,
    GBuffers,
    MATERIAL_FLAG_SPECULAR_SETUP,
    SURFACE_TYPE_REFRACTION,
    SurfaceData,
    gather2d,
    uv_to_pixel,
)
from .ops.envprobe import oct_decode, oct_encode

_U8 = jnp.uint32(0xFF)
_U12 = jnp.uint32(0xFFF)


def _pack_unorm8(x, shift):
    q = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint32)
    return q << jnp.uint32(shift)


def _unpack_unorm8(word, shift):
    return ((word >> jnp.uint32(shift)) & _U8).astype(jnp.float32) / 255.0


def _pack_oct12(normal):
    """Unit normal -> 24-bit octahedral (12+12)."""
    uv = oct_encode(normal)
    q = jnp.clip(jnp.round(uv * 4095.0), 0, 4095).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << jnp.uint32(12))


def _unpack_oct12(word):
    u = (word & _U12).astype(jnp.float32) / 4095.0
    v = ((word >> jnp.uint32(12)) & _U12).astype(jnp.float32) / 4095.0
    return oct_decode(jnp.stack([u, v], axis=-1))


def _pack_rgbe(rgb):
    """Shared-exponent HDR (RGBE): the B10G11R11-class HDR storage."""
    maxc = jnp.maximum(jnp.max(rgb, axis=-1), 1e-32)
    e = jnp.ceil(jnp.log2(maxc))
    e = jnp.clip(e, -64.0, 63.0)
    scale = jnp.exp2(-e) * 255.0
    q = jnp.clip(jnp.round(rgb * scale[..., None]), 0, 255).astype(jnp.uint32)
    eb = (e.astype(jnp.int32) + 64).astype(jnp.uint32)
    zero = jnp.max(rgb, axis=-1) <= 0.0
    word = q[..., 0] | (q[..., 1] << jnp.uint32(8)) | (q[..., 2] << jnp.uint32(16)) | (eb << jnp.uint32(24))
    return jnp.where(zero, jnp.uint32(0), word)


def _unpack_rgbe(word):
    e = ((word >> jnp.uint32(24)) & _U8).astype(jnp.int32) - 64
    scale = jnp.exp2(e.astype(jnp.float32)) / 255.0
    r = (word & _U8).astype(jnp.float32)
    g = ((word >> jnp.uint32(8)) & _U8).astype(jnp.float32)
    b = ((word >> jnp.uint32(16)) & _U8).astype(jnp.float32)
    rgb = jnp.stack([r, g, b], axis=-1) * scale[..., None]
    return jnp.where((word == 0)[..., None], 0.0, rgb)


@struct.dataclass
class PackedGBuffers:
    # Interleaved (H, W, 4) u32: [pack0, pack1, pack2, pack3] per texel.
    # One 4-wide gather fetches a full surface decode: gather cost on
    # TPU is per-index, not per-element (measured: a (1,4) slice gather
    # costs the same ~15 ms as a scalar gather at 1080p).
    packs: jnp.ndarray
    depth: jnp.ndarray  # (H, W) f32 raw reversed-Z
    depth_layer1: Optional[jnp.ndarray] = None
    back_depth: Optional[jnp.ndarray] = None
    bn_pack: Optional[jnp.ndarray] = None
    # Interleaved (H, W, 2) u32: [t_pack0, t_pack1] per texel.
    t_packs: Optional[jnp.ndarray] = None
    motion: Optional[jnp.ndarray] = None

    @property
    def height(self) -> int:
        return self.depth.shape[0]

    @property
    def width(self) -> int:
        return self.depth.shape[1]

    def layer1_depth(self):
        return self.depth if self.depth_layer1 is None else self.depth_layer1


def pack_gbuffers(gb: GBuffers) -> PackedGBuffers:
    """Dense (gather-free) encode of the unpacked G-buffer."""
    pack0 = (
        _pack_unorm8(gb.albedo[..., 0], 0)
        | _pack_unorm8(gb.albedo[..., 1], 8)
        | _pack_unorm8(gb.albedo[..., 2], 16)
        | ((gb.material_flags.astype(jnp.uint32) & _U8) << jnp.uint32(24))
    )
    pack1 = (
        _pack_unorm8(gb.gbuffer1[..., 0], 0)
        | _pack_unorm8(gb.gbuffer1[..., 1], 8)
        | _pack_unorm8(gb.gbuffer1[..., 2], 16)
    )
    pack2 = _pack_oct12(gb.normal) | (
        jnp.clip(jnp.round(gb.smoothness * 255.0), 0, 255).astype(jnp.uint32)
        << jnp.uint32(24)
    )
    pack3 = _pack_rgbe(gb.emission)
    kw = {}
    if gb.t_surface_type is not None:
        t_pack0 = (
            _pack_unorm8(gb.t_albedo[..., 0], 0)
            | _pack_unorm8(gb.t_albedo[..., 1], 8)
            | _pack_unorm8(gb.t_albedo[..., 2], 16)
            | _pack_unorm8(gb.t_ior_raw, 24)
        )
        refract_bit = (gb.t_surface_type == SURFACE_TYPE_REFRACTION).astype(jnp.uint32)
        t_pack1 = (
            _pack_oct12(gb.t_normal)
            | (
                jnp.clip(jnp.round(gb.t_smoothness * 127.0), 0, 127).astype(jnp.uint32)
                << jnp.uint32(24)
            )
            | (refract_bit << jnp.uint32(31))
        )
        kw["t_packs"] = jnp.stack([t_pack0, t_pack1], axis=-1)
    if gb.back_normal is not None:
        has_bn = jnp.any(gb.back_normal != 0.0, axis=-1).astype(jnp.uint32)
        kw["bn_pack"] = _pack_oct12(gb.back_normal) | (has_bn << jnp.uint32(31))
    return PackedGBuffers(
        packs=jnp.stack([pack0, pack1, pack2, pack3], axis=-1),
        depth=gb.depth,
        depth_layer1=gb.depth_layer1,
        back_depth=gb.back_depth,
        motion=gb.motion,
        **kw,
    )


def gather_wide(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather full (C,)-rows of an (H, W, C) array at per-lane (iy, ix):
    ONE per-index gather with a (1, C) slice — same cost as a scalar
    gather on TPU (per-index pricing, measured on v5e)."""
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    idx = (iy * w + ix).reshape(-1, 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    out = jax.lax.gather(
        flat, jnp.clip(idx, 0, h * w - 1), dn, slice_sizes=(1, c),
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return out.reshape(iy.shape + (c,))


def hit_surface_from_packed(
    pgb: PackedGBuffers,
    uv: jnp.ndarray,
    inside_object: jnp.ndarray,
    variants: PTVariants,
    back_depth_enabled: int = 0,
    direct: bool = False,
) -> SurfaceData:
    """HitSurfaceDataFromGBuffer over the packed layout: ONE 4-wide
    gather for the opaque path (+1 2-wide transparent, +1 backface
    normals). Semantics are identical to
    gbuffer.hit_surface_from_gbuffer at the reference's own storage
    precision."""
    h, w = pgb.height, pgb.width
    if direct:
        words = pgb.packs
        fetch = lambda img: img  # noqa: E731
        fetch_wide = lambda img: img  # noqa: E731
    else:
        iy, ix = uv_to_pixel(uv, h, w)
        fetch = lambda img: gather2d(img, iy, ix)  # noqa: E731
        fetch_wide = lambda img: gather_wide(img, iy, ix)  # noqa: E731
        words = fetch_wide(pgb.packs)

    w0 = words[..., 0]
    w1 = words[..., 1]
    w2 = words[..., 2]
    w3 = words[..., 3]

    albedo = jnp.stack(
        [_unpack_unorm8(w0, 0), _unpack_unorm8(w0, 8), _unpack_unorm8(w0, 16)], axis=-1
    )
    flags = (w0 >> jnp.uint32(24)) & _U8
    g1 = jnp.stack(
        [_unpack_unorm8(w1, 0), _unpack_unorm8(w1, 8), _unpack_unorm8(w1, 16)], axis=-1
    )
    normal = _unpack_oct12(w2)
    smoothness = ((w2 >> jnp.uint32(24)) & _U8).astype(jnp.float32) / 255.0
    emission = _unpack_rgbe(w3)

    is_forward = jnp.zeros_like(smoothness, dtype=bool)
    if variants.ignore_forward_objects:
        is_forward = smoothness == 0.0
    albedo = jnp.where(is_forward[..., None], 0.0, albedo)
    specular_setup = (flags & MATERIAL_FLAG_SPECULAR_SETUP) == MATERIAL_FLAG_SPECULAR_SETUP
    metallic = g1[..., 0]
    spec_from_metallic = (
        DIELECTRIC_SPEC * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    )
    specular = jnp.where(specular_setup[..., None], g1, spec_from_metallic)
    specular = jnp.where(is_forward[..., None], 0.0, specular)
    ior = jnp.full(smoothness.shape, -1.0, dtype=jnp.float32)
    out_inside = inside_object

    if variants.support_refraction and pgb.t_packs is not None:
        is_t_layer = inside_object != 2.0
        t_words = fetch_wide(pgb.t_packs)
        tw0 = t_words[..., 0]
        tw1 = t_words[..., 1]
        is_refractive = (tw1 >> jnp.uint32(31)) == 1
        use_t = is_t_layer & is_refractive

        t_albedo = jnp.stack(
            [_unpack_unorm8(tw0, 0), _unpack_unorm8(tw0, 8), _unpack_unorm8(tw0, 16)],
            axis=-1,
        )
        t_ior = _unpack_unorm8(tw0, 24) * 2.0 + 0.921875
        t_normal = _unpack_oct12(tw1)
        t_smooth = ((tw1 >> jnp.uint32(24)) & jnp.uint32(0x7F)).astype(jnp.float32) / 127.0

        entering_back = inside_object == 1.0
        if back_depth_enabled == 2 and pgb.bn_pack is not None:
            bw = fetch(pgb.bn_pack)
            bn = _unpack_oct12(bw)
            has_bn = (bw >> jnp.uint32(31)) == 1
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
