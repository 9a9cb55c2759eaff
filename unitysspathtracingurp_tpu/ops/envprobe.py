"""Environment fallback: reflection-probe sampling on ray miss.

Rebuild of SampleReflectionProbes (PathTracingFallback.hlsl:264-318):
up to two probes with optional box projection, HDR intensity, and blend
weight. This is the only sky/environment light source (the orchestrator
zeroes Unity ambient while the tracer is active, cs:378-389).

TPU-native representation: each probe's cubemap becomes a square
**octahedral-mapped 2D texture** — a single gather-friendly array
instead of a 6-face cubemap — sampled bilinearly. The URP Forward+
probe *atlas* path (PathTracingFallback.hlsl:15-259) is engine plumbing
(z-bin/tile cluster iteration over a shared atlas); its capability is
covered by replicating the probe list per chip (SURVEY.md C8).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .brdf import dot3


def oct_encode(direction):
    """Unit direction -> octahedral uv in [0,1]^2 (standard oct mapping)."""
    d = direction
    denom = jnp.sum(jnp.abs(d), axis=-1, keepdims=True)
    p = d / jnp.maximum(denom, 1e-12)
    xy = p[..., :2]
    # Fold the lower hemisphere.
    folded = (1.0 - jnp.abs(xy[..., ::-1])) * jnp.where(xy >= 0.0, 1.0, -1.0)
    xy = jnp.where(p[..., 2:3] < 0.0, folded, xy)
    return xy * 0.5 + 0.5


def oct_decode(uv):
    """Octahedral uv in [0,1]^2 -> unit direction."""
    f = uv * 2.0 - 1.0
    z = 1.0 - jnp.abs(f[..., 0]) - jnp.abs(f[..., 1])
    t = jnp.clip(-z, 0.0, 1.0)
    xy = f + jnp.where(f >= 0.0, -t[..., None], t[..., None])
    d = jnp.concatenate([xy, z[..., None]], axis=-1)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def sample_bilinear(texture, uv):
    """Bilinear sample of an (R, R, C) texture at uv in [0,1]^2 (clamped)."""
    h, w = texture.shape[0], texture.shape[1]
    if h == 1 and w == 1:
        # Constant texture (e.g. uniform sky probe): no gather needed.
        return jnp.broadcast_to(texture[0, 0], uv.shape[:-1] + (texture.shape[-1],))
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0.astype(x.dtype))[..., None]
    fy = (y - y0.astype(y.dtype))[..., None]
    flat = texture.reshape(h * w, -1)
    n_ch = flat.shape[-1]

    def at(yy, xx):
        if n_ch == 1:
            return jnp.take(flat[:, 0], yy * w + xx, axis=0, mode="clip")[..., None]
        # One wide gather per tap: per-index gather pricing on TPU
        # (gbuffer_packed.gather_wide).
        from ..gbuffer_packed import gather_wide

        return gather_wide(texture.reshape(h, w, n_ch), yy, xx)

    top = at(y0, x0) * (1 - fx) + at(y0, x1) * fx
    bot = at(y1, x0) * (1 - fx) + at(y1, x1) * fx
    return top * (1 - fy) + bot * fy


@struct.dataclass
class EnvProbe:
    """One reflection probe (the _SpecCube0/1 uniform set the C# binder
    pushes, PathTracingSetReflectionProbe.cs:56-83).

    ``mips`` is the prefiltered chain analog of Unity's PMREM cubemap
    mips (the reference samples mip 1 on every ray miss,
    PathTracingFallback.hlsl:306-318): mips[0] is ``texture`` itself,
    each further level is progressively lowpassed + downsampled on the
    oct map (build_probe_mips). None = point-sampled probe (tests,
    constant skies)."""

    texture: jnp.ndarray  # (R, R, 3) oct-mapped HDR radiance
    hdr_mult: jnp.ndarray  # () DecodeHDREnvironment intensity
    box_min: jnp.ndarray  # (3,)
    box_max: jnp.ndarray  # (3,)
    position: jnp.ndarray  # (3,) probe origin; w>0 == box projection
    box_projection: jnp.ndarray  # () 0.0 or 1.0
    mips: tuple = ()  # prefiltered chain: level i is (R/2^i, R/2^i, 3)


@struct.dataclass
class ProbeSet:
    """Up to two probes + blend weight (_ProbeWeight) + flags."""

    probe0: EnvProbe
    probe1: EnvProbe | None = None
    blend_weight: jnp.ndarray | None = None  # () in [0,1]
    probe_set: jnp.ndarray | None = None  # () _ProbeSet: 0 disables sampling
    is_probe_camera: jnp.ndarray | None = None  # () damp x0.3 when rendering a probe


def constant_probe(color, resolution: int = 1) -> EnvProbe:
    """Uniform-radiance probe (constant sky), for tests and fixtures.
    Resolution 1 hits sample_bilinear's broadcast fast path (no gather)."""
    color = jnp.asarray(color, jnp.float32)
    tex = jnp.broadcast_to(color, (resolution, resolution, 3))
    return EnvProbe(
        texture=tex,
        hdr_mult=jnp.asarray(1.0, jnp.float32),
        box_min=jnp.zeros(3, jnp.float32),
        box_max=jnp.zeros(3, jnp.float32),
        position=jnp.zeros(3, jnp.float32),
        box_projection=jnp.asarray(0.0, jnp.float32),
    )


def build_probe_mips(texture: jnp.ndarray, n_mips: int = 4) -> tuple:
    """Prefiltered mip chain for an oct-mapped probe texture.

    Each level applies a 3x3 binomial lowpass then 2x2 box-downsamples
    — the progressive-blur approximation of Unity's GGX-prefiltered
    cubemap chain (each mip targets a wider roughness lobe). Dense ops
    only; run once at probe bake time (models/probes.py)."""
    mips = [texture]
    t = texture
    for _ in range(n_mips - 1):
        if t.shape[0] < 2 or t.shape[1] < 2:
            break
        # 3x3 binomial blur with edge clamp (separable).
        p = jnp.pad(t, ((1, 1), (0, 0), (0, 0)), mode="edge")
        t = (p[:-2] + 2.0 * p[1:-1] + p[2:]) * 0.25
        p = jnp.pad(t, ((0, 0), (1, 1), (0, 0)), mode="edge")
        t = (p[:, :-2] + 2.0 * p[:, 1:-1] + p[:, 2:]) * 0.25
        h, w = t.shape[0] // 2 * 2, t.shape[1] // 2 * 2
        t = t[:h, :w].reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))
        mips.append(t)
    return tuple(mips)


def box_projected_direction(direction, position_ws, probe: EnvProbe):
    """Parallax-corrected lookup direction for a box-projected probe
    (PathTracingFallback.hlsl:271-276): intersect the ray with the probe
    AABB, re-aim from the probe origin."""
    bounds = jnp.where(direction > 0.0, probe.box_max, probe.box_min)
    zero = jnp.abs(direction) < 1e-9
    d = jnp.where(zero, 1.0, direction)
    # A zero component doesn't constrain the exit point: factor -> +inf.
    factors = jnp.where(zero, jnp.inf, (bounds - position_ws) / d)
    scalar = jnp.min(factors, axis=-1, keepdims=True)
    return direction * scalar + (position_ws - probe.position)


def _mip_texture(probe: EnvProbe, level: int):
    if not probe.mips:
        return probe.texture
    return probe.mips[min(level, len(probe.mips) - 1)]


def sample_probe(probe: EnvProbe, direction, position_ws, mip_level: float = 0.0):
    """Sample one probe with optional box projection; dir need not be unit
    after projection (oct_encode normalizes). ``mip_level`` (static)
    samples the prefiltered chain with trilinear level blending, as the
    reference's SAMPLE_TEXTURECUBE_LOD does on its PMREM chain."""
    projected = box_projected_direction(direction, position_ws, probe)
    lookup = jnp.where(probe.box_projection > 0.0, projected, direction)
    uv = oct_encode(lookup)
    lo = int(mip_level)
    frac = float(mip_level) - lo
    color = sample_bilinear(_mip_texture(probe, lo), uv)
    if frac > 0.0 and probe.mips:
        hi = sample_bilinear(_mip_texture(probe, lo + 1), uv)
        color = color * (1.0 - frac) + hi * frac
    return color * probe.hdr_mult


def sample_reflection_probes(probes: ProbeSet, direction, position_ws, mip_level=1.0):
    """SampleReflectionProbes analog (PathTracingFallback.hlsl:306-318):
    every ray miss samples mip 1 of the prefiltered probe chain (the
    half-constant ``1.0h`` lod argument), which is why probe baking
    builds the chain (build_probe_mips). Probes without a chain fall
    back to their base texture."""
    color = sample_probe(probes.probe0, direction, position_ws, mip_level)
    if probes.probe_set is not None:
        color = jnp.where(probes.probe_set == 1.0, color, 0.0)
    if probes.probe1 is not None and probes.blend_weight is not None:
        color2 = sample_probe(probes.probe1, direction, position_ws, mip_level)
        w = probes.blend_weight
        color = jnp.where(w > 0.0, color * (1.0 - w) + color2 * w, color)
    if probes.is_probe_camera is not None:
        color = jnp.where(probes.is_probe_camera == 1.0, color * 0.3, color)
    return color
