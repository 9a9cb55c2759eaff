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
    pushes, PathTracingSetReflectionProbe.cs:56-83)."""

    texture: jnp.ndarray  # (R, R, 3) oct-mapped HDR radiance
    hdr_mult: jnp.ndarray  # () DecodeHDREnvironment intensity
    box_min: jnp.ndarray  # (3,)
    box_max: jnp.ndarray  # (3,)
    position: jnp.ndarray  # (3,) probe origin; w>0 == box projection
    box_projection: jnp.ndarray  # () 0.0 or 1.0


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


def sample_probe(probe: EnvProbe, direction, position_ws):
    """Sample one probe with optional box projection; dir need not be unit
    after projection (oct_encode normalizes)."""
    projected = box_projected_direction(direction, position_ws, probe)
    lookup = jnp.where(probe.box_projection > 0.0, projected, direction)
    uv = oct_encode(lookup)
    return sample_bilinear(probe.texture, uv) * probe.hdr_mult


def sample_reflection_probes(probes: ProbeSet, direction, position_ws, mip_level=1.0):
    """SampleReflectionProbes analog (PathTracingFallback.hlsl:306-318).

    ``mip_level`` is accepted for parity; prefiltered mip chains are a
    quality refinement tracked for a later round (the reference uses
    mip 1 of the probe chain purely to reduce noise).
    """
    del mip_level
    color = sample_probe(probes.probe0, direction, position_ws)
    if probes.probe_set is not None:
        color = jnp.where(probes.probe_set == 1.0, color, 0.0)
    if probes.probe1 is not None and probes.blend_weight is not None:
        color2 = sample_probe(probes.probe1, direction, position_ws)
        w = probes.blend_weight
        color = jnp.where(w > 0.0, color * (1.0 - w) + color2 * w, color)
    if probes.is_probe_camera is not None:
        color = jnp.where(probes.is_probe_camera == 1.0, color * 0.3, color)
    return color
