"""Reflection-probe management (the C11 binder analog) + probe baking.

The reference's PathTracingSetReflectionProbe.cs (:49-83) finds the two
closest/most-important reflection probes each frame and pushes their
cubemaps + box bounds to the tracer. Here probes live as oct-mapped 2D
textures (ops/envprobe.py); this module provides:

  * ``bake_probe``  — renders a probe texture by ray-casting the analytic
    scene from the probe origin over oct-mapped directions (emission +
    one diffuse bounce), the stand-in for Unity's baked probes;
  * ``closest_probes`` — the per-frame 2-probe selection + blend weight,
    mirroring the binder's distance sort.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..ops.envprobe import EnvProbe, ProbeSet, build_probe_mips
from .scene import Scene, intersect_scene


def _oct_grid_dirs(resolution: int) -> np.ndarray:
    """Direction for every texel of an oct-mapped texture (numpy)."""
    t = (np.arange(resolution, dtype=np.float32) + 0.5) / resolution
    u, v = np.meshgrid(t, t)
    f = np.stack([u, v], -1) * 2.0 - 1.0
    z = 1.0 - np.abs(f[..., 0]) - np.abs(f[..., 1])
    tt = np.clip(-z, 0.0, 1.0)
    xy = f + np.where(f >= 0.0, -tt[..., None], tt[..., None])
    d = np.concatenate([xy, z[..., None]], -1)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def bake_probe(
    scene: Scene,
    position,
    resolution: int = 64,
    bounce_samples: int = 16,
    seed: int = 0,
    box_min=None,
    box_max=None,
) -> EnvProbe:
    """Bake an oct-mapped radiance probe at ``position``: direct emission
    along each texel direction plus a cosine-sampled diffuse bounce
    (matching what Unity's baked probes capture for emissive scenes)."""
    rng = np.random.default_rng(seed)
    pos = np.asarray(position, np.float32)
    dirs = _oct_grid_dirs(resolution).reshape(-1, 3)
    n = dirs.shape[0]
    origins = np.broadcast_to(pos, (n, 3)).astype(np.float32)
    prims = list(scene.primitives)
    mats = [p.material for p in prims]
    sky = np.asarray(scene.sky_color, np.float32)

    t, normal, idx = intersect_scene(prims, origins, dirs)
    hit = np.isfinite(t)
    radiance = np.where(hit[..., None], 0.0, sky).astype(np.float32)
    albedo = np.zeros((n, 3), np.float32)
    emis = np.zeros((n, 3), np.float32)
    for i, m in enumerate(mats):
        sel = hit & (idx == i)
        albedo[sel] = m.albedo
        emis[sel] = m.emission
    radiance += emis

    # One diffuse bounce, Monte Carlo over the hemisphere.
    hp = origins + dirs * np.where(hit, t, 0.0)[..., None] + normal * 1e-4
    bounce = np.zeros((n, 3), np.float32)
    for _ in range(bounce_samples):
        u1 = rng.random(n, np.float32)
        u2 = rng.random(n, np.float32)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        # Build a tangent frame around the hit normal.
        s = np.where(normal[..., 2] >= 0.0, 1.0, -1.0)
        a = -1.0 / (s + normal[..., 2])
        b = normal[..., 0] * normal[..., 1] * a
        tang = np.stack([1.0 + s * normal[..., 0] ** 2 * a, s * b, -s * normal[..., 0]], -1)
        bit = np.stack([b, s + normal[..., 1] ** 2 * a, -normal[..., 1]], -1)
        local = np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(np.clip(1 - u1, 0, 1))], -1)
        d2 = local[..., 0:1] * tang + local[..., 1:2] * bit + local[..., 2:3] * normal
        t2, _, idx2 = intersect_scene(prims, hp, d2.astype(np.float32))
        hit2 = np.isfinite(t2)
        e2 = np.where(hit2[..., None], 0.0, sky).astype(np.float32)
        for i, m in enumerate(mats):
            e2[hit2 & (idx2 == i)] += m.emission
        bounce += e2
    radiance += np.where(hit[..., None], albedo * bounce / bounce_samples, 0.0)

    tex = radiance.reshape(resolution, resolution, 3)
    kw = {}
    if box_min is not None and box_max is not None:
        kw = dict(
            box_min=jnp.asarray(box_min, jnp.float32),
            box_max=jnp.asarray(box_max, jnp.float32),
            box_projection=jnp.asarray(1.0, jnp.float32),
        )
    else:
        kw = dict(
            box_min=jnp.zeros(3, jnp.float32),
            box_max=jnp.zeros(3, jnp.float32),
            box_projection=jnp.asarray(0.0, jnp.float32),
        )
    texture = jnp.asarray(tex)
    return EnvProbe(
        texture=texture,
        hdr_mult=jnp.asarray(1.0, jnp.float32),
        position=jnp.asarray(pos),
        # Prefiltered chain: the tracer samples mip 1 on every miss
        # (PathTracingFallback.hlsl:306-318).
        mips=build_probe_mips(texture),
        **kw,
    )


def closest_probes(
    probes: Sequence[EnvProbe], positions: Sequence, camera_position
) -> ProbeSet:
    """The binder's per-frame selection (PathTracingSetReflectionProbe.cs
    :53-83): sort probes by distance to the camera, bind the closest two,
    blend weight from relative distance."""
    cam = np.asarray(camera_position, np.float32)
    d = [float(np.linalg.norm(np.asarray(p, np.float32) - cam)) for p in positions]
    order = np.argsort(d)
    p0 = probes[order[0]]
    if len(probes) == 1:
        return ProbeSet(probe0=p0, probe_set=jnp.asarray(1.0, jnp.float32))
    p1 = probes[order[1]]
    d0, d1 = d[order[0]], d[order[1]]
    w = 0.0 if d0 + d1 == 0 else d0 / (d0 + d1) * 0.5  # favor the closest
    return ProbeSet(
        probe0=p0,
        probe1=p1,
        blend_weight=jnp.asarray(w, jnp.float32),
        probe_set=jnp.asarray(1.0, jnp.float32),
    )
