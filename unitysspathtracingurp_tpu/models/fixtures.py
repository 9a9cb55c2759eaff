"""G-buffer fixture generation: the host "rasterizer".

Produces the arrays the TPU tracer consumes, playing the role of URP's
deferred G-buffer pass plus the reference's three auxiliary raster
passes (SURVEY.md C9c/C9d/C9e):
  * opaque G-buffer + depth          (URP deferred pass)
  * backface depth + normals         (BackfaceDepthPass, cs:1226-1456)
  * transparent G-buffer + layer-1   (TransparentGBufferPass, cs:1458-1761)
    depth
  * motion vectors                   (URP motion vector pass)

Implemented as an analytic ray-caster over models/scene.py primitives —
per-pixel primary visibility is exactly rasterization for these scenes.
Host-side numpy; outputs a GBuffers pytree of device arrays.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..camera import Camera, make_camera
from ..gbuffer import GBuffers, MATERIAL_FLAG_SPECULAR_SETUP, SURFACE_TYPE_REFRACTION
from .scene import Scene, intersect_scene


def _np_pixel_uv(h, w):
    v = (np.arange(h, dtype=np.float32) + 0.5) / h
    u = (np.arange(w, dtype=np.float32) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    return np.stack([uu, vv], axis=-1)  # (H, W, 2)


def _np_world_to_ndc(vp, p):
    clip = p @ vp[:3, :3].T + vp[:3, 3]
    w = p @ vp[3, :3] + vp[3, 3]
    w = np.where(np.abs(w) < 1e-12, 1e-12, w)
    ndc = clip / w[..., None]
    return np.concatenate([ndc[..., :2] * 0.5 + 0.5, ndc[..., 2:3]], axis=-1)


def _np_world_from_uv_depth(ivp, uv, raw):
    clip = np.concatenate(
        [uv * 2.0 - 1.0, raw[..., None], np.ones_like(raw)[..., None]], axis=-1
    )
    hpos = clip @ ivp.T
    return hpos[..., :3] / hpos[..., 3:4]


def primary_rays(cam: Camera, h: int, w: int):
    """Camera origin + per-pixel unit directions, (H*W, 3) each, using the
    exact pixel-center convention of camera.pixel_uv."""
    ivp = np.asarray(cam.inv_view_proj)
    pos = np.asarray(cam.position)
    uv = _np_pixel_uv(h, w).reshape(-1, 2)
    pts = _np_world_from_uv_depth(ivp, uv, np.full(uv.shape[0], 0.5, np.float32))
    d = pts - pos
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(pos, d.shape).astype(np.float32)
    return o.copy(), d.astype(np.float32)


def _material_arrays(prims, idx, n_rays):
    """Per-ray material attribute lookup tables."""
    alb = np.zeros((n_rays, 3), np.float32)
    g1 = np.zeros((n_rays, 3), np.float32)
    flags = np.zeros(n_rays, np.uint32)
    smooth = np.zeros(n_rays, np.float32)
    emis = np.zeros((n_rays, 3), np.float32)
    ior = np.full(n_rays, -1.0, np.float32)
    for i, p in enumerate(prims):
        m = p.material
        sel = idx == i
        alb[sel] = m.albedo
        smooth[sel] = m.smoothness
        emis[sel] = m.emission
        if m.specular is not None:
            g1[sel] = m.specular
            flags[sel] |= MATERIAL_FLAG_SPECULAR_SETUP
        else:
            g1[sel] = (m.metallic, 0.0, 0.0)
        if m.ior is not None:
            ior[sel] = m.ior
    return alb, g1, flags, smooth, emis, ior


def rasterize_gbuffers(
    scene: Scene,
    cam: Camera,
    height: int,
    width: int,
    prev_cam: Optional[Camera] = None,
    with_backface: bool = False,
) -> GBuffers:
    """Cast primary rays and assemble the full GBuffers pytree."""
    h, w = height, width
    vp = np.asarray(cam.view_proj)
    o, d = primary_rays(cam, h, w)
    n_rays = o.shape[0]

    # --- Opaque pass.
    opaque = scene.opaque()
    t, normal, idx = intersect_scene(opaque, o, d)
    hit = np.isfinite(t)
    hit_p = o + d * np.where(hit, t, 1.0)[..., None]
    raw = np.where(hit, _np_world_to_ndc(vp, hit_p)[..., 2], 0.0).astype(np.float32)
    alb, g1, flags, smooth, emis, _ = _material_arrays(opaque, np.where(hit, idx, -1), n_rays)
    emis = np.where(hit[..., None], emis, np.asarray(scene.sky_color, np.float32))
    normal = np.where(hit[..., None], normal, 0.0)

    def img(a, ch=None):
        shape = (h, w) if ch is None else (h, w, ch)
        return jnp.asarray(a.reshape(shape))

    gb = dict(
        albedo=img(alb, 3),
        material_flags=img(flags.astype(np.uint32)),
        gbuffer1=img(g1, 3),
        normal=img(normal, 3),
        smoothness=img(smooth),
        emission=img(emis, 3),
        depth=img(raw),
    )

    # --- Backface pass (two-sided primitives only; planes have no
    # thickness and must produce the far sentinel, ref PathTracing.hlsl:119-130).
    if with_backface:
        solid = [p for p in scene.primitives if p.two_sided]
        if solid:
            tb, nb, _ = intersect_scene(solid, o, d, backface=True)
            hitb = np.isfinite(tb)
            pb = o + d * np.where(hitb, tb, 1.0)[..., None]
            rawb = np.where(hitb, _np_world_to_ndc(vp, pb)[..., 2], 0.0)
            gb["back_depth"] = img(rawb.astype(np.float32))
            gb["back_normal"] = img(np.where(hitb[..., None], nb, 0.0).astype(np.float32), 3)
        else:
            gb["back_depth"] = img(np.zeros(n_rays, np.float32))
            gb["back_normal"] = img(np.zeros((n_rays, 3), np.float32), 3)

    # --- Transparent pass (refractive primitives).
    refr = scene.refractive()
    if refr:
        tt, nt, it = intersect_scene(refr, o, d)
        hitt = np.isfinite(tt) & (tt < t)  # visible in front of opaque
        t_alb, _, _, t_smooth, _, t_ior = _material_arrays(
            refr, np.where(hitt, it, -1), n_rays
        )
        gb["t_albedo"] = img(np.where(hitt[..., None], t_alb, 0.0), 3)
        gb["t_ior_raw"] = img(
            np.where(hitt, (t_ior - 0.921875) / 2.0, 0.0).astype(np.float32)
        )
        gb["t_surface_type"] = img(
            np.where(hitt, SURFACE_TYPE_REFRACTION, 0).astype(np.uint32)
        )
        gb["t_normal"] = img(np.where(hitt[..., None], nt, 0.0).astype(np.float32), 3)
        gb["t_smoothness"] = img(np.where(hitt, t_smooth, 0.0).astype(np.float32))
        # Layer-1 depth: nearest of opaque/transparent (depth attachment
        # after the transparent depth prepass).
        t1 = np.minimum(t, tt)
        hit1 = np.isfinite(t1)
        p1 = o + d * np.where(hit1, t1, 1.0)[..., None]
        raw1 = np.where(hit1, _np_world_to_ndc(vp, p1)[..., 2], 0.0)
        gb["depth_layer1"] = img(raw1.astype(np.float32))

    # --- Motion vectors (velocity = uv - prev_uv of the same world point).
    if prev_cam is not None:
        prev_vp = np.asarray(prev_cam.view_proj)
        if np.array_equal(prev_vp, vp):
            # Static camera: exactly zero velocity (as engine motion
            # vectors are), not fp32 reprojection noise.
            gb["motion"] = jnp.zeros((h, w, 2), jnp.float32)
            return GBuffers(**gb)
        uv = _np_pixel_uv(h, w).reshape(-1, 2)
        # Sky pixels reproject the far plane.
        pts = np.where(
            hit[..., None],
            hit_p,
            _np_world_from_uv_depth(
                np.asarray(cam.inv_view_proj), uv, np.full(n_rays, 1e-4, np.float32)
            ),
        )
        prev_uv = _np_world_to_ndc(prev_vp, pts)[..., :2]
        gb["motion"] = img((uv - prev_uv).astype(np.float32), 2)

    return GBuffers(**gb)


def box_scene_camera(height: int, width: int, jitter: float = 0.0) -> Camera:
    """Canonical BoxScene viewpoint: inside the open front of the box."""
    return make_camera(
        eye=[0.0 + jitter, 1.8, 6.5],
        target=[0.0, 1.5, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y=np.radians(50.0),
        aspect=width / height,
        near=0.1,
        far=100.0,
    )


def classroom_camera(height: int, width: int, jitter: float = 0.0) -> Camera:
    return make_camera(
        eye=[0.0 + jitter, 1.6, 4.2],
        target=[0.0, 1.2, -2.0],
        up=[0.0, 1.0, 0.0],
        fov_y=np.radians(60.0),
        aspect=width / height,
        near=0.1,
        far=100.0,
    )


def figure_camera(height: int, width: int, jitter: float = 0.0) -> Camera:
    return make_camera(
        eye=[1.6 + jitter, 1.4, 3.0],
        target=[0.0, 1.2, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y=np.radians(45.0),
        aspect=width / height,
        near=0.1,
        far=100.0,
    )


def plane_scene_camera(height: int, width: int) -> Camera:
    return make_camera(
        eye=[0.0, 1.5, 4.0],
        target=[0.0, 0.5, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y=np.radians(60.0),
        aspect=width / height,
        near=0.1,
        far=100.0,
    )


# The reference BoxScene ships 3 baked reflection probes the binder
# re-selects per frame (Assets/Scenes/BoxScene.unity;
# PathTracingSetReflectionProbe.cs:49-83). These positions mirror that
# layout inside the analytic box (x,z in [-3,3], y in [0,4]).
BOX_PROBE_POSITIONS = (
    (-1.5, 2.2, 0.0),
    (1.5, 2.2, 0.0),
    (0.0, 2.0, 1.8),
)


def box_scene_probes(sc=None, camera_position=(0.0, 1.8, 6.5),
                     resolution: int = 32):
    """The flagship BoxScene probe setup (C8/C11 exercised end-to-end,
    VERDICT r3 missing 4): bake the 3 box-projected oct probes at the
    reference layout's positions and bind the closest two to the
    camera, exactly what the C# binder does per frame
    (PathTracingSetReflectionProbe.cs:49-83). ``sc`` defaults to the
    mirror BoxScene."""
    from . import scene as scene_mod
    from .probes import bake_probe, closest_probes

    if sc is None:
        sc = scene_mod.build_box_scene()
    box_min, box_max = (-3.0, 0.0, -3.0), (3.0, 4.0, 3.0)
    probes = [
        bake_probe(sc, p, resolution=resolution, seed=i,
                   box_min=box_min, box_max=box_max)
        for i, p in enumerate(BOX_PROBE_POSITIONS)
    ]
    return closest_probes(probes, BOX_PROBE_POSITIONS, camera_position)
