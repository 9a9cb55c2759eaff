"""Refraction path tests (config #3): transparent G-buffer decode, the
insideObject state machine, 3-layer depth marching, glass rendering."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.config import PTConfig, PTSettings, ThicknessMode
from unitysspathtracingurp_tpu.gbuffer import hit_surface_from_gbuffer
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame

H = W = 48
CFG = PTConfig(march_unroll=4, use_packed_gbuffer=False)


@pytest.fixture(scope="module")
def glass_box():
    sc = scene.build_box_scene(with_glass=True, with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W, with_backface=True)
    return sc, cam, gb


def _settings():
    return PTSettings(
        maximum_depth=3, samples_per_pixel=1, maximum_steps=24,
        support_refraction=True, accurate_thickness=ThicknessMode.DEPTH_NORMALS,
        dithering=False,
    )


def test_transparent_gbuffer_layers(glass_box):
    _, cam, gb = glass_box
    assert gb.t_surface_type is not None
    glass = np.asarray(gb.t_surface_type) == 2
    assert glass.sum() > 20  # the sphere covers some pixels
    # IOR decode: raw*2 + 0.921875 == 1.45 on glass pixels.
    ior = np.asarray(gb.t_ior_raw) * 2.0 + 0.921875
    assert np.allclose(ior[glass], 1.45, atol=1e-3)
    # Layer-1 depth is nearer (larger reversed-Z) than opaque depth
    # wherever glass covers opaque geometry.
    covered = glass & (np.asarray(gb.depth) > 0)
    assert (
        np.asarray(gb.depth_layer1)[covered] >= np.asarray(gb.depth)[covered] - 1e-6
    ).all()


def test_inside_object_state_machine(glass_box):
    _, cam, gb = glass_box
    settings = _settings()
    variants = settings.variants()
    from unitysspathtracingurp_tpu.camera import pixel_uv

    uv = pixel_uv(H, W)
    glass = np.asarray(gb.t_surface_type) == 2
    # Entering: inside 0 -> 1, refractive surface data.
    s0 = hit_surface_from_gbuffer(gb, uv, jnp.zeros((H, W)), variants, 2)
    assert np.allclose(np.asarray(s0.inside_object)[glass], 1.0)
    assert np.allclose(np.asarray(s0.ior)[glass], 1.45, atol=1e-3)
    assert np.allclose(np.asarray(s0.emission)[glass], 0.0)
    # Normal flips for rays inside (state 1 -> 2).
    s1 = hit_surface_from_gbuffer(gb, uv, jnp.ones((H, W)), variants, 2)
    assert np.allclose(np.asarray(s1.inside_object)[glass], 2.0)
    n0 = np.asarray(s0.normal)[glass]
    n1 = np.asarray(s1.normal)[glass]
    assert np.allclose(n1, -np.asarray(gb.back_normal)[glass], atol=1e-5) or np.allclose(
        n1, -n0, atol=1e-5
    )
    # Exiting state (2) reads the opaque G-buffer: ior == -1.
    s2 = hit_surface_from_gbuffer(gb, uv, jnp.full((H, W), 2.0), variants, 2)
    assert np.allclose(np.asarray(s2.ior)[glass], -1.0)
    assert np.allclose(np.asarray(s2.inside_object)[glass], 2.0)


def test_backface_fixtures(glass_box):
    _, cam, gb = glass_box
    glass = np.asarray(gb.t_surface_type) == 2
    bd = np.asarray(gb.back_depth)
    # The glass sphere has backface depth strictly behind (smaller
    # reversed-Z than) its front depth.
    front = np.asarray(gb.depth_layer1)
    solid = glass & (bd > 0)
    assert solid.sum() > 10
    assert (bd[solid] <= front[solid] + 1e-6).all()
    # Quads (walls) have no backface: far sentinel where only walls.
    walls_only = (~glass) & (np.asarray(gb.depth) > 0)
    # box + sphere backfaces exist somewhere; just check sentinel exists
    assert (bd == 0).any()


def test_glass_renders_and_differs(glass_box):
    sc, cam, gb = glass_box
    settings = _settings()
    variants = settings.variants()
    probes = ProbeSet(probe0=constant_probe([0.1, 0.1, 0.1]))
    img = np.asarray(
        trace_frame(
            gb, cam, probes, settings, CFG, variants, jnp.uint32(33),
            back_depth_enabled=2,
        )
    )
    assert np.isfinite(img).all()
    # Compare with the same scene rendered opaque-only (no glass) at the
    # glass pixels: refraction must change what those pixels show.
    sc2 = scene.build_box_scene(with_glass=False, with_mirror=False)
    gb2 = fixtures.rasterize_gbuffers(sc2, cam, H, W, with_backface=True)
    s2 = PTSettings(
        maximum_depth=3, samples_per_pixel=1, maximum_steps=24, dithering=False
    )
    img2 = np.asarray(
        trace_frame(gb2, cam, probes, s2, CFG, s2.variants(), jnp.uint32(33))
    )
    glass = np.asarray(gb.t_surface_type) == 2
    assert np.abs(img[glass] - img2[glass]).mean() > 0.01
