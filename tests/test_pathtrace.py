"""Tracer behavior tests on small fixtures (fast CPU shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.camera import linear_eye_depth, pixel_uv, world_from_uv_depth
from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
from unitysspathtracingurp_tpu.gbuffer import hit_surface_from_gbuffer
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.models.scene import intersect_scene
from unitysspathtracingurp_tpu.ops import brdf, pathtrace
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
from unitysspathtracingurp_tpu.ops.rng import draw2, make_rng

H = W = 48
CFG = PTConfig(march_unroll=4, use_packed_gbuffer=False)  # small unroll: fast CPU compiles in CI


@pytest.fixture(scope="module")
def box():
    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    return sc, cam, gb


@pytest.fixture(scope="module")
def settings():
    return PTSettings(
        maximum_depth=1, samples_per_pixel=1, maximum_steps=24, dithering=False
    )


def test_march_finds_visible_hits(box, settings):
    sc, cam, gb = box
    variants = settings.variants()
    uv = pixel_uv(H, W)
    raw = gb.depth
    pos = world_from_uv_depth(cam.inv_view_proj, uv, raw)
    view = brdf.normalize(cam.position - pos)
    surf = hit_surface_from_gbuffer(gb, uv, jnp.zeros((H, W)), variants, 0)
    rng = make_rng(H, W, 0)
    u, rng = draw2(rng)
    frame = brdf.get_local_frame(surf.normal)
    l, _, _ = brdf.importance_sample_lambert(u, frame)
    alive = raw > 0
    march = pathtrace.ray_march(
        CFG, settings, variants, gb, cam, pos, l, jnp.zeros((H, W)),
        jnp.zeros((H, W)), view, linear_eye_depth(raw, cam.near, cam.far), alive,
    )
    hit_ss = np.asarray(march.hit) & np.asarray(alive)
    # The march must find a solid share of rays (>30% of lanes in a
    # closed box) and its hit positions must project back inside screen.
    assert hit_ss.mean() > 0.3
    huv = np.asarray(march.uv)[hit_ss]
    assert (huv > 0).all() and (huv < 1).all()
    d = np.asarray(march.distance)[hit_ss]
    assert (d > 0).all() and (d < 20).all()


def test_trace_deterministic_and_seed_sensitive(box, settings):
    _, cam, gb = box
    variants = settings.variants()
    probes = ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0]))
    f = jax.jit(
        lambda fi: pathtrace.trace_frame(
            gb, cam, probes, settings, CFG, variants, fi
        )
    )
    a = np.asarray(f(jnp.uint32(0)))
    b = np.asarray(f(jnp.uint32(0)))
    c = np.asarray(f(jnp.uint32(33)))
    assert np.array_equal(a, b)  # same seed -> identical frame
    assert not np.array_equal(a, c)  # different seed -> different noise


def test_sky_passthrough_and_primary_emission(box, settings):
    _, cam, gb = box
    variants = settings.variants()
    probes = ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0]))
    img = np.asarray(
        pathtrace.trace_frame(gb, cam, probes, settings, CFG, variants, jnp.uint32(0))
    )
    sky = np.asarray(gb.depth) == 0.0
    emis = np.asarray(gb.emission)
    # Sky pixels keep camera color (the discard analog).
    assert np.allclose(img[sky], emis[sky])
    # Pixels seeing the area light include its emission.
    lit = emis.max(-1) > 1.0
    assert (img[lit].max(-1) >= 5.0).all()


def test_env_probe_lights_misses(box, settings):
    _, cam, gb = box
    variants = settings.variants()
    dark = np.asarray(
        pathtrace.trace_frame(
            gb, cam, ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0])),
            settings, CFG, variants, jnp.uint32(66),
        )
    )
    bright = np.asarray(
        pathtrace.trace_frame(
            gb, cam, ProbeSet(probe0=constant_probe([2.0, 2.0, 2.0])),
            settings, CFG, variants, jnp.uint32(66),
        )
    )
    nonsky = np.asarray(gb.depth) > 0
    # A bright environment must add light through ray misses.
    assert bright[nonsky].mean() > dark[nonsky].mean() + 0.05


def test_tiled_trace_matches_full(box, settings):
    """Row-block tracing over the replicated G-buffer is bit-identical to
    the full-frame trace (the multi-chip tile-sharding invariant)."""
    _, cam, gb = box
    variants = settings.variants()
    probes = ProbeSet(probe0=constant_probe([0.1, 0.1, 0.1]))
    full = np.asarray(
        pathtrace.trace_frame(gb, cam, probes, settings, CFG, variants, jnp.uint32(33))
    )
    blocks = [
        np.asarray(
            pathtrace.trace_frame(
                gb, cam, probes, settings, CFG, variants, jnp.uint32(33),
                row0=r0, lane_height=H // 4,
            )
        )
        for r0 in range(0, H, H // 4)
    ]
    tiled = np.concatenate(blocks, axis=0)
    # Identical math; XLA fuses the two paths differently so results can
    # differ by float ulps.
    assert np.allclose(full, tiled, atol=1e-6)


def test_spp_vmap_reduces_noise(box):
    """samples_per_pixel > 1 runs the vmapped sample axis: finite output,
    consistent mean, lower noise vs a single-sample frame."""
    _, cam, gb = box
    probes = ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0]))
    ref_settings = PTSettings(
        maximum_depth=1, samples_per_pixel=1, maximum_steps=24, dithering=False
    )
    variants = ref_settings.variants()
    ref = np.mean(
        [
            np.asarray(
                pathtrace.trace_frame(
                    gb, cam, probes, ref_settings, CFG, variants, jnp.uint32(33 * i)
                )
            )
            for i in range(12)
        ],
        axis=0,
    )
    outs = {}
    for spp in (1, 4):
        s = PTSettings(
            maximum_depth=1, samples_per_pixel=spp, maximum_steps=24, dithering=False
        )
        outs[spp] = np.asarray(
            pathtrace.trace_frame(gb, cam, probes, s, CFG, s.variants(), jnp.uint32(33))
        )
    assert np.isfinite(outs[4]).all()
    mask = np.asarray(gb.depth) > 0
    assert abs(outs[4][mask].mean() - ref[mask].mean()) < 0.05
    e1 = np.abs(outs[1] - ref)[mask].mean()
    e4 = np.abs(outs[4] - ref)[mask].mean()
    assert e4 < e1


def test_firefly_clamp(box):
    _, cam, gb = box
    settings = PTSettings(
        maximum_depth=1, samples_per_pixel=1, maximum_steps=16,
        maximum_intensity=0.5, dithering=False,
    )
    variants = settings.variants()
    probes = ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0]))
    img = np.asarray(
        pathtrace.trace_frame(gb, cam, probes, settings, CFG, variants, jnp.uint32(0))
    )
    nonsky = np.asarray(gb.depth) > 0
    # HSV value clamp bounds every non-sky pixel's max channel.
    assert img[nonsky].max() <= 0.5 + 1e-3
