"""Temporal reprojection tests with analytic two-frame fixtures
(SURVEY.md §4: camera-shift fixture with known motion vectors)."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.config import PTConfig
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops.temporal import TemporalState, temporal_reproject

H = W = 48
CFG = PTConfig()


@pytest.fixture(scope="module")
def static_frames():
    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W, prev_cam=cam)
    return sc, cam, gb


def _spread(cam):
    from unitysspathtracingurp_tpu.camera import pixel_spread_angle_tangent

    return pixel_spread_angle_tangent(np.radians(50.0), W, H)


def test_static_camera_accumulates(static_frames):
    sc, cam, gb = static_frames
    state = TemporalState.create(H, W, cam)
    state = state.replace(history_depth=gb.layer1_depth(), history_emission=gb.emission)
    rng = np.random.default_rng(0)
    count = None
    color = None
    base = np.asarray(gb.albedo) * 0.2
    for i in range(12):
        noisy = jnp.asarray(base + rng.normal(0, 0.08, size=(H, W, 3)).astype(np.float32))
        res = temporal_reproject(
            noisy, gb, cam, state, gb.emission, CFG,
            temporal_intensity=0.93, pixel_spread_angle_tangent=_spread(cam),
        )
        state = state.replace(
            history_color=res.color,
            history_sample=res.sample_count,
            history_depth=gb.layer1_depth(),
            history_emission=gb.emission,
        )
        count, color = res.sample_count, res.color
    nonsky = np.asarray(gb.depth) > 0
    # Sample count saturates at MAX_ACCUM_FRAME_NUM on static pixels.
    assert (np.asarray(count)[nonsky] == CFG.max_accum_frame_num).mean() > 0.9
    # Accumulation denoises: result closer to the clean signal than one frame.
    err = np.abs(np.asarray(color) - base)[nonsky].mean()
    assert err < 0.05


def test_emission_change_rejects_history(static_frames):
    sc, cam, gb = static_frames
    state = TemporalState.create(H, W, cam)
    state = state.replace(
        history_depth=gb.layer1_depth(),
        history_emission=gb.emission,
        history_sample=jnp.full((H, W), 5.0),
        history_color=jnp.full((H, W, 3), 9.0),  # poisoned history
    )
    # Current frame's emission differs strongly -> history must be dropped.
    bright_emission = gb.emission + 3.0
    res = temporal_reproject(
        jnp.zeros((H, W, 3)), gb, cam, state, bright_emission, CFG,
        temporal_intensity=0.93, pixel_spread_angle_tangent=_spread(cam),
    )
    nonsky = np.asarray(gb.depth) > 0
    rough = (1.0 - np.asarray(gb.smoothness)) > 0.5
    sel = nonsky & rough
    assert (np.asarray(res.sample_count)[sel] == 1.0).all()
    assert (np.asarray(res.color)[sel] < 1.0).all()


def test_camera_jump_rejects_offscreen(static_frames):
    sc, cam, gb = static_frames
    # Fake a huge velocity: prev_uv lands off-screen -> reject everywhere.
    gb_moved = gb.replace(motion=jnp.full((H, W, 2), 2.0))
    state = TemporalState.create(H, W, cam)
    state = state.replace(
        history_depth=gb.layer1_depth(),
        history_emission=gb.emission,
        history_sample=jnp.full((H, W), 5.0),
        history_color=jnp.full((H, W, 3), 9.0),
    )
    res = temporal_reproject(
        jnp.zeros((H, W, 3)), gb_moved, cam, state, gb.emission, CFG,
        temporal_intensity=0.93, pixel_spread_angle_tangent=_spread(cam),
    )
    nonsky = np.asarray(gb.depth) > 0
    assert (np.asarray(res.sample_count)[nonsky] == 1.0).all()
    assert (np.asarray(res.color)[nonsky] == 0.0).all()


def test_translating_camera_reprojects(static_frames):
    """Shift the camera; with correct motion vectors the history must be
    accepted for most rough pixels (world-radius test passes)."""
    sc = scene.build_box_scene(with_mirror=False)
    cam_prev = fixtures.box_scene_camera(H, W)
    cam_curr = fixtures.box_scene_camera(H, W, jitter=0.02)
    gb = fixtures.rasterize_gbuffers(sc, cam_curr, H, W, prev_cam=cam_prev)
    prev_gb = fixtures.rasterize_gbuffers(sc, cam_prev, H, W)
    state = TemporalState.create(H, W, cam_prev)
    state = state.replace(
        history_depth=prev_gb.layer1_depth(),
        history_emission=prev_gb.emission,
        history_sample=jnp.full((H, W), 4.0),
        history_color=jnp.full((H, W, 3), 0.5),
    )
    res = temporal_reproject(
        jnp.zeros((H, W, 3)), gb, cam_curr, state, gb.emission, CFG,
        temporal_intensity=0.93, pixel_spread_angle_tangent=_spread(cam_curr),
    )
    nonsky = np.asarray(gb.depth) > 0
    rough = (1.0 - np.asarray(gb.smoothness)) > 0.5
    accepted = np.asarray(res.sample_count)[nonsky & rough] > 1.0
    assert accepted.mean() > 0.6


def test_packed_history_reads_match_unpacked(static_frames):
    """PTConfig.packed_temporal serves the five history reads from one
    (H*W, 8) row table; must reproduce the channel-plane path exactly
    (same texels, same lerp factors, f32 math both ways)."""
    sc, cam, gb = static_frames
    rng = np.random.default_rng(7)
    # Moving camera + rich random history so every branch/read matters.
    cam2 = fixtures.box_scene_camera(H, W, jitter=0.02)
    gb2 = fixtures.rasterize_gbuffers(sc, cam2, H, W, prev_cam=cam)
    state = TemporalState.create(H, W, cam)
    state = state.replace(
        history_color=jnp.asarray(rng.random((H, W, 3), np.float32) * 3.0),
        history_sample=jnp.asarray((rng.random((H, W)) * 9).astype(np.float32)),
        history_depth=gb2.layer1_depth()
        + jnp.asarray(rng.normal(0, 1e-4, (H, W)).astype(np.float32)),
        history_emission=jnp.asarray(rng.random((H, W, 3), np.float32)),
    )
    noisy = jnp.asarray(rng.random((H, W, 3), np.float32))
    kw = dict(
        temporal_intensity=0.93, pixel_spread_angle_tangent=_spread(cam2)
    )
    import dataclasses

    res_u = temporal_reproject(
        noisy, gb2, cam2, state, gb2.emission,
        dataclasses.replace(CFG, packed_temporal=False), **kw
    )
    res_p = temporal_reproject(
        noisy, gb2, cam2, state, gb2.emission,
        dataclasses.replace(CFG, packed_temporal=True), **kw
    )
    np.testing.assert_allclose(
        np.asarray(res_p.color), np.asarray(res_u.color), rtol=0, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(res_p.sample_count), np.asarray(res_u.sample_count)
    )


def test_packed_history_reads_match_bf16(static_frames):
    """Same contract at the bf16 history-dtype axis (SURVEY C15)."""
    sc, cam, gb = static_frames
    rng = np.random.default_rng(11)
    state = TemporalState.create(H, W, cam, dtype=jnp.bfloat16)
    state = state.replace(
        history_color=jnp.asarray(rng.random((H, W, 3), np.float32)).astype(
            jnp.bfloat16
        ),
        history_sample=jnp.asarray((rng.random((H, W)) * 9).astype(np.float32)),
        history_depth=gb.layer1_depth(),
        history_emission=gb.emission.astype(jnp.bfloat16),
    )
    noisy = jnp.asarray(rng.random((H, W, 3), np.float32))
    kw = dict(
        temporal_intensity=0.93, pixel_spread_angle_tangent=_spread(cam)
    )
    import dataclasses

    res_u = temporal_reproject(
        noisy, gb, cam, state, gb.emission,
        dataclasses.replace(CFG, packed_temporal=False), **kw
    )
    res_p = temporal_reproject(
        noisy, gb, cam, state, gb.emission,
        dataclasses.replace(CFG, packed_temporal=True), **kw
    )
    np.testing.assert_allclose(
        np.asarray(res_p.color), np.asarray(res_u.color), rtol=0, atol=1e-6
    )
