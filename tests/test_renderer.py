import os

import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.config import (
    DenoiserType,
    PTConfig,
    PTSettings,
    SpatialDenoiseQuality,
)
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.models.renderer import Renderer
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe

H = W = 48
CFG = PTConfig(march_unroll=4, use_packed_gbuffer=False)


@pytest.fixture(scope="module")
def box():
    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W, prev_cam=cam)
    return sc, cam, gb


def _settings(denoiser):
    # 24 steps: with only 16 the march never leaves the medium tier
    # (6x0.005 + 12x0.1 ~ 1 m reach) and frames are nearly noise-free,
    # which starves the convergence assertions below of signal.
    return PTSettings(
        maximum_depth=1, samples_per_pixel=1, maximum_steps=24,
        denoiser=denoiser, dithering=False, progress_bar=False,
        maximum_samples=64,
    )


def test_offline_mode_converges_and_stops(box):
    _, cam, gb = box
    r = Renderer(_settings(DenoiserType.OFFLINE), H, W, cfg=CFG)
    imgs = [np.asarray(r.render_frame(gb, cam)) for _ in range(6)]
    assert r.sample == 6
    # Variance decreases with accumulation: frame-to-frame delta shrinks.
    d_early = np.abs(imgs[1] - imgs[0]).mean()
    d_late = np.abs(imgs[5] - imgs[4]).mean()
    assert d_late < d_early


def test_offline_invalidation_on_camera_move(box):
    sc, cam, gb = box
    r = Renderer(_settings(DenoiserType.OFFLINE), H, W, cfg=CFG)
    for _ in range(3):
        r.render_frame(gb, cam)
    assert r.sample == 3
    cam2 = fixtures.box_scene_camera(H, W, jitter=0.1)
    gb2 = fixtures.rasterize_gbuffers(sc, cam2, H, W)
    r.render_frame(gb2, cam2)
    assert r.sample == 1  # restarted


def test_scene_key_invalidation(box):
    _, cam, gb = box
    r = Renderer(_settings(DenoiserType.OFFLINE), H, W, cfg=CFG)
    r.render_frame(gb, cam, scene_key="a")
    r.render_frame(gb, cam, scene_key="a")
    assert r.sample == 2
    r.render_frame(gb, cam, scene_key="b")  # light setup changed
    assert r.sample == 1


def test_realtime_modes_run(box):
    _, cam, gb = box
    import dataclasses

    for mode in (DenoiserType.TEMPORAL, DenoiserType.SPATIAL_TEMPORAL):
        s = dataclasses.replace(
            _settings(mode), spatial_denoise_quality=SpatialDenoiseQuality.LOW
        )
        r = Renderer(s, H, W, cfg=CFG)
        out = None
        for _ in range(3):
            out = np.asarray(r.render_frame(gb, cam))
        assert out.shape == (H, W, 3)
        assert np.isfinite(out).all()
        assert out.max() > 0


def test_checkpoint_roundtrip(box, tmp_path):
    _, cam, gb = box
    r = Renderer(_settings(DenoiserType.OFFLINE), H, W, cfg=CFG)
    for _ in range(4):
        r.render_frame(gb, cam)
    path = os.path.join(tmp_path, "ckpt.npz")
    r.save(path)

    r2 = Renderer(_settings(DenoiserType.OFFLINE), H, W, cfg=CFG)
    r2.load(path)
    assert r2.sample == r.sample
    assert r2.frame_index == r.frame_index
    # Resumed run matches continued run exactly.
    a = np.asarray(r.render_frame(gb, cam))
    b = np.asarray(r2.render_frame(gb, cam))
    assert np.array_equal(a, b)


def test_disabled_state_passthrough(box):
    _, cam, gb = box
    s = PTSettings(state=False)
    r = Renderer(s, H, W, cfg=CFG)
    out = r.render_frame(gb, cam)
    assert np.allclose(np.asarray(out), np.asarray(gb.emission))
