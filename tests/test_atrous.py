import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.config import PTConfig
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops.atrous import atrous_filter

H = W = 48
CFG = PTConfig()


@pytest.fixture(scope="module")
def gb():
    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    return fixtures.rasterize_gbuffers(sc, cam, H, W)


def test_smooths_noise_on_flat_regions(gb):
    rng = np.random.default_rng(0)
    base = np.asarray(gb.albedo) * 0.3
    noisy = jnp.asarray(base + rng.normal(0, 0.05, (H, W, 3)).astype(np.float32))
    out = np.asarray(
        atrous_filter(noisy, gb, gb.emission, jnp.zeros((H, W)), CFG)
    )
    nonsky = np.asarray(gb.depth) > 0
    err_in = np.abs(np.asarray(noisy) - base)[nonsky].mean()
    err_out = np.abs(out - base)[nonsky].mean()
    assert err_out < err_in * 0.8


def test_converged_pixels_pass_through(gb):
    """The reference's blur gate: blurAmount = 1 - sat(min(n/8,8) - 1/8)
    (shader:493). At the temporal clamp n=8 it is 0.125 (remapped 0.414)
    — the discard at :494-495 only fires for n >= 9, which the temporal
    pass never produces. We reproduce both behaviors."""
    noisy = jnp.asarray(
        np.random.default_rng(1).uniform(size=(H, W, 3)).astype(np.float32)
    )
    # n = 9: true passthrough (the dead-code discard branch).
    out9 = np.asarray(atrous_filter(noisy, gb, gb.emission, jnp.full((H, W), 9.0), CFG))
    assert np.allclose(out9, np.asarray(noisy))
    # n = 8 (temporal steady state): residual blur, bounded by the 0.414
    # remapped amount.
    out8 = np.asarray(atrous_filter(noisy, gb, gb.emission, jnp.full((H, W), 8.0), CFG))
    nonsky = np.asarray(gb.depth) > 0
    delta = np.abs(out8 - np.asarray(noisy)).max(-1)[nonsky]
    assert delta.max() > 0  # it does blur a little
    assert np.median(delta) < 0.45  # but only the remapped fraction


def test_sky_passes_through(gb):
    noisy = jnp.asarray(
        np.random.default_rng(2).uniform(size=(H, W, 3)).astype(np.float32)
    )
    out = np.asarray(atrous_filter(noisy, gb, gb.emission, jnp.zeros((H, W)), CFG))
    sky = np.asarray(gb.depth) == 0.0
    assert np.allclose(out[sky], np.asarray(noisy)[sky])


def test_edges_limit_bleeding(gb):
    """A strong signal discontinuity aligned with a G-buffer edge (albedo/
    normal change) must survive filtering better than one on a flat
    region (the joint-bilateral property)."""
    alb = np.asarray(gb.albedo)
    # Signal = albedo-dependent: edge at material boundaries.
    signal = jnp.asarray((alb * [1.0, 0.2, 0.2]).astype(np.float32))
    out = np.asarray(atrous_filter(signal, gb, gb.emission, jnp.zeros((H, W)), CFG))
    # Red wall pixels keep strongly red output.
    red_mask = (alb[..., 0] > 0.5) & (alb[..., 1] < 0.2)
    if red_mask.sum() > 10:
        assert (out[red_mask][:, 0] > 2.0 * out[red_mask][:, 1]).mean() > 0.9
