"""Tests for blue-noise tables, metrics, upscale, probe baking."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.ops import blue_noise, rng as rng_mod
from unitysspathtracingurp_tpu.ops.upscale import (
    bilinear_upscale,
    easu_like_upscale,
    rcas_sharpen,
)
from unitysspathtracingurp_tpu.utils.metrics import (
    frames_to_converge,
    mrays_per_sec,
    relative_rmse,
    rmse,
)


@pytest.fixture(scope="module")
def tables():
    # Small cache under /tmp to keep the repo clean during tests.
    return blue_noise.generate_tables(cache_path="/tmp/bn_tables_test.npz")


def test_blue_noise_tables_shapes_and_ranges(tables):
    assert tables["sobol"].shape == (256, 256)
    assert tables["ranking"].shape == (128 * 128 * 8,)
    assert tables["scrambling"].shape == (128 * 128 * 8,)
    for k in ("sobol", "ranking", "scrambling"):
        assert tables[k].min() >= 0 and tables[k].max() <= 255


def test_blue_noise_sequence_uniformity(tables):
    # Each dimension's 256 values should cover [0,256) near-uniformly.
    sob = tables["sobol"]
    for d in (0, 17, 255):
        vals = np.sort(sob[:, d])
        # Owen-scrambled radical inverse is a (0,1)-sequence: stratified.
        assert len(np.unique(vals)) > 200
        assert abs(vals.mean() - 127.5) < 12


def test_blue_noise_draw_path(tables):
    bt = blue_noise.BlueNoiseTables(tables)
    r = rng_mod.make_rng(16, 16, frame_index=0, tables=bt)
    v1, r = rng_mod.draw(r)
    v2, r = rng_mod.draw(r)
    a, b = np.asarray(v1), np.asarray(v2)
    assert ((a >= 0) & (a < 1)).all()
    assert not np.array_equal(a, b)
    # Different pixels draw different values.
    assert len(np.unique(a)) > 50


def test_metrics():
    a = np.zeros((4, 4, 3))
    b = np.ones((4, 4, 3)) * 0.5
    assert abs(rmse(a, b) - 0.5) < 1e-9
    assert abs(relative_rmse(a, b) - 1.0) < 1e-9
    # 1 Mray in 1 ms = 1000 Mrays/s.
    assert abs(mrays_per_sec(1000, 1000, 1, 1, 1e-3) - 1000) < 1e-6
    frames = [b * 0.9, b * 0.99, b * 0.999]
    assert frames_to_converge(frames, b, threshold=0.02) == 2


def test_bilinear_upscale_constant_and_shape():
    img = jnp.full((8, 8, 3), 0.37)
    up = np.asarray(bilinear_upscale(img, 16, 24))
    assert up.shape == (16, 24, 3)
    assert np.allclose(up, 0.37, atol=1e-6)


def test_rcas_preserves_flat_and_sharpens_edges():
    flat = jnp.full((16, 16, 3), 0.5)
    out = np.asarray(rcas_sharpen(flat))
    assert np.allclose(out, 0.5, atol=1e-4)
    # An edge gets higher local contrast after sharpening.
    edge = jnp.concatenate(
        [jnp.full((16, 8, 3), 0.25), jnp.full((16, 8, 3), 0.75)], axis=1
    )
    sharp = np.asarray(rcas_sharpen(edge, 0.8))
    grad_in = np.abs(np.diff(np.asarray(edge)[8, :, 0]))
    grad_out = np.abs(np.diff(sharp[8, :, 0]))
    assert grad_out.max() >= grad_in.max() - 1e-6
    assert np.isfinite(sharp).all()


def test_easu_like_upscale_runs():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    up = np.asarray(easu_like_upscale(img, 64, 64))
    assert up.shape == (64, 64, 3)
    assert np.isfinite(up).all()


@pytest.mark.slow
def test_probe_bake_and_selection():
    from unitysspathtracingurp_tpu.models import probes as probes_mod
    from unitysspathtracingurp_tpu.models import scene as scene_mod
    from unitysspathtracingurp_tpu.ops.envprobe import sample_reflection_probes

    sc = scene_mod.build_box_scene(with_mirror=False)
    p0 = probes_mod.bake_probe(sc, (0.0, 2.0, 0.0), resolution=32, bounce_samples=4)
    p1 = probes_mod.bake_probe(sc, (0.0, 2.0, 4.0), resolution=32, bounce_samples=4)
    ps = probes_mod.closest_probes([p0, p1], [(0, 2, 0), (0, 2, 4)], (0, 1.8, 6.5))
    # The closest probe (index 1) must be bound first.
    assert np.allclose(np.asarray(ps.probe0.position), [0, 2, 4])
    # Upward direction from inside the box sees the bright ceiling light.
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    pos = jnp.asarray([[0.0, 1.0, 0.0]])
    c_up = np.asarray(sample_reflection_probes(ps, up, pos))
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    c_down = np.asarray(sample_reflection_probes(ps, down, pos))
    assert c_up.mean() > c_down.mean()
