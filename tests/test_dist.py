"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops.accumulate import OfflineAccumState
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame
from unitysspathtracingurp_tpu.parallel.dist import (
    make_mesh,
    render_step_sharded,
    trace_frame_sharded,
)

H, W = 32, 32
CFG = PTConfig(march_unroll=4, use_packed_gbuffer=False)
SETTINGS = PTSettings(
    maximum_depth=1, samples_per_pixel=1, maximum_steps=16, dithering=False
)


@pytest.fixture(scope="module")
def inputs():
    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.1, 0.1, 0.1]))
    return gb, cam, probes


def test_tile_sharding_matches_single_device(inputs):
    """Pure tile sharding (n_spp=1) must be bit-identical to the
    unsharded trace — same seeds, same math, just row-partitioned."""
    gb, cam, probes = inputs
    mesh = make_mesh(n_spp=1, n_tile=4)
    variants = SETTINGS.variants()
    sharded = np.asarray(
        trace_frame_sharded(
            mesh, gb, cam, probes, SETTINGS, CFG, variants, jnp.uint32(0), H
        )
    )
    single = np.asarray(
        trace_frame(gb, cam, probes, SETTINGS, CFG, variants, jnp.uint32(0))
    )
    assert np.allclose(sharded, single, atol=1e-6)  # ulp-level fusion diffs


def test_spp_sharding_is_mean_of_seeds(inputs):
    """SPP sharding over the mesh == numpy mean of the per-seed frames."""
    gb, cam, probes = inputs
    mesh = make_mesh(n_spp=4, n_tile=2)
    variants = SETTINGS.variants()
    sharded = np.asarray(
        trace_frame_sharded(
            mesh, gb, cam, probes, SETTINGS, CFG, variants, jnp.uint32(5), H
        )
    )
    singles = [
        np.asarray(
            trace_frame(
                gb, cam, probes, SETTINGS, CFG, variants,
                jnp.uint32(5 + 7919 * k),
            )
        )
        for k in range(4)
    ]
    assert np.allclose(sharded, np.mean(singles, axis=0), atol=1e-6)


def test_renderer_with_mesh(inputs):
    """Renderer(mesh=...) drives offline frames through the sharded step
    and matches the single-device renderer's accumulation statistics."""
    from unitysspathtracingurp_tpu.config import DenoiserType
    from unitysspathtracingurp_tpu.models.renderer import Renderer

    gb, cam, probes = inputs
    import dataclasses

    settings = dataclasses.replace(
        SETTINGS, denoiser=DenoiserType.OFFLINE, progress_bar=False
    )
    mesh = make_mesh(n_spp=2, n_tile=4)
    r_mesh = Renderer(settings, H, W, cfg=CFG, probes=probes, mesh=mesh)
    r_single = Renderer(settings, H, W, cfg=CFG, probes=probes)
    for _ in range(4):
        img_m = np.asarray(r_mesh.render_frame(gb, cam))
        img_s = np.asarray(r_single.render_frame(gb, cam))
    assert r_mesh.sample == r_single.sample == 4
    assert np.isfinite(img_m).all()
    # Same scene, 2x the samples on the mesh: statistics agree closely.
    mask = np.asarray(gb.depth) > 0
    assert abs(img_m[mask].mean() - img_s[mask].mean()) < 0.05


def test_render_step_sharded_accumulates(inputs):
    gb, cam, probes = inputs
    mesh = make_mesh(n_spp=2, n_tile=4)
    variants = SETTINGS.variants()
    accum = OfflineAccumState.create(H, W)
    step = jax.jit(
        lambda gb, cam, probes, accum, fi: render_step_sharded(
            mesh, gb, cam, probes, accum, SETTINGS, CFG, variants, fi, 64
        )
    )
    for i in range(3):
        frame, accum = step(gb, cam, probes, accum, jnp.uint32(33 * i))
    assert int(accum.sample) == 3
    a = np.asarray(accum.accum)
    assert np.isfinite(a).all() and a.max() > 0
