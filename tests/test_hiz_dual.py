"""Parity gates for the hiz march on the refraction / backface
variants (DualDepthTiles; VERDICT r2 item 3).

The parity tracer (ops/pathtrace.ray_march) is the oracle, exactly as
tests/test_hiz.py gates the plain variant. The dual path reuses the
same wavefront (schedule/filter/pack/resolve) with per-combo
dual-layer tables (reference rules PathTracing.hlsl:79-98, 111-136,
138-163, 168-190).

Calibration note (measured round 3, scripts/diag_dual.py): this glass
BoxScene direction-field fixture is much harder than the plain-box one
test_hiz.py uses — the glass sphere adds silhouette discontinuities
where the reference's binary search oscillates without converging,
while the hiz budget emulation accepts the crossing (the documented
search-emulation deviation class). The *plain* hiz path scores 96.4%
hit-mask agreement on this same fixture (vs 98%+ on the plain box), so
the dual gates are anchored to that control: for refraction-only
inside==0 the parity semantics coincide with the plain variant, and
the dual path must match the plain path's agreement level — proving
the dual tables/rules add no deviation beyond the known classes. Lanes
that can never run the binary search (front rays, refraction-only)
are gated much tighter.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.camera import (
    linear_eye_depth,
    pixel_uv,
    world_from_uv_depth,
)
from unitysspathtracingurp_tpu.config import PTConfig, PTSettings, ThicknessMode
from unitysspathtracingurp_tpu.gbuffer import uv_to_pixel
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops import pathtrace, pathtrace_hiz
from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
from unitysspathtracingurp_tpu.ops.pathtrace_hiz import build_tiles_for

H = W = 192
CFG = PTConfig()


@pytest.fixture(scope="module")
def glass_box():
    sc = scene.build_box_scene(with_glass=True, with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W, with_backface=True)
    return sc, cam, gb


def _settings(refraction: bool, backface: bool):
    return PTSettings(
        maximum_depth=2,
        samples_per_pixel=1,
        maximum_steps=24,
        support_refraction=refraction,
        accurate_thickness=(
            ThicknessMode.DEPTH_NORMALS if backface else ThicknessMode.CONSTANT
        ),
        dithering=False,
    )


def _march_inputs(gb, cam, inside_val=0.0):
    uv = pixel_uv(H, W)
    depth = gb.depth
    pos_ws = world_from_uv_depth(cam.inv_view_proj, uv, depth)
    view_dir = pos_ws - cam.position
    view_dir = view_dir / jnp.linalg.norm(view_dir, axis=-1, keepdims=True)
    n = gb.normal
    refl = view_dir - 2.0 * jnp.sum(view_dir * n, -1, keepdims=True) * n
    tilt = jnp.stack(
        [
            jnp.cos(uv[..., 0] * 7.0),
            jnp.sin(uv[..., 1] * 5.0),
            jnp.cos(uv[..., 0] * 3.0),
        ],
        -1,
    )
    d = refl + 0.3 * tilt
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    alive = depth != 0.0
    origin = pos_ws + n * 1e-4
    scene_dist = linear_eye_depth(depth, cam.near, cam.far)
    inside = jnp.full((H, W), inside_val, jnp.float32)
    return origin, d, alive, view_dir, scene_dist, inside


def _run_march(gb, cam, settings, variants, inside_val, tiles):
    origin, d, alive, view_dir, scene_dist, inside = _march_inputs(
        gb, cam, inside_val
    )
    zero = jnp.zeros((H, W), jnp.float32)
    ref = pathtrace.ray_march(
        CFG, settings, variants, gb, cam, origin, d, inside, zero,
        -view_dir, scene_dist, alive,
    )
    fast = pathtrace_hiz.ray_march_hiz(
        CFG, settings, variants, gb, cam, origin, d, inside, zero,
        -view_dir, scene_dist, alive, tiles=tiles, n_rounds=10,
    )
    # Kernel convention: the march receives -view_dir, so a "back ray"
    # (binary-search-capable, hlsl:138-163) is dot(d, -view_dir) > 0.
    kback = np.asarray(jnp.sum(d * (-view_dir), -1) > 0.0)
    return ref, fast, np.asarray(alive), kback


@pytest.fixture(scope="module")
def plain_control(glass_box):
    """The plain hiz path on the refraction-only inside==0 inputs.
    Parity semantics coincide there (device_depth = layer1, no back
    layer, front rays never search), so this calibrates the fixture's
    intrinsic hardness for the known plain-path deviation classes."""
    _, cam, gb = glass_box
    rsettings = _settings(True, False)
    psettings = _settings(False, False)
    tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
    ref, fast, alive, kback = _run_march(
        gb, cam, psettings, psettings.variants(), 0.0, tiles
    )
    # Oracle under the *refraction* variants (identical result to the
    # plain oracle for inside==0; re-run under refraction variants so
    # the anchor compares like to like).
    origin, d, _, view_dir, scene_dist, inside = _march_inputs(gb, cam, 0.0)
    zero = jnp.zeros((H, W), jnp.float32)
    ref_r = pathtrace.ray_march(
        CFG, rsettings, rsettings.variants(), gb, cam, origin, d, inside,
        zero, -view_dir, scene_dist, jnp.asarray(alive),
    )
    agree = (np.asarray(ref_r.hit) == np.asarray(fast.hit))[alive].mean()
    return agree


# Absolute floors: measured agreement (scripts/diag_dual.py, round 3)
# minus ~1% margin. inside==1 marches the backface layer where almost
# no silhouette search cases exist, hence the much tighter floor.
_FLOORS = {
    (True, False, 0.0): 0.95,   # measured 0.9635
    (True, False, 2.0): 0.94,   # measured 0.9528 (every lane searches)
    (False, True, 0.0): 0.945,  # measured 0.9576
    (True, True, 0.0): 0.945,   # measured 0.9576
    (True, True, 1.0): 0.99,    # measured 0.9979
}


@pytest.mark.parametrize(
    "refraction,backface,inside_val",
    sorted(_FLOORS),
)
def test_dual_march_parity(glass_box, plain_control, refraction, backface,
                           inside_val):
    """Hit masks / hit pixels of the dual wavefront march match the
    parity march on the glass box for every layer-combo state, at the
    plain-path-calibrated deviation level."""
    _, cam, gb = glass_box
    settings = _settings(refraction, backface)
    variants = settings.variants()
    tiles = build_tiles_for(gb, cam, variants)
    ref, fast, alive, kback = _run_march(
        gb, cam, settings, variants, inside_val, tiles
    )
    ref_hit = np.asarray(ref.hit)
    fast_hit = np.asarray(fast.hit)
    same = ref_hit == fast_hit
    agree = same[alive].mean()
    assert agree >= _FLOORS[(refraction, backface, inside_val)], (
        f"hit-mask agreement {agree:.4f}"
    )

    if (refraction, backface, inside_val) == (True, False, 0.0):
        # Anchor: no added deviation beyond the plain path on the same
        # inputs (parity semantics coincide for this combo).
        assert agree >= plain_control - 0.005, (
            f"dual {agree:.4f} vs plain control {plain_control:.4f}"
        )
        # Lanes that can never run the binary search (front rays;
        # refraction-only zeroes sceneBackDepth, hlsl:149-156) carry
        # only the f16/interpolation deviation classes: near-exact.
        front_agree = same[alive & ~kback].mean()
        assert front_agree >= 0.985, f"front-lane agreement {front_agree:.4f}"

    both = ref_hit & fast_hit
    ry, rx = uv_to_pixel(ref.uv, gb.height, gb.width)
    fy, fx = uv_to_pixel(fast.uv, gb.height, gb.width)
    pix_same = (np.asarray(ry) == np.asarray(fy)) & (
        np.asarray(rx) == np.asarray(fx)
    )
    assert pix_same[both].mean() >= 0.93, (
        f"hit-pixel agreement {pix_same[both].mean():.4f}"
    )
    # Back-hit classification feeds the normal flip downstream.
    bh_same = (np.asarray(ref.is_back_hit) == np.asarray(fast.is_back_hit))
    assert bh_same[both].mean() >= 0.95, (
        f"back-hit agreement {bh_same[both].mean():.4f}"
    )

    dist_err = np.abs(np.asarray(ref.distance) - np.asarray(fast.distance))
    assert np.median(dist_err[both]) < 2e-3


@pytest.mark.parametrize(
    "refraction,backface",
    [(True, False), (False, True), (True, True)],
)
def test_dual_trace_frame_radiance(glass_box, refraction, backface):
    """End-to-end pass-0: identical RNG/BRDF streams mean single-frame
    differences come only from march deviations; the complement of the
    deviating-lane fraction must be bit-identical (same recipe as
    test_hiz.py's single-frame gate)."""
    _, cam, gb = glass_box
    settings = _settings(refraction, backface)
    variants = settings.variants()
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    bde = int(settings.accurate_thickness.value)

    r = np.asarray(
        pathtrace.trace_frame(
            gb, cam, probes, settings, CFG, variants, jnp.uint32(33),
            back_depth_enabled=bde,
        )
    )
    f = np.asarray(
        pathtrace_hiz.trace_frame_hiz(
            gb, cam, probes, settings, CFG, variants, jnp.uint32(33),
            back_depth_enabled=bde, n_rounds=10,
        )
    )
    lane_same = (np.abs(r - f).max(axis=-1) < 1e-4).mean()
    assert lane_same >= 0.80, f"identical-lane fraction {lane_same:.4f}"


def test_dual_converged_equivalence(glass_box):
    """Multi-frame averages of the dual hiz and parity tracers converge
    to the same image (march deviations unbiased at the image level):
    4x4-pooled rel RMSE of 6-frame averages on the full 3-layer config,
    same recipe as test_hiz_converged_equivalence."""
    _, cam, gb = glass_box
    settings = _settings(True, True)
    variants = settings.variants()
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    bde = int(settings.accurate_thickness.value)
    n = 6
    accr = np.zeros((H, W, 3))
    accf = np.zeros((H, W, 3))
    for i in range(n):
        fi = jnp.uint32((33 * (i + 1)) % 64000)
        accr += np.asarray(pathtrace.trace_frame(
            gb, cam, probes, settings, CFG, variants, fi,
            back_depth_enabled=bde))
        accf += np.asarray(pathtrace_hiz.trace_frame_hiz(
            gb, cam, probes, settings, CFG, variants, fi,
            back_depth_enabled=bde, n_rounds=10))
    accr /= n
    accf /= n
    pr = accr.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    pf = accf.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    rel = np.sqrt(((pr - pf) ** 2).mean()) / np.sqrt((pr ** 2).mean())
    assert rel < 0.08, f"pooled converged rel RMSE {rel:.4f}"
    mshift = abs(accr.mean() - accf.mean()) / max(accr.mean(), 1e-9)
    assert mshift < 0.04, f"mean radiance shift {mshift:.4f}"


def test_dual_tiles_shapes(glass_box):
    """DualDepthTiles combo layout invariants."""
    _, cam, gb = glass_box
    v3 = _settings(True, True).variants()
    t3 = build_tiles_for(gb, cam, v3)
    assert t3.n_combos == 3
    assert t3.tile_table.shape[0] == 3 * t3.tiles_per_combo
    assert t3.mini_table.shape[0] == 3 * t3.chunks_per_combo
    assert t3.bmax_table.shape == t3.mini_table.shape

    v2 = _settings(True, False).variants()
    t2 = build_tiles_for(gb, cam, v2)
    assert t2.n_combos == 2

    v1 = _settings(False, True).variants()
    t1 = build_tiles_for(gb, cam, v1)
    assert t1.n_combos == 1
