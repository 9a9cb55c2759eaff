"""Home-prefix resolve (ops/fused_schedule.py home mode) vs the plain
fused pipeline.

The prefix is ORDER-EXACT by construction: the kernel exact-tests the
leading run of in-strip candidates with the resolve rounds' own hit
rule (same re-derived position, same quantized metadata, same f16
depth bits), a prefix hit zeroes the packed list (everything packed is
posterior), and the first non-routed candidate ends the prefix — so
with a round budget that covers every candidate the march outcome must
match the non-prefixed march.

CI shapes are deliberately tiny with few, large march steps: the
interpret-mode XLA:CPU compile of the schedule kernel is superlinear
in the unrolled body (the r5 in-loop formulation took >14 min at 24
steps; even the slot form needs small s_max on the 1-core CI box).
The full-size configuration is exercised on TPU (bench.py BENCH_HOME
A/B + scripts/quality_headline.py, which runs the shipped config).
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
from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops import pathtrace_hiz
from unitysspathtracingurp_tpu.ops.depth_tiles import (
    build_depth_tiles,
    build_home_strips,
)

H, W = 16, 128
# Few, large steps: candidates must appear within the tiny unroll.
CFG_KW = dict(max_small_step=2, max_medium_step=4, small_step_size=0.05,
              medium_step_size=0.3)
STEPS = 8


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


def _march_pair(cfg_home, dither_amt=0.0):
    gb, cam, origin, d, alive, view_dir, scene_dist = _march_inputs()
    settings = PTSettings(
        maximum_depth=1, maximum_steps=STEPS,
        dithering=dither_amt != 0.0,
    )
    variants = settings.variants()
    tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
    sh = origin.shape[:2]
    zero = jnp.zeros(sh, jnp.float32)
    dith = jnp.full(sh, dither_amt, jnp.float32)
    args = (gb, cam, origin, d, zero, dith, -view_dir, scene_dist, alive)

    def run(cfg, home_ok):
        return pathtrace_hiz.ray_march_hiz(
            cfg, settings, variants, *args, tiles=tiles, n_rounds=8,
            home_ok=home_ok,
        )

    base = PTConfig(fused_schedule=True, hiz_home_prefix=False, **CFG_KW)
    return run(cfg_home, True), run(base, False)


def _assert_march_equal(fast, slow, min_hits=50):
    f_hit = np.asarray(fast.hit)
    s_hit = np.asarray(slow.hit)
    # The fixture must actually exercise hits or the gate is vacuous.
    assert s_hit.sum() >= min_hits, f"only {s_hit.sum()} hits in fixture"
    agree = (f_hit == s_hit).mean()
    assert agree >= 0.999, f"home-vs-plain hit agreement {agree:.5f}"
    both = f_hit & s_hit
    dd = np.abs(np.asarray(fast.distance) - np.asarray(slow.distance))[both]
    assert np.quantile(dd, 0.999) < 1e-4, np.quantile(dd, 0.999)
    uv_same = (
        np.abs(np.asarray(fast.uv) - np.asarray(slow.uv)).max(-1)[both] < 1e-6
    )
    assert uv_same.mean() >= 0.999, f"uv agreement {uv_same.mean():.5f}"


def test_home_prefix_march_equal():
    cfg = PTConfig(fused_schedule=True, hiz_home_prefix=True, **CFG_KW)
    home, plain = _march_pair(cfg)
    _assert_march_equal(home, plain)


def test_home_prefix_march_equal_dithered():
    cfg = PTConfig(fused_schedule=True, hiz_home_prefix=True, **CFG_KW)
    home, plain = _march_pair(cfg, dither_amt=0.07)
    _assert_march_equal(home, plain)


def test_home_prefix_round_cap_equal():
    """Compacted-from-round-1 resolve (hiz_home_round_cap) reproduces
    the dense home-prefixed march when the cap fits every unresolved
    lane."""
    capped = PTConfig(
        fused_schedule=True, hiz_home_prefix=True, hiz_home_round_cap=1.0,
        **CFG_KW,
    )
    home_capped, plain = _march_pair(capped)
    _assert_march_equal(home_capped, plain)


def test_home_prefix_kernel_outputs():
    """Direct kernel contract: the home packed lists are a suffix of
    the plain ones (prefix candidates consumed in order), a prefix hit
    zeroes the packed count, and the prefix actually fires on the
    fixture."""
    from unitysspathtracingurp_tpu.ops.fused_schedule import (
        fused_schedule_pack,
        schedule_scalars,
    )

    gb, cam, origin, d, alive, view_dir, scene_dist = _march_inputs()
    tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
    strips = build_home_strips(tiles, H, W)
    cfg = PTConfig(**CFG_KW)
    zero = jnp.zeros((H * W,), jnp.float32)
    common = dict(
        gh=H, gw=W, minis_x=tiles.minis_x, n_chunks=tiles.n_mini_chunks,
        s_max=STEPS, k=8, max_small_step=cfg.max_small_step,
        max_medium_step=cfg.max_medium_step,
        small_step_size=cfg.small_step_size,
        medium_step_size=cfg.medium_step_size,
        marching_thickness=cfg.marching_thickness,
        step_growth=cfg.step_growth,
        thickness_growth=cfg.thickness_growth,
    )
    lane_args = (
        origin.reshape(-1, 3), d.reshape(-1, 3), zero,
        jnp.full((H * W,), 1.0), alive.reshape(-1),
        jnp.zeros((H * W,), bool), tiles.mini_table, schedule_scalars(cam),
    )
    pc, ps, ph, nc = fused_schedule_pack(*lane_args, **common)
    hc, hs, hh, hn, home_out = fused_schedule_pack(
        *lane_args, home_strips=strips, home_shape=(H, W), **common
    )
    nc, hn = np.asarray(nc), np.asarray(hn)
    hit = np.asarray(home_out[0]) > 0.5
    # Coverage: the prefix must do real work on this fixture.
    assert hit.sum() > 20, f"prefix resolved only {hit.sum()} lanes"
    assert (hn <= nc).all(), "home packed MORE candidates than plain"
    assert (hn[hit] == 0).all(), "prefix hit lanes must pack nothing"
    consumed = int(nc.sum() - hn.sum())
    assert consumed > 0
    # Suffix property: lane n's home list equals its plain list with
    # the first (nc - hn) entries dropped... except where a prefix hit
    # zeroed it. Checked on the cum field.
    pc, hc = np.asarray(pc), np.asarray(hc)
    no_hit = ~hit
    for lane in np.flatnonzero(no_hit & (hn > 0))[:200]:
        drop = nc[lane] - hn[lane]
        np.testing.assert_array_equal(
            hc[: hn[lane], lane], pc[drop : nc[lane], lane],
            err_msg=f"lane {lane}",
        )


def test_home_strips_contents():
    """Strip rows carry exactly the pair_table rows of the block's
    ±1-band / ±1-pair neighborhood."""
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
    strips = np.asarray(build_home_strips(tiles, H, W))
    pt = np.asarray(tiles.pair_table).reshape(-1, tiles.pairs_x, 128)
    nby, nbx = H // 8, W // 128
    assert strips.shape == (nby, nbx, 18, 128)
    for by in range(nby):
        for bx in range(nbx):
            for bj in range(3):
                band = by + bj - 1
                for pj in range(6):
                    px = bx * 4 + pj - 1
                    got = strips[by, bx, bj * 6 + pj]
                    if 0 <= band < nby and 0 <= px < tiles.pairs_x:
                        np.testing.assert_array_equal(got, pt[band, px])
                    else:
                        np.testing.assert_array_equal(got, 0.0)


@pytest.mark.slow
def test_home_prefix_trace_frame_equal():
    """End-to-end at 128²/24 steps: trace_frame_hiz with the home
    prefix on vs off (bounce-0 threading through trace_frame).
    Slow: interpret-mode compile of the 24-step kernel body."""
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz

    hh, ww = 128, 128
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(hh, ww)
    gb = fixtures.rasterize_gbuffers(sc, cam, hh, ww)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(
        maximum_depth=2, samples_per_pixel=1, maximum_steps=24,
        dithering=False,
    )
    variants = settings.variants()

    def render(home):
        cfg = PTConfig(fused_schedule=True, hiz_home_prefix=home)
        return np.asarray(
            trace_frame_hiz(
                gb, cam, probes, settings, cfg, variants, jnp.uint32(33),
                n_rounds=10,
            )
        )

    img_home, img_plain = render(True), render(False)
    diff = np.abs(img_home - img_plain)
    frac_exact = (diff.max(-1) < 1e-6).mean()
    assert frac_exact >= 0.999, f"pixel agreement {frac_exact:.5f}"
