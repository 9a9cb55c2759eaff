"""Diagnose the dual-depth hiz parity failures (round 3).

For refraction-only inside==0 the parity tracer's semantics reduce to
the plain variant (device_depth = layer1, no back layer, front rays
never search). So the plain hiz path on the same inputs is a calibrated
control: if it agrees with parity at the same ~96% as the dual path,
the gap is fixture hardness (192^2, steps=24, tilted dirs), not a dual
bug; if plain passes, the dual resolve deviates.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

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
from unitysspathtracingurp_tpu.ops.pathtrace_hiz import build_tiles_for

H = W = 192
CFG = PTConfig()

sc = scene.build_box_scene(with_glass=True, with_mirror=False)
cam = fixtures.box_scene_camera(H, W)
gb = fixtures.rasterize_gbuffers(sc, cam, H, W, with_backface=True)


def settings_of(refraction, backface):
    return PTSettings(
        maximum_depth=3,
        samples_per_pixel=1,
        maximum_steps=24,
        support_refraction=refraction,
        accurate_thickness=(
            ThicknessMode.DEPTH_NORMALS if backface else ThicknessMode.CONSTANT
        ),
        dithering=False,
    )


def march_inputs(inside_val=0.0):
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


def run_case(refraction, backface, inside_val, force_plain=False):
    settings = settings_of(refraction, backface)
    variants = settings.variants()
    origin, d, alive, view_dir, scene_dist, inside = march_inputs(inside_val)
    zero = jnp.zeros((H, W), jnp.float32)
    ref = pathtrace.ray_march(
        CFG, settings, variants, gb, cam, origin, d, inside, zero,
        -view_dir, scene_dist, alive,
    )
    if force_plain:
        plain_settings = settings_of(False, False)
        pv = plain_settings.variants()
        tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
        dbg = {}
        fast = pathtrace_hiz.ray_march_hiz(
            CFG, plain_settings, pv, gb, cam, origin, d, inside, zero,
            -view_dir, scene_dist, alive, tiles=tiles, n_rounds=10,
            _debug_out=dbg,
        )
    else:
        tiles = build_tiles_for(gb, cam, variants)
        dbg = {}
        fast = pathtrace_hiz.ray_march_hiz(
            CFG, settings, variants, gb, cam, origin, d, inside, zero,
            -view_dir, scene_dist, alive, tiles=tiles, n_rounds=10,
            _debug_out=dbg,
        )
    ref_hit = np.asarray(ref.hit)
    fast_hit = np.asarray(fast.hit)
    agree = (ref_hit == fast_hit).mean()
    miss = (ref_hit & ~fast_hit).mean()  # hiz misses a parity hit
    extra = (~ref_hit & fast_hit).mean()  # hiz hits where parity misses
    # Back-ray correlation on disagreements
    is_back = np.asarray(jnp.sum(d * view_dir, -1) > 0.0)
    dis = ref_hit != fast_hit
    tag = "plainctl" if force_plain else f"dual r={int(refraction)} b={int(backface)} i={inside_val}"
    print(
        f"{tag}: agree={agree:.4f} miss={miss:.4f} extra={extra:.4f} "
        f"dis_backray_frac={is_back[dis].mean() if dis.any() else 0:.3f} "
        f"n_dis={dis.sum()}"
    )
    return ref, fast, dis, is_back, dbg


if __name__ == "__main__":
    run_case(True, False, 0.0, force_plain=True)   # control: plain hiz
    run_case(True, False, 0.0)                     # dual, same semantics
    run_case(True, False, 2.0)
    run_case(False, True, 0.0)
    run_case(True, True, 0.0)
    run_case(True, True, 1.0)


def analyze_extra(refraction=True, backface=False, inside_val=0.0, force_plain=True):
    """Where do the hiz extra hits sit relative to the f32 hit window?"""
    settings = settings_of(refraction, backface)
    variants = settings.variants()
    origin, d, alive, view_dir, scene_dist, inside = march_inputs(inside_val)
    zero = jnp.zeros((H, W), jnp.float32)
    ref = pathtrace.ray_march(
        CFG, settings, variants, gb, cam, origin, d, inside, zero,
        -view_dir, scene_dist, alive,
    )
    plain_settings = settings_of(False, False)
    pv = plain_settings.variants()
    tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
    fast = pathtrace_hiz.ray_march_hiz(
        CFG, plain_settings, pv, gb, cam, origin, d, inside, zero,
        -view_dir, scene_dist, alive, tiles=tiles, n_rounds=10,
    )
    ref_hit = np.asarray(ref.hit)
    fast_hit = np.asarray(fast.hit)
    extra = ~ref_hit & fast_hit
    is_back = np.asarray(jnp.sum(d * view_dir, -1) > 0.0)
    extra_front = extra & ~is_back
    print(f"extra hits: {extra.sum()} (front {extra_front.sum()})")

    # f32 depth at the hiz hit texel vs the hiz hit depth: recompute the
    # exact window test the parity tracer would apply at that position.
    from unitysspathtracingurp_tpu.camera import world_to_ndc

    layer1 = np.asarray(gb.layer1_depth())
    hit_uvs = np.asarray(fast.uv)
    dist = np.asarray(fast.distance)
    o = np.asarray(origin); dd = np.asarray(d)
    pos = o + dist[..., None] * dd
    ndc = np.asarray(world_to_ndc(cam.view_proj, jnp.asarray(pos)))
    lin = lambda z: np.asarray(
        linear_eye_depth(jnp.asarray(z), cam.near, cam.far)
    )
    iy = np.clip((hit_uvs[..., 1] * H).astype(int), 0, H - 1)
    ix = np.clip((hit_uvs[..., 0] * W).astype(int), 0, W - 1)
    scene32 = lin(layer1[iy, ix])
    hitd = lin(ndc[..., 2])
    dmargin = scene32 - hitd  # parity's depth_diff at this texel/pos
    sel = extra_front
    dm = dmargin[sel]
    # th at the hit is unknown without the schedule; base window 0.4 m
    print("extra-front d=scene-hitd percentiles (m):")
    for q in (1, 10, 25, 50, 75, 90, 99):
        print(f"  p{q:02d}: {np.percentile(dm, q):+.5f}")
    # Fraction within 5 mm of d=0 (the f16-flippable band)
    print(f"  |d| < 2mm: {(np.abs(dm) < 0.002).mean():.3f}")
    print(f"  |d| < 5mm: {(np.abs(dm) < 0.005).mean():.3f}")
    print(f"  d > 0 (parity would also pass d<=0 test? no): {(dm > 0).mean():.3f}")


if __name__ == "__main__" and "--extra" in sys.argv:
    analyze_extra()


def analyze_extra2():
    """Decisive probe: at each extra-front hit, reconstruct the f16 pair
    value the resolve actually tested and the th it decoded."""
    settings = settings_of(False, False)
    variants = settings.variants()
    origin, d, alive, view_dir, scene_dist, inside = march_inputs(0.0)
    zero = jnp.zeros((H, W), jnp.float32)
    rsettings = settings_of(True, False)
    ref = pathtrace.ray_march(
        CFG, rsettings, rsettings.variants(), gb, cam, origin, d, inside,
        zero, -view_dir, scene_dist, alive,
    )
    tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
    dbg = {"_full": True}
    fast = pathtrace_hiz.ray_march_hiz(
        CFG, settings, variants, gb, cam, origin, d, inside, zero,
        -view_dir, scene_dist, alive, tiles=tiles, n_rounds=10,
        _debug_out=dbg,
    )
    ref_hit = np.asarray(ref.hit)
    fast_hit = np.asarray(fast.hit)
    is_back = np.asarray(jnp.sum(d * view_dir, -1) > 0.0)
    extra_front = ~ref_hit & fast_hit & ~is_back
    ys, xs = np.nonzero(extra_front)
    print(f"n extra front: {len(ys)}")
    cand_s = np.asarray(dbg["c0_cand_s"])      # (S,H,W)
    proc_s = np.asarray(dbg["c0_proc_s"])
    hitd_s = np.asarray(dbg["c0_hitd_s"])
    th_s = np.asarray(dbg["c0_th_s"])
    ixy_s = np.asarray(dbg["c0_ixy_s"])
    layer1 = np.asarray(gb.layer1_depth())
    lin = lambda z: np.asarray(linear_eye_depth(jnp.asarray(z), cam.near, cam.far))
    lin1 = lin(layer1)
    f16d = lin(np.asarray(layer1, np.float16).astype(np.float32))
    for y, x in list(zip(ys, xs))[:8]:
        dist_hiz = np.asarray(fast.distance)[y, x]
        print(f"lane ({y},{x}) back={is_back[y,x]} hiz_dist={dist_hiz:.3f}")
        for s in range(cand_s.shape[0]):
            if not cand_s[s, y, x]:
                continue
            t_ixy = ixy_s[s, y, x]
            ty_, tx_ = t_ixy // W, t_ixy % W
            sc32 = lin1[ty_, tx_]
            sc16 = f16d[ty_, tx_]
            dd32 = sc32 - hitd_s[s, y, x]
            dd16 = sc16 - hitd_s[s, y, x]
            print(
                f"  s={s:2d} proc={proc_s[s,y,x]} tex=({ty_},{tx_}) "
                f"hitd={hitd_s[s,y,x]:7.3f} th={th_s[s,y,x]:5.3f} "
                f"d32={dd32:+8.4f} d16={dd16:+8.4f} "
                f"{'HIT32' if (-th_s[s,y,x] <= dd32 <= 0) else ''}"
                f"{'HIT16' if (-th_s[s,y,x] <= dd16 <= 0) else ''}"
            )


if __name__ == "__main__" and "--extra2" in sys.argv:
    analyze_extra2()


def converged_check(refraction, backface, n=6, depth=2):
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe

    settings = dataclasses.replace(
        settings_of(refraction, backface), maximum_depth=depth
    )
    variants = settings.variants()
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    from unitysspathtracingurp_tpu.config import ThicknessMode

    bde = int(settings.accurate_thickness.value)
    accr = np.zeros((H, W, 3)); accf = np.zeros((H, W, 3))
    id_frac = []
    for i in range(n):
        fi = jnp.uint32((33 * (i + 1)) % 64000)
        r = np.asarray(pathtrace.trace_frame(
            gb, cam, probes, settings, CFG, variants, fi,
            back_depth_enabled=bde))
        f = np.asarray(pathtrace_hiz.trace_frame_hiz(
            gb, cam, probes, settings, CFG, variants, fi,
            back_depth_enabled=bde, n_rounds=10))
        id_frac.append((np.abs(r - f).max(-1) < 1e-4).mean())
        accr += r; accf += f
    accr /= n; accf /= n
    pr = accr.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    pf = accf.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))
    rel = np.sqrt(((pr - pf) ** 2).mean()) / np.sqrt((pr ** 2).mean())
    mshift = abs(accr.mean() - accf.mean()) / max(accr.mean(), 1e-9)
    print(
        f"conv r={int(refraction)} b={int(backface)} d={depth} n={n}: "
        f"pooled_rel={rel:.4f} mean_shift={mshift:.4f} "
        f"id_frac={np.mean(id_frac):.4f}"
    )


if __name__ == "__main__" and "--conv" in sys.argv:
    converged_check(True, False)
    converged_check(False, True)
    converged_check(True, True)


def front_lane_calibration():
    """Agreement restricted to non-search-capable lanes (kernel
    convention: back ray = dot(dir, to_camera) > 0; the march receives
    -view_dir). For refraction-only inside==0 these lanes never run the
    binary search, so hiz deviations there are only f16/interp classes."""
    for force_plain in (True, False):
        settings = settings_of(True, False)
        variants = settings.variants()
        origin, d, alive, view_dir, scene_dist, inside = march_inputs(0.0)
        zero = jnp.zeros((H, W), jnp.float32)
        ref = pathtrace.ray_march(
            CFG, settings, variants, gb, cam, origin, d, inside, zero,
            -view_dir, scene_dist, alive,
        )
        if force_plain:
            ps = settings_of(False, False)
            tiles = build_depth_tiles(gb.layer1_depth(), cam.near, cam.far)
            fast = pathtrace_hiz.ray_march_hiz(
                CFG, ps, ps.variants(), gb, cam, origin, d, inside, zero,
                -view_dir, scene_dist, alive, tiles=tiles, n_rounds=10,
            )
        else:
            tiles = build_tiles_for(gb, cam, variants)
            fast = pathtrace_hiz.ray_march_hiz(
                CFG, settings, variants, gb, cam, origin, d, inside, zero,
                -view_dir, scene_dist, alive, tiles=tiles, n_rounds=10,
            )
        ref_hit = np.asarray(ref.hit)
        fast_hit = np.asarray(fast.hit)
        # kernel back-ray: dot(ray_dir, passed_view=-view_dir) > 0
        kback = np.asarray(jnp.sum(d * (-view_dir), -1) > 0.0)
        agree = ref_hit == fast_hit
        msk = np.asarray(alive)
        print(
            f"plain={force_plain}: all={agree[msk].mean():.4f} "
            f"front={agree[msk & ~kback].mean():.4f} "
            f"back={agree[msk & kback].mean():.4f} "
            f"front_frac={(msk & ~kback).sum() / msk.sum():.3f}"
        )


if __name__ == "__main__" and "--front" in sys.argv:
    front_lane_calibration()
