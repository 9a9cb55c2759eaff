"""Screen-space path tracer — pure jax.numpy reference implementation.

Ground-up rebuild of the reference's core GPU kernel (PathTracing.hlsl:
RayMarching :7-254, EvaluateBRDF :256-383, ScreenSpacePathTracing
:385-496, and pass 0 of ScreenSpacePathTracing.shader:114-147), designed
for TPU execution semantics rather than SIMT:

  * every per-ray `break`/`continue` becomes a lane mask over the full
    (H, W) pixel grid; all lanes run fixed-trip loops (XLA-friendly),
  * all depth lookups are flattened one-axis gathers,
  * the per-draw RNG counter advances uniformly at every potential draw
    site (see ops/rng.py for the documented deviation).

This module is the permanent correctness oracle: faster tracer variants
(the block-cached / hierarchical paths in ops/pathtrace_hiz.py and the
Pallas in-block kernels in ops/pallas_gather.py, when present) are
parity- or quality-gated against it.

Reference quirks reproduced deliberately (bit-for-bit behavior parity):
  * the lobe-selection roulette can terminate a path even when lobe
    probabilities sum to 1 (`else if (roulette < diffProbability)` after
    the specular test, PathTracing.hlsl:333) — rays with
    roulette >= diffProbability die,
  * `sceneDistance` is the primary depth re-passed through
    LinearEyeDepth once per bounce (PathTracing.hlsl:464), garbage after
    the first bounce but only feeding the far-tier step heuristic,
  * refraction exit "absorption" uses exp(+albedo * max(dist, 2.5))
    (PathTracing.hlsl:307), an artistic amplification, not Beer's law,
  * the firefly roughness bias is computed but never applied
    (PathTracing.hlsl:448-452) — we skip computing it entirely.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..camera import (
    Camera,
    RAW_FAR_CLIP,
    linear_eye_depth,
    pixel_uv,
    world_from_uv_depth,
    world_to_ndc,
)
from ..config import PTConfig, PTSettings, PTVariants
from ..gbuffer import GBuffers, gather2d, hit_surface_from_gbuffer, uv_to_pixel
from . import brdf
from .brdf import dot3, normalize, saturate
from .envprobe import ProbeSet, sample_reflection_probes
from .rng import RNG, draw, draw2, make_rng
from ..utils.profiling import named_pass, PASS_PATH_TRACING

REAL_EPS = 1.1920929e-07


class MarchResult(NamedTuple):
    """Per-lane ray-march outputs (the RayHit geometric fields)."""

    hit: jnp.ndarray  # (H, W) bool
    position: jnp.ndarray  # (H, W, 3) world hit position (+ bias applied later)
    distance: jnp.ndarray  # (H, W)
    uv: jnp.ndarray  # (H, W, 2) screen uv of the hit (G-buffer fetch coords)
    is_back_hit: jnp.ndarray  # (H, W) bool


def _fast_sign(x):
    return jnp.where(x >= 0.0, 1.0, -1.0)


def _depth_gather(depth_img, uv):
    iy, ix = uv_to_pixel(uv, depth_img.shape[0], depth_img.shape[1])
    return gather2d(depth_img, iy, ix)


def ray_march(
    cfg: PTConfig,
    settings: PTSettings,
    variants: PTVariants,
    gb: GBuffers,
    cam: Camera,
    ray_pos: jnp.ndarray,
    ray_dir: jnp.ndarray,
    inside: jnp.ndarray,
    dither: jnp.ndarray,
    view_dir: jnp.ndarray,
    scene_distance: jnp.ndarray,
    alive: jnp.ndarray,
    home_ok: bool = False,  # accepted for march_fn signature parity
) -> MarchResult:
    """Masked fixed-trip rebuild of RayMarching (PathTracing.hlsl:7-254).

    All arguments are (H, W[, 3]) lane arrays; ``alive`` masks lanes that
    still carry energy. The adaptive 3-tier step schedule, sub-pixel-move
    skip, 3-layer depth selection, binary-search refinement, backface
    thickness rules, hit interpolation, and exponential miss growth are
    reproduced exactly (see module docstring).
    """
    h, w = ray_pos.shape[0], ray_pos.shape[1]  # lane-block shape
    texel_x, texel_y = 1.0 / gb.width, 1.0 / gb.height
    vp = cam.view_proj

    is_front_ray = dot3(ray_dir, view_dir) <= 0.0

    layer1 = gb.layer1_depth()
    opaque = gb.depth
    back = gb.back_depth

    # Multi-layer configs stack their depth planes so each march step
    # fetches every layer with ONE wide gather (per-index gather pricing
    # on TPU; see gbuffer_packed.gather_wide).
    depth_stack = None
    if variants.backface_textures and back is not None:
        if variants.support_refraction:
            depth_stack = jnp.stack([layer1, opaque, back], axis=-1)
        else:
            depth_stack = jnp.stack([layer1, back], axis=-1)
    elif variants.support_refraction:
        depth_stack = jnp.stack([layer1, opaque], axis=-1)

    lin = partial(linear_eye_depth, near=cam.near, far=cam.far)

    # Far-tier step size (ref :55): unclamped lerp toward 20 m with scene
    # distance, frozen per march call.
    large_step = (
        settings.step_size
        + (20.0 - settings.step_size) * scene_distance * 0.001
    )

    zero = jnp.zeros((h, w), jnp.float32)
    state = dict(
        ray_p=ray_pos,
        last_p=ray_pos,
        last_ndc=world_to_ndc(vp, ray_pos),
        last_diff=zero,
        step=jnp.full((h, w), cfg.small_step_size, jnp.float32),
        march_th=jnp.full((h, w), cfg.marching_thickness, jnp.float32),
        start_bin=jnp.zeros((h, w), bool),
        active=alive,
        hit=jnp.zeros((h, w), bool),
        hit_pos=jnp.zeros_like(ray_pos),
        hit_dist=jnp.full((h, w), REAL_EPS, jnp.float32),
        hit_uv=jnp.zeros((h, w, 2), jnp.float32),
        is_back_hit=jnp.zeros((h, w), bool),
    )

    def body(i, st):
        # --- Adaptive tier transitions (ref :44-58). The activeSampling
        # flags reduce to exact step indices because i advances by 1.
        at_medium = i == cfg.max_small_step + 1
        at_large = i == cfg.max_medium_step + 1
        keep = st["start_bin"]
        step = st["step"]
        th = st["march_th"]
        step = jnp.where(
            at_medium, jnp.where(keep, step, cfg.medium_step_size), step
        )
        step = jnp.where(at_large, jnp.where(keep, step, large_step), step)
        th = jnp.where(at_medium | at_large, cfg.marching_thickness, th)

        # --- Advance (ref :61).
        advance = (step + step * dither)[..., None] * ray_dir
        ray_p = jnp.where(st["active"][..., None], st["ray_p"] + advance, st["ray_p"])
        ndc = world_to_ndc(vp, ray_p)
        last_ndc = st["last_ndc"]

        # Sub-pixel-movement skip (ref :67-68): step consumed, no test.
        skip = (
            st["active"]
            & (i <= cfg.max_medium_step)
            & (jnp.abs(ndc[..., 0] - last_ndc[..., 0]) < texel_x)
            & (jnp.abs(ndc[..., 1] - last_ndc[..., 1]) < texel_y)
        )
        in_screen = (
            (ndc[..., 0] > 0.0)
            & (ndc[..., 0] < 1.0)
            & (ndc[..., 1] > 0.0)
            & (ndc[..., 1] < 1.0)
        )
        exit_screen = st["active"] & ~skip & ~in_screen  # ref :75-77 break
        proc = st["active"] & ~skip & in_screen

        uv = ndc[..., :2]
        raw_z = ndc[..., 2]

        # --- 3-layer depth selection (ref :79-98); all needed layers
        # arrive in one wide gather.
        if depth_stack is not None:
            from ..gbuffer_packed import gather_wide

            iy_d, ix_d = uv_to_pixel(uv, gb.height, gb.width)
            layers = gather_wide(depth_stack, iy_d, ix_d)
        if variants.backface_textures and back is not None:
            if variants.support_refraction:
                d_layer1, d_opaque, d_back = (
                    layers[..., 0], layers[..., 1], layers[..., 2],
                )
                device_depth = jnp.where(
                    inside == 1.0,
                    d_back,
                    jnp.where(inside == 2.0, d_opaque, d_layer1),
                )
                device_back = jnp.where(inside == 1.0, d_opaque, d_back)
            else:
                d_layer1, d_back = layers[..., 0], layers[..., 1]
                device_depth = d_layer1
                device_back = d_back
        else:
            if variants.support_refraction:
                d_layer1, d_opaque = layers[..., 0], layers[..., 1]
                device_depth = jnp.where(inside != 0.0, d_opaque, d_layer1)
            else:
                device_depth = _depth_gather(layer1, uv)
            device_back = None

        scene_depth = lin(device_depth)
        hit_depth = lin(raw_z)
        depth_diff = scene_depth - hit_depth  # ref :108

        # --- Backface thickness rules (ref :111-136).
        if device_back is not None:
            scene_back = lin(device_back)
            back_valid = (device_back != RAW_FAR_CLIP) & (scene_back >= scene_depth)
            back_diff = jnp.where(
                back_valid, hit_depth - scene_back, depth_diff - th
            )
        else:
            scene_back = jnp.zeros_like(scene_depth)
            back_valid = jnp.zeros_like(proc)
            back_diff = jnp.zeros_like(depth_diff)

        # --- Binary search control (ref :138-163).
        is_back_search = (~is_front_ray) & (hit_depth > scene_back) & back_valid
        signed_diff = jnp.where(is_back_search, back_diff, depth_diff)
        sgn = _fast_sign(signed_diff)
        cannot_bin = (
            (inside != 2.0)
            & ~st["start_bin"]
            & jnp.where(is_front_ray, hit_depth > scene_back, hit_depth < scene_depth)
        )
        start_bin = jnp.where(
            proc, (~cannot_bin) & (st["start_bin"] | (sgn == -1.0)), st["start_bin"]
        )
        halved = step * 0.5
        aligned = jnp.where(_fast_sign(halved) == sgn, halved, -halved)
        step = jnp.where(proc & start_bin, aligned, step)

        is_sky = device_depth == RAW_FAR_CLIP  # ref :166

        # --- Hit rules (ref :168-190); step here is post-halving (ref :182).
        if device_back is not None:
            hit_backed = (
                (depth_diff <= 0.0)
                & (hit_depth <= jnp.maximum(scene_back, scene_depth + step))
                & ~is_sky
            )
            hit_plain = (
                (depth_diff <= 0.0) & (depth_diff >= -th) & ~is_sky
            )
            hit_ok = jnp.where(back_valid, hit_backed, hit_plain)
            back_hit_now = back_valid & (hit_depth > scene_back) & (sgn > 0.0)
        else:
            hit_ok = (depth_diff <= 0.0) & (depth_diff >= -th) & ~is_sky
            back_hit_now = jnp.zeros_like(proc)

        new_hit = proc & hit_ok

        # --- Hit interpolation (ref :199-214): lerp between the previous
        # and current march position by depth-difference ratio when the
        # sign flipped this step.
        denom = st["last_diff"] - signed_diff
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        t = st["last_diff"] / denom
        lerped = st["last_p"] + (ray_p - st["last_p"]) * t[..., None]
        use_lerp = sgn != _fast_sign(st["last_diff"])
        hp = jnp.where(use_lerp[..., None], lerped, ray_p)

        hit_pos = jnp.where(new_hit[..., None], hp, st["hit_pos"])
        # Distance uses the *uninterpolated* march position (ref :196).
        dist = jnp.linalg.norm(ray_p - ray_pos, axis=-1)
        hit_dist = jnp.where(new_hit, dist, st["hit_dist"])
        hit_uv = jnp.where(new_hit[..., None], uv, st["hit_uv"])
        is_back_hit = jnp.where(new_hit, back_hit_now, st["is_back_hit"])

        # --- Exponential growth while unconverged (ref :239-246).
        grow = proc & ~hit_ok & ~start_bin
        step = jnp.where(grow, step + step * cfg.step_growth, step)
        th = jnp.where(
            grow, th + cfg.marching_thickness * cfg.thickness_growth, th
        )

        # --- Trailing state updates (ref :248-251); skipped lanes keep
        # their previous last_* values, hit lanes exit.
        upd = proc & ~new_hit
        last_diff = jnp.where(upd, signed_diff, st["last_diff"])
        last_p = jnp.where(upd[..., None], ray_p, st["last_p"])
        last_ndc = jnp.where(upd[..., None], ndc, st["last_ndc"])

        active = st["active"] & ~exit_screen & ~new_hit

        return dict(
            ray_p=ray_p,
            last_p=last_p,
            last_ndc=last_ndc,
            last_diff=last_diff,
            step=step,
            march_th=th,
            start_bin=start_bin,
            active=active,
            hit=st["hit"] | new_hit,
            hit_pos=hit_pos,
            hit_dist=hit_dist,
            hit_uv=hit_uv,
            is_back_hit=is_back_hit,
        )

    # Unrolling lets XLA fuse march steps into a few large kernels instead
    # of materializing the full (H, W) lane state in HBM every iteration —
    # measured 43x faster fully unrolled on v5e at 1080p. The factor
    # trades compile time for fusion reach.
    state = jax.lax.fori_loop(
        1, settings.maximum_steps + 1, body, state, unroll=cfg.march_unroll
    )
    return MarchResult(
        hit=state["hit"],
        position=state["hit_pos"],
        distance=state["hit_dist"],
        uv=state["hit_uv"],
        is_back_hit=state["is_back_hit"],
    )


class BRDFResult(NamedTuple):
    direction: jnp.ndarray  # (H, W, 3) next ray direction
    position: jnp.ndarray  # (H, W, 3) next ray origin
    energy: jnp.ndarray  # (H, W, 3) updated throughput
    radiance: jnp.ndarray  # (H, W, 3) emitted/env light returned this bounce
    rng: RNG


def evaluate_brdf(
    cfg: PTConfig,
    variants: PTVariants,
    rng: RNG,
    ray_dir: jnp.ndarray,
    ray_pos: jnp.ndarray,
    energy: jnp.ndarray,
    hit: jnp.ndarray,
    surf,
    hit_pos: jnp.ndarray,
    hit_dist: jnp.ndarray,
    primary_pos: jnp.ndarray,
    probes: ProbeSet,
) -> BRDFResult:
    """Rebuild of EvaluateBRDF (PathTracing.hlsl:256-383), vectorized.

    On hit: roulette-select one lobe (refraction iff ior != -1, else
    specular/diffuse), update throughput and direction, return the hit's
    emission. On miss: zero the throughput and return the reflection-probe
    environment sample (the only sky light source).
    """
    view = -ray_dir  # incoming direction, toward the previous origin
    ndotv = brdf.clamp_ndotv(dot3(surf.normal, view))

    do_refraction = surf.ior != -1.0
    refl_albedo = brdf.reflectivity_specular(surf.albedo)
    refl_spec = brdf.reflectivity_specular(
        jnp.maximum(surf.specular, 0.04)  # kDieletricSpec floor (ref :268)
    )
    refract_p = jnp.where(do_refraction, refl_albedo, 0.0)
    spec_p = jnp.where(do_refraction, 1.0 - refract_p, refl_spec)
    diff_p = 1.0 - spec_p - refract_p

    perceptual_roughness = 1.0 - surf.smoothness
    roughness = perceptual_roughness * perceptual_roughness

    random, rng = draw2(rng)
    frame = brdf.get_local_frame(surf.normal)
    roulette, rng = draw(rng)

    # --- Refraction lobe (ref :282-310).
    eta = jnp.where(
        surf.inside_object == 1.0, 1.0 / jnp.maximum(surf.ior, 1e-6), surf.ior
    )
    _, _, vdoth_r = brdf.sample_ggx_ndf(random, view, frame, roughness)
    fresnel = brdf.f_schlick_f90(0.04, jnp.maximum(surf.smoothness, 0.04), vdoth_r)
    refr_dir, refr_valid = brdf.refract(ray_dir, surf.normal, eta)
    use_refract_dir = refr_valid & (roulette > fresnel)
    refl_dir = brdf.reflect(ray_dir, surf.normal)
    refraction_dir = jnp.where(use_refract_dir[..., None], refr_dir, refl_dir)
    inv_refract_p = 1.0 / jnp.maximum(refract_p, 0.001)
    exit_gain = jnp.exp(surf.albedo * jnp.maximum(hit_dist, 2.5)[..., None])
    refraction_energy_scale = jnp.where(
        (surf.inside_object == 2.0)[..., None],
        inv_refract_p[..., None] * exit_gain,
        jnp.where(
            (surf.inside_object == 1.0)[..., None],
            inv_refract_p[..., None] * surf.albedo,
            1.0,
        ),
    )

    # --- Specular lobe (ref :311-332).
    spec_l, vdoth_s, _, weight_over_pdf = brdf.importance_sample_ggx_pdf(
        random, view, frame, roughness, ndotv
    )
    f_spec = brdf.f_schlick(surf.specular, vdoth_s)
    spec_energy_scale = (
        f_spec * weight_over_pdf[..., None] / jnp.maximum(spec_p, 1e-12)[..., None]
    )

    # --- Diffuse lobe (ref :333-356).
    diff_l, ndotl_d, w_lambert = brdf.importance_sample_lambert(random, frame)
    if cfg.use_disney_diffuse:
        ldotv = saturate(dot3(diff_l, view))
        diffuse_brdf = surf.albedo * brdf.disney_diffuse_no_pi(
            ndotv, ndotl_d, ldotv, perceptual_roughness
        )[..., None]
    else:
        diffuse_brdf = surf.albedo
    diff_energy_scale = (
        diffuse_brdf
        * w_lambert[..., None]
        / jnp.maximum(diff_p, 1e-12)[..., None]
    )

    # --- Lobe roulette, reproducing the reference's exact chain
    # (ref :282, :311, :333): each test is `roulette < p_lobe` — NOT a
    # stratified CDF — so a path can terminate even when probabilities
    # sum to one.
    sel_refract = (refract_p > 0.0) & (roulette < refract_p)
    sel_spec = ~sel_refract & (spec_p > 0.0) & (roulette < spec_p)
    sel_diff = ~sel_refract & ~sel_spec & (diff_p > 0.0) & (roulette < diff_p)

    new_dir = jnp.where(
        sel_refract[..., None],
        refraction_dir,
        jnp.where(sel_spec[..., None], spec_l, diff_l),
    )
    scale = jnp.where(
        sel_refract[..., None],
        refraction_energy_scale,
        jnp.where(
            sel_spec[..., None],
            spec_energy_scale,
            jnp.where(sel_diff[..., None], diff_energy_scale, 0.0),
        ),
    )
    new_energy = energy * scale

    # --- Miss: kill the ray, return environment (ref :365-382). The probe
    # lookup uses the *primary pixel's* world position (frag scope).
    env = sample_reflection_probes(probes, ray_dir, primary_pos, mip_level=1.0)
    radiance = jnp.where(hit[..., None], surf.emission, env)
    new_energy = jnp.where(hit[..., None], new_energy, 0.0)
    new_dir = jnp.where(hit[..., None], new_dir, ray_dir)
    new_pos = jnp.where(hit[..., None], hit_pos, ray_pos)

    return BRDFResult(
        direction=new_dir,
        position=new_pos,
        energy=new_energy,
        radiance=radiance,
        rng=rng,
    )


def _fast_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a 1-D int32 array, decomposed into
    lane-axis cumsums of (rows, 128) blocks. XLA's 1-D cumsum at 2M
    elements measured 9.6 ms on v5e (and pathological compile times in
    isolation); this two-level form measures 3.45 ms
    (scripts/probe_compact_cost.py cumsum2)."""
    n = x.shape[0]
    if n <= 4096:
        return jnp.cumsum(x)
    pad = (-n) % 128
    x2 = jnp.pad(x, (0, pad)).reshape(-1, 128)
    within = jnp.cumsum(x2, axis=1)
    row_tot = within[:, -1]
    offs = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), _fast_cumsum(row_tot)[:-1]]
    )
    return (within + offs[:, None]).reshape(-1)[:n]


def _compact_indices(alive_flat: jnp.ndarray, cap_n: int):
    """Dense packing map for between-bounce ray compaction
    (PTConfig.compaction_caps).

    Returns ``(src_idx, valid, n_drop, slots, keep)``: ``src_idx``
    (cap_n,) int32 maps each compact slot to its source lane (0 for
    unused slots), ``valid`` flags slots holding a real lane, ``n_drop``
    counts alive lanes beyond the capacity (dropped — the documented
    overflow deviation, zero when the cap is honest), ``slots`` (n,)
    is the inverse map (source lane -> compact slot, valid where
    ``keep``), and ``keep`` flags source lanes actually carried over.
    """
    n = alive_flat.shape[0]
    slots = _fast_cumsum(alive_flat.astype(jnp.int32)) - 1
    n_alive = slots[-1] + 1
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    keep = alive_flat & (slots < cap_n)
    tgt = jnp.where(keep, slots, cap_n)
    src_idx = jnp.zeros((cap_n + 1,), jnp.int32).at[tgt].set(lane_ids)[:cap_n]
    valid = jnp.arange(cap_n, dtype=jnp.int32) < n_alive
    return src_idx, valid, jnp.maximum(n_alive - cap_n, 0), slots, keep


def _gather_lane_state(arrs, src_idx):
    """Gather per-lane state arrays ((N,) or (N, k); f32/int/bool) into
    the compact domain with ONE wide row gather — XLA's gather is priced
    per *index*, so k separate gathers would cost k times as much."""
    cols, metas = [], []
    for a in arrs:
        a2 = a.reshape(a.shape[0], -1)
        metas.append((a.dtype, a.shape[1:], a2.shape[1]))
        if jnp.issubdtype(a.dtype, jnp.integer):
            a2 = jax.lax.bitcast_convert_type(a2, jnp.float32)
        elif a.dtype == jnp.bool_:
            a2 = a2.astype(jnp.float32)
        cols.append(a2)
    from .pallas_gather import row_gather

    g = row_gather(jnp.concatenate(cols, axis=1), src_idx)
    out, o = [], 0
    for dtype, tail, k in metas:
        part = g[:, o : o + k]
        o += k
        if jnp.issubdtype(dtype, jnp.integer):
            part = jax.lax.bitcast_convert_type(part, dtype)
        elif dtype == jnp.bool_:
            part = part > 0.5
        out.append(part.reshape((g.shape[0],) + tail))
    return out


def _scatter_lane_state(full_arrs, compact_arrs, src_idx, valid):
    """Inverse of _gather_lane_state: write compacted per-lane values
    back over their source lanes (one wide row scatter; invalid slots
    dropped via an out-of-bounds target). Returns updated full arrays.
    """

    def pack(arrs, n):
        cols, metas = [], []
        for a in arrs:
            a2 = a.reshape(n, -1)
            metas.append((a.dtype, a.shape[1:], a2.shape[1]))
            if jnp.issubdtype(a.dtype, jnp.integer):
                a2 = jax.lax.bitcast_convert_type(a2, jnp.float32)
            elif a.dtype == jnp.bool_:
                a2 = a2.astype(jnp.float32)
            cols.append(a2)
        return jnp.concatenate(cols, axis=1), metas

    n_full = full_arrs[0].shape[0]
    full_rows, metas = pack(full_arrs, n_full)
    comp_rows, _ = pack(compact_arrs, src_idx.shape[0])
    tgt = jnp.where(valid, src_idx, n_full)
    merged = full_rows.at[tgt].set(comp_rows, mode="drop")
    out, o = [], 0
    for dtype, tail, k in metas:
        part = merged[:, o : o + k]
        o += k
        if jnp.issubdtype(dtype, jnp.integer):
            part = jax.lax.bitcast_convert_type(part, dtype)
        elif dtype == jnp.bool_:
            part = part > 0.5
        out.append(part.reshape((n_full,) + tail))
    return out


def _apply_backface_normal_flip(surf, gb, uv, is_back_hit, variants, back_depth_enabled):
    """Back-hit normal reversal (ref PathTracing.hlsl:219-232).
    ``gb`` may be GBuffers or PackedGBuffers."""
    if not variants.backface_textures:
        return surf
    from ..gbuffer_packed import PackedGBuffers, _unpack_oct12

    if isinstance(gb, PackedGBuffers):
        if back_depth_enabled == 2 and gb.bn_pack is not None:
            iy, ix = uv_to_pixel(uv, gb.height, gb.width)
            bw = gather2d(gb.bn_pack, iy, ix)
            bn = _unpack_oct12(bw)
            has_bn = (bw >> jnp.uint32(31)) == 1
            flipped = jnp.where(has_bn[..., None], -bn, -surf.normal)
        else:
            flipped = -surf.normal
    elif back_depth_enabled == 2 and gb.back_normal is not None:
        iy, ix = uv_to_pixel(uv, gb.height, gb.width)
        bn = gather2d(gb.back_normal, iy, ix)
        has_bn = jnp.any(bn != 0.0, axis=-1)
        flipped = jnp.where(has_bn[..., None], -bn, -surf.normal)
    else:
        flipped = -surf.normal
    normal = jnp.where(is_back_hit[..., None], flipped, surf.normal)
    return surf.replace(normal=normal)


@named_pass(PASS_PATH_TRACING)
def trace_frame(
    gb: GBuffers,
    cam: Camera,
    probes: ProbeSet,
    settings: PTSettings,
    cfg: PTConfig,
    variants: PTVariants,
    frame_index,
    history_sample: Optional[jnp.ndarray] = None,
    rng_tables=None,
    back_depth_enabled: int = 0,
    row0=0,
    lane_height: Optional[int] = None,
    march_fn=None,
    _debug_out: Optional[dict] = None,
) -> jnp.ndarray:
    """Pass 0: per-pixel multi-bounce path tracing over the G-buffer.

    Rebuild of ScreenSpacePathTracing + the pass-0 fragment shader
    (PathTracing.hlsl:385-496; shader:114-147). Returns the traced
    radiance (H, W, 3); sky pixels return the camera color (gb.emission),
    the analog of the shader's discard.

    ``row0``/``lane_height`` trace only a row block of the image while
    gathering from the full (replicated) G-buffer — the tile-sharding
    hook for the multi-chip path (SURVEY.md §5.8: replicate the
    G-buffer, shard the work). ``row0`` may be traced (a mesh
    axis_index); ``lane_height`` must be static.

    ``march_fn`` swaps the ray-march implementation (same signature as
    ``ray_march``); the fast hierarchical tracer
    (ops/pathtrace_hiz.trace_frame_hiz) injects its wavefront march
    here so every other pass-0 stage is shared with the parity path.
    """
    _march = march_fn or ray_march
    full_h, w = gb.height, gb.width
    h = full_h if lane_height is None else lane_height
    uv = pixel_uv(h, w, row0=row0, full_height=full_h)

    def _lane(img):
        """Row-block view of a full-height image."""
        if lane_height is None:
            return img
        return jax.lax.dynamic_slice_in_dim(img, jnp.asarray(row0, jnp.int32), h, 0)

    primary_raw = _lane(gb.layer1_depth() if variants.support_refraction else gb.depth)
    is_background = primary_raw == RAW_FAR_CLIP
    position_ws = world_from_uv_depth(cam.inv_view_proj, uv, primary_raw)
    view_dir = normalize(cam.position - position_ws)

    rng = make_rng(
        h, w, frame_index, rng_tables, row0=row0,
        sobol_owen=variants.sobol_owen,
    )

    # Step-size dither (ref :390-401). The reference's
    # _RAY_MARCHING_VERY_LOW double-range branch (:395-398) is dead
    # code there — the keyword is never declared by any #pragma or
    # enabled from C# (the material only carries _RAY_MARCHING_LOW) —
    # so only the 0.2-range path is rebuilt (decided round 3).
    if settings.dithering:
        dv, rng = draw(rng)
        dither = (dv * 0.2 - 0.1) * settings.dither_intensity
    else:
        dither = jnp.zeros((h, w), jnp.float32)

    # Primary-hit shortcut: bounce 0 is the G-buffer pixel itself
    # (ref :423-428). The decode also runs the refraction state machine.
    inside0 = jnp.zeros((h, w), jnp.float32)
    # Primary decode reads the G-buffer directly (uv == the pixel grid):
    # no gathers. Tiled lanes still gather (uv is offset into the full
    # buffer).
    if lane_height is None:
        primary_surf = hit_surface_from_gbuffer(
            gb, uv, inside0, variants, back_depth_enabled, direct=True
        )
    else:
        primary_surf = hit_surface_from_gbuffer(
            gb, uv, inside0, variants, back_depth_enabled
        )
    primary_dist = jnp.linalg.norm(cam.position - position_ws, axis=-1)

    # Adaptive SPP under temporal accumulation (ref :430-433).
    base_spp = settings.samples_per_pixel
    if variants.temporal_accumulation and history_sample is not None:
        boost = (primary_surf.smoothness > 0.5) | (_lane(history_sample) == 1.0)
        max_spp = max(cfg.ray_count_low_sample, base_spp)
        ray_count = jnp.where(boost, float(max_spp), float(base_spp))
    else:
        max_spp = base_spp
        ray_count = jnp.full((h, w), float(base_spp))
    inv_ray_count = 1.0 / ray_count

    # Forward-only objects emit their emission directly (ref :435-441).
    if variants.ignore_forward_objects:
        forward_only = (primary_surf.smoothness == 0.0) & ~is_background
    else:
        forward_only = jnp.zeros((h, w), bool)

    traceable = ~is_background & ~forward_only

    # Bounce-hit decoder: packed (4 gathers) or unpacked (~14 gathers).
    if cfg.use_packed_gbuffer:
        from ..gbuffer_packed import hit_surface_from_packed, pack_gbuffers

        pgb = pack_gbuffers(gb)

        def decode_at(uv_, inside_):
            return hit_surface_from_packed(
                pgb, uv_, inside_, variants, back_depth_enabled
            )

        flip_src = pgb
    else:

        def decode_at(uv_, inside_):
            return hit_surface_from_gbuffer(
                gb, uv_, inside_, variants, back_depth_enabled
            )

        flip_src = gb

    def sample_body(s, rng_s):
        """One path sample for every pixel lane; returns its radiance
        contribution. Draw layout per sample is deterministic (3 draws
        for bounce 0 + 4 per bounce), so samples can run with offset
        counters in parallel, bit-identical to sequential threading."""
        sample_active = (s < ray_count) & traceable
        color_s = jnp.zeros((h, w, 3), jnp.float32)

        # Bounce 0: shade the primary hit.
        energy = jnp.ones((h, w, 3), jnp.float32)
        res = evaluate_brdf(
            cfg,
            variants,
            rng_s,
            ray_dir=-view_dir,
            ray_pos=jnp.broadcast_to(cam.position, (h, w, 3)),
            energy=energy,
            hit=jnp.ones((h, w), bool),
            surf=primary_surf,
            hit_pos=position_ws,
            hit_dist=primary_dist,
            primary_pos=position_ws,
            probes=probes,
        )
        rng_s = res.rng
        color_s += jnp.where(
            sample_active[..., None],
            energy * res.radiance * inv_ray_count[..., None],
            0.0,
        )
        energy = res.energy
        ray_dir = res.direction
        ray_pos = res.position
        inside = primary_surf.inside_object
        alive = sample_active & jnp.any(energy != 0.0, axis=-1)

        # The sceneDistance quirk: primary raw depth pushed through
        # LinearEyeDepth once per bounce iteration (ref :463-464).
        depth_quirk = primary_raw

        # Per-lane state that may be re-domained by between-bounce
        # compaction (PTConfig.compaction_caps). Contributions are
        # accumulated in the CURRENT (compact) domain and unwound to the
        # full pixel grid after the bounce loop with one row gather per
        # compaction level — the scatter-back formulation measured
        # 29.5 ms/bounce on v5e vs 12.7 ms TOTAL for the gather cascade
        # (scripts/probe_compact_cost.py scatter3/cascade3).
        n_full = h * w
        color_flat = color_s.reshape(n_full, 3)
        dither_b, prim_pos_b, irc_b = dither, position_ws, inv_ray_count
        view_dir_b = view_dir
        # Cols only gathered when they can vary per lane in this config:
        adaptive_irc = (
            variants.temporal_accumulation and history_sample is not None
        )
        color_dom = None   # contribs accumulated in the current domain
        unwind = []        # (parent color_dom, slots, keep) per level

        for _bounce in range(settings.maximum_depth):
            if _debug_out is not None:
                _debug_out[f"alive_in_b{_bounce}"] = alive.sum(dtype=jnp.int32)

            caps = cfg.compaction_caps
            if caps is not None:
                cap = caps[min(_bounce, len(caps) - 1)]
                cap_n = min(n_full, max(1024, -(-int(cap * n_full) // 1024) * 1024))
                cur_n = alive.size
                if cap_n < cur_n:
                    idx, valid, n_drop, slots, keep = _compact_indices(
                        alive.reshape(cur_n), cap_n
                    )
                    if _debug_out is not None:
                        _debug_out[f"compact_drop_b{_bounce}"] = n_drop
                    # Gathered state: only what is both per-lane-varying
                    # and not derivable. view_dir is recomputed from the
                    # gathered primary position (bit-identical: same
                    # input bits -> same normalize result); seed is a
                    # uniform draw counter (every draw site runs for
                    # every lane), so a slice re-domains it exactly.
                    cols = [
                        ray_pos.reshape(cur_n, 3),
                        ray_dir.reshape(cur_n, 3),
                        energy.reshape(cur_n, 3),
                        prim_pos_b.reshape(cur_n, 3),
                        depth_quirk.reshape(cur_n),
                        (rng_s.pix_y.reshape(cur_n) << jnp.uint32(13))
                        | rng_s.pix_x.reshape(cur_n),
                    ]
                    if variants.support_refraction:
                        cols.append(inside.reshape(cur_n))
                    if settings.dithering:
                        cols.append(dither_b.reshape(cur_n))
                    if adaptive_irc:
                        cols.append(irc_b.reshape(cur_n))
                    g = _gather_lane_state(cols, idx)
                    ch, cw = cap_n // 128, 128
                    r2 = lambda a: a.reshape(  # noqa: E731
                        (ch, cw) + a.shape[1:]
                    )
                    ray_pos, ray_dir, energy, prim_pos_b = (
                        r2(g[0]), r2(g[1]), r2(g[2]), r2(g[3])
                    )
                    depth_quirk = r2(g[4])
                    pxy = g[5]
                    gi = 6
                    if variants.support_refraction:
                        inside = r2(g[gi]); gi += 1
                    else:
                        inside = inside.reshape(cur_n)[:cap_n].reshape(ch, cw)
                    if settings.dithering:
                        dither_b = r2(g[gi]); gi += 1
                    else:
                        dither_b = dither_b.reshape(cur_n)[:cap_n].reshape(ch, cw)
                    if adaptive_irc:
                        irc_b = r2(g[gi]); gi += 1
                    else:
                        irc_b = irc_b.reshape(cur_n)[:cap_n].reshape(ch, cw)
                    view_dir_b = normalize(cam.position - prim_pos_b)
                    rng_s = rng_s.replace(
                        pix_x=r2(pxy & jnp.uint32(0x1FFF)),
                        pix_y=r2(pxy >> jnp.uint32(13)),
                        seed=r2(rng_s.seed.reshape(cur_n)[:cap_n]),
                    )
                    alive = valid.reshape(ch, cw)
                    unwind.append((color_dom, slots, keep))
                    color_dom = jnp.zeros((cap_n, 3), jnp.float32)

            depth_quirk = linear_eye_depth(depth_quirk, cam.near, cam.far)

            march = _march(
                cfg,
                settings,
                variants,
                gb,
                cam,
                ray_pos,
                ray_dir,
                inside,
                dither_b,
                view_dir_b,
                depth_quirk,
                alive,
                # Screen-ordered pixel-grid lanes: bounce 0, full frame
                # (no tile sharding), uncompacted, no sample vmap — the
                # hiz march's home-prefix precondition
                # (ops/fused_schedule.py). The shape check rules out a
                # caps[0] < 1 re-domaining.
                home_ok=(
                    _bounce == 0 and max_spp == 1 and lane_height is None
                    and ray_pos.shape[:2] == (h, w)
                ),
            )
            surf = decode_at(march.uv, inside)
            surf = _apply_backface_normal_flip(
                surf, flip_src, march.uv, march.is_back_hit, variants, back_depth_enabled
            )
            hit_pos = march.position + surf.normal * cfg.ray_bias  # ref :235

            res = evaluate_brdf(
                cfg,
                variants,
                rng_s,
                ray_dir=ray_dir,
                ray_pos=ray_pos,
                energy=energy,
                hit=march.hit,
                surf=surf,
                hit_pos=hit_pos,
                hit_dist=march.distance,
                primary_pos=prim_pos_b,
                probes=probes,
            )
            rng_s = res.rng
            contrib = jnp.where(
                alive[..., None],
                energy * res.radiance * irc_b[..., None],
                0.0,
            )
            if color_dom is None:
                color_flat = color_flat + contrib.reshape(n_full, 3)
            else:
                color_dom = color_dom + contrib.reshape(color_dom.shape[0], 3)
            energy = jnp.where(alive[..., None], res.energy, energy)
            ray_dir = jnp.where(alive[..., None], res.direction, ray_dir)
            ray_pos = jnp.where(alive[..., None], res.position, ray_pos)
            inside = jnp.where(alive & march.hit, surf.inside_object, inside)

            alive = alive & march.hit & jnp.any(energy != 0.0, axis=-1)

            # Russian roulette (ref :481-493): survivors boosted by the
            # inverse of the max channel throughput.
            stop_energy, rng_s = draw(rng_s)
            max_energy = jnp.max(energy, axis=-1)
            survive = max_energy >= stop_energy
            energy = jnp.where(
                (alive & survive)[..., None],
                energy / jnp.maximum(max_energy, 1e-12)[..., None],
                energy,
            )
            alive = alive & survive

        # Unwind the compaction cascade: fold each compact domain's
        # accumulated contributions back into its parent through the
        # inverse slot map (a row gather — dropped overflow lanes have
        # keep=False and contribute nothing, the documented deviation).
        from .pallas_gather import row_gather

        for parent, slots, keep in reversed(unwind):
            folded = jnp.where(
                keep[:, None], row_gather(color_dom, slots), 0.0
            )
            color_dom = folded if parent is None else parent + folded
        if color_dom is not None:
            color_flat = color_flat + color_dom
        return color_flat.reshape(h, w, 3)

    draws_per_sample = 3 + settings.maximum_depth * 4
    if max_spp == 1:
        color = sample_body(0, rng)
    else:
        # vmap over the sample axis: one graph instead of max_spp copies
        # (gathers and march arithmetic batch over (S, H, W) lanes).
        def vmapped(s):
            rng_s = rng.replace(seed=rng.seed + jnp.uint32(s) * jnp.uint32(draws_per_sample))
            return sample_body(s, rng_s)

        color = jnp.sum(jax.vmap(vmapped)(jnp.arange(max_spp)), axis=0)

    # Firefly suppression: HSV value clamp (shader:141-144).
    from ..utils.image import clamp_brightness_hsv

    color = clamp_brightness_hsv(color, settings.maximum_intensity)

    # Forward-only pixels show their emission; sky keeps camera color
    # (the shader's discard keeps the blit source).
    color = jnp.where(forward_only[..., None], primary_surf.emission, color)
    color = jnp.where(is_background[..., None], _lane(gb.emission), color)
    return color
