"""Fused march-schedule + minitile-filter + candidate-pack Pallas kernel.

Round-3 perf lever (VERDICT r2 item 1b): the unfused hiz front half
materializes eight (S, H, W) schedule arrays in HBM (~12 ms at 1080p),
streams them through the minitile broadcast select (~15 ms) and again
through the packing kernel (~7-11 ms) — ~34 ms/bounce of almost pure
HBM traffic. This kernel runs the whole per-step chain in VMEM: for
each 1024-lane block it rebuilds the step schedule in registers
(tier/dither/growth/skip/exit exactly as ops/pathtrace_hiz.py phase 1,
itself a rebuild of PathTracing.hlsl:42-77, 239-251), tests each step
against the minitile depth intervals held in VMEM, and packs surviving
candidates into per-lane K-slot lists — reading only the per-lane ray
state (~40 B/lane) and writing only the packed fields (~200 B/lane).

The packed outputs reproduce the unfused pipeline (pack_by_slot over
the phase-1/2 arrays) bit-exactly on TPU: both sides compute the
identical explicit f32 op chain (planar mul/add projections, no
matmul), verified at 1080p on v5e (scripts/diag_fused2.py: zero
differing pixels depth-1). History note: before r3's precision fix
this kernel DISAGREED with the unfused path by whole candidate sets —
the root cause was camera.world_to_ndc's `p @ vp.T`, which XLA:TPU
lowered at default (bf16) matmul precision, putting ~1e-3 absolute
error on the unfused/parity u,v while this kernel's scalar expansion
was exact; the fix made the planar expansion the shared definition.
tests/test_fused_schedule.py gates the contract in interpret mode
(integer fields exact, distances at ulp tolerance as safety).

Covers BOTH depth-table layouts since round 4: plain ``DepthTiles``
(the headline path) and ``DualDepthTiles`` (refraction / backface
variants — per-lane combo-offset minitile lookup, the backed hit
window margin max(th, step), the search-lane / back-max candidate
escapes of ops/pathtrace_hiz.py phase 2, and a 4th packed field for
the per-candidate step size the backed hit rule needs, hlsl:181).
_debug_out instrumentation runs keep the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .depth_tiles import MINI_TX, MINI_TY, TILE_H, TILE_W


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


_LANES_PER_BLOCK = 1024  # (8, 128) per-lane vectors: full VPU tiles


def _half_to_f32_signed(h16):
    """Arithmetic f16->f32 widening that also maps sign and inf
    (Mosaic rejects 16-bit vreg bitcasts on this toolchain, see
    _unpack_minmax_vec). The DUAL tables carry ±inf sentinels
    (depth_tiles.build_dual_depth_tiles: umax/bmax pad -inf, mmin pads
    +inf, bmax is -inf where no texel has valid back data), so inf/nan
    magnitudes map to ±3e38 — every comparison against a bounded
    linear depth gives the same boolean as true ±inf, keeping the
    packs bit-identical to the unfused phase 2."""
    mag = h16 & jnp.uint32(0x7FFF)
    f32_bits = (mag + jnp.uint32(112 << 10)) << 13
    val = jax.lax.bitcast_convert_type(f32_bits, jnp.float32)
    val = jnp.where(mag < 1024, 0.0, val)
    val = jnp.where(mag >= 0x7C00, 3.0e38, val)
    return jnp.where(h16 >= 0x8000, -val, val)


def _unpack_minmax_vec(word_f32):
    """f16(min) | f16(max)<<16 -> (min_f32, max_f32), elementwise.

    Mosaic rejects 16-bit vreg bitcasts (tpu.bitcast_vreg i16->f16 is
    "Invalid vector register cast" on this toolchain), so the f16
    halves are widened arithmetically instead: for a positive normal
    f16, f32_bits = (bits16 + (112 << 10)) << 13 — exactly the result
    of .astype(float32). The PLAIN mini table only holds linear eye
    depths in [near, far] (depth_tiles: sky linearizes to far), so
    zero / subnormal halves (exp field 0) cannot occur; they map to
    0.0 defensively. (Dual tables carry ±inf sentinels and use
    _half_to_f32_signed.)"""
    u = jax.lax.bitcast_convert_type(word_f32, jnp.uint32)

    def half_to_f32(h16):
        f32_bits = (h16 + jnp.uint32(112 << 10)) << 13
        val = jax.lax.bitcast_convert_type(f32_bits, jnp.float32)
        return jnp.where(h16 < 1024, 0.0, val)

    return half_to_f32(u & 0xFFFF), half_to_f32(u >> 16)


def _unpack_minmax_vec_signed(word_f32):
    """Dual-table variant of _unpack_minmax_vec (±inf sentinels)."""
    u = jax.lax.bitcast_convert_type(word_f32, jnp.uint32)
    return (
        _half_to_f32_signed(u & 0xFFFF),
        _half_to_f32_signed(u >> 16),
    )


# Home-strip geometry (round-5 prefix resolve): per (8, 128) lane
# block of a screen-ordered frame, the depth pair rows of 3 vertical
# 8-px bands x 6 horizontal 32-px pairs centered on the block — every
# candidate within ±1 band / ±1 pair of the lane's own window can be
# exact-tested inside the schedule kernel (see fused_schedule_pack
# home mode + ops/pathtrace_hiz.build_home_strips).
HOME_BANDS = 3
HOME_PAIRS = 6
# Home slots: the prefix tests at most this many leading in-strip
# candidates per lane (further in-strip candidates fall back to the
# pack slots — semantics-free, the prefix just ends earlier).
HOME_SLOTS = 4


def fused_schedule_pack(*args, **kwargs):
    """Jit wrapper: on TPU the kernel is jitted as usual; in interpret
    mode (CPU CI) it runs EAGERLY — jitting the interpreted kernel
    hands XLA:CPU the fully unrolled s_max-step grid body as one graph
    and compile time explodes (>15 min at 64 steps, slow-compile
    alarm), while eager interpret evaluates it in seconds."""
    if _use_interpret():
        return _fused_schedule_pack(*args, **kwargs)
    return _fused_schedule_pack_jit(*args, **kwargs)


def _fused_schedule_pack(
    ray_pos,        # (N, 3) f32
    ray_dir,        # (N, 3) f32
    dither,         # (N,) f32
    large_step,     # (N,) f32 (precomputed far-tier step, ref :55)
    alive,          # (N,) bool
    is_back,        # (N,) bool (binary-search-capable lanes)
    mini_table,     # (n_chunks, 128) f32-bitcast u32 f16 min|max<<16
    scalars,        # (1, 18) f32: view_proj row-major (16) + zz + zw
    combo=None,     # dual only: (N,) i32 per-lane (test, back) combo
    search=None,    # dual only: (N,) bool search-capable lanes
    bmax_table=None,  # dual only: (n_chunks, 128) f16 bmax (low half)
    *,
    gh: int,
    gw: int,
    minis_x: int,
    n_chunks: int,
    s_max: int,
    k: int,
    max_small_step: int,
    max_medium_step: int,
    small_step_size: float,
    medium_step_size: float,
    marching_thickness: float,
    step_growth: float,
    thickness_growth: float,
    dual: bool = False,
    chunks_per_combo: int = 0,
    home_strips=None,   # (nby, nbx, HOME_BANDS*HOME_PAIRS, 128) f32
    home_shape=None,    # static (h, w): lanes are screen-ordered
):
    """Returns (pk_cum, pk_scode, pk_hist[, pk_step]) each (k, N) f32
    plus n_cand (N,) i32 — the exact outputs of the unfused
    phase-1/2/3 chain (ops/pathtrace_hiz.py) for the plain- or
    dual-DepthTiles variant.

    Home mode (``home_strips``/``home_shape`` set, plain layout only):
    lanes must be the screen-ordered pixel grid (h, w) flattened
    row-major with h % 8 == 0, w % 128 == 0. The kernel additionally
    exact-tests the leading run of each lane's candidates that falls
    inside the lane block's home strip (±1 band / ±1 pair of its own
    32x8-px depth window) against the real f16 pair depths held in
    VMEM — the same test a resolve round (ops/pathtrace_hiz.py phase
    4) would apply, on the same re-derived candidate position and
    quantized metadata, so the outcome is order-exact: tested-and-hit
    lanes pack NOTHING (the march ended before any packed candidate),
    tested-and-failed candidates are consumed (not packed), and the
    first out-of-strip candidate ends the prefix (everything after is
    packed untested, preserving first-hit order for the rounds).
    Returns an extra (11, N) f32 array: [hit, cum, diff, th, hitd,
    lcum, lhd, pidx, ixy, prev_diff, prev_sidx] — the resolve-state
    init for phase 4."""
    home = home_strips is not None
    assert not (home and dual), "home prefix: plain layout only"
    n = ray_pos.shape[0]
    if home:
        hh, hw = home_shape
        assert hh % 8 == 0 and hw % 128 == 0 and hh * hw == n
        pad = 0
    else:
        pad = (-n) % _LANES_PER_BLOCK
    if pad:
        ray_pos = jnp.pad(ray_pos, ((0, pad), (0, 0)))
        ray_dir = jnp.pad(ray_dir, ((0, pad), (0, 0)))
        dither = jnp.pad(dither, (0, pad))
        large_step = jnp.pad(large_step, (0, pad))
        alive = jnp.pad(alive, (0, pad))
        is_back = jnp.pad(is_back, (0, pad))
        if dual:
            combo = jnp.pad(combo, (0, pad))
            search = jnp.pad(search, (0, pad))
    np_ = n + pad
    nb = np_ // _LANES_PER_BLOCK
    rows = np_ // 128

    def r128(x):
        return x.reshape((hh, hw) if home else (rows, 128))

    ins = [
        r128(ray_pos[:, 0]), r128(ray_pos[:, 1]), r128(ray_pos[:, 2]),
        r128(ray_dir[:, 0]), r128(ray_dir[:, 1]), r128(ray_dir[:, 2]),
        r128(dither), r128(large_step),
        r128(alive.astype(jnp.float32)), r128(is_back.astype(jnp.float32)),
    ]
    if dual:
        ins += [
            r128(combo.astype(jnp.int32)),
            r128(search.astype(jnp.float32)),
        ]

    texel_x, texel_y = 1.0 / gw, 1.0 / gh
    th_cap = float(
        __import__("math").ceil(
            40.0 * marching_thickness * (1.0 + thickness_growth * s_max)
        )
    )

    def kern(s_ref, tab_ref, *refs):
        if dual:
            btab_ref = refs[0]
            refs = refs[1:]
        if home:
            strip_ref = refs[0]
            refs = refs[1:]
        in_refs = refs[: len(ins)]
        if dual:
            o_cum, o_scode, o_hist, o_step, o_cnt = refs[len(ins):]
        elif home:
            o_cum, o_scode, o_hist, o_cnt, o_home = refs[len(ins):]
        else:
            o_cum, o_scode, o_hist, o_cnt = refs[len(ins):]
        px = in_refs[0][:]
        py = in_refs[1][:]
        pz = in_refs[2][:]
        dx = in_refs[3][:]
        dy = in_refs[4][:]
        dz = in_refs[5][:]
        dth = in_refs[6][:]
        lstep = in_refs[7][:]
        marching = in_refs[8][:] > 0.5
        backray = in_refs[9][:] > 0.5
        if dual:
            lane_combo = in_refs[10][:]
            searchlane = in_refs[11][:] > 0.5

        m = [s_ref[0, i] for i in range(16)]  # view_proj row-major
        zz = s_ref[0, 16]
        zw = s_ref[0, 17]

        def project(cx, cy, cz):
            """world -> (u, v, raw_z) exactly as camera.world_to_ndc."""
            clipx = cx * m[0] + cy * m[1] + cz * m[2] + m[3]
            clipy = cx * m[4] + cy * m[5] + cz * m[6] + m[7]
            clipz = cx * m[8] + cy * m[9] + cz * m[10] + m[11]
            w = cx * m[12] + cy * m[13] + cz * m[14] + m[15]
            w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
            return clipx / w * 0.5 + 0.5, clipy / w * 0.5 + 0.5, clipz / w

        shape = px.shape
        u0, v0, _ = project(px, py, pz)
        last_u, last_v = u0, v0
        step = jnp.full(shape, small_step_size, jnp.float32)
        th = jnp.full(shape, marching_thickness, jnp.float32)
        cum = jnp.zeros(shape, jnp.float32)
        lcum = jnp.zeros(shape, jnp.float32)
        lhd = jnp.zeros(shape, jnp.float32)
        pidx = jnp.full(shape, -1.0, jnp.float32)
        run = jnp.zeros(shape, jnp.int32)
        slots_cum = [jnp.zeros(shape, jnp.float32) for _ in range(k)]
        slots_scode = [jnp.zeros(shape, jnp.float32) for _ in range(k)]
        slots_hist = [jnp.zeros(shape, jnp.float32) for _ in range(k)]
        if dual:
            slots_step = [jnp.zeros(shape, jnp.float32) for _ in range(k)]
            combo_off = lane_combo * (chunks_per_combo * 128)
        if home:
            # Prefix-capture state (see docstring). The step loop only
            # ROUTES candidates (leading in-strip run -> home slots,
            # everything after the first packed candidate -> the pack
            # slots) and captures the slot metadata; the exact tests
            # run once per home slot AFTER the loop (the in-loop
            # formulation put ~430 strip gathers in the body and blew
            # both the interpret-mode XLA:CPU compile and the VPU
            # budget). px0..pz0 are the march ORIGIN: the post-loop
            # test re-derives the candidate position as origin +
            # cum*dir — the resolve rounds' own formulation — because
            # the iteratively accumulated position rounds differently
            # at window edges.
            px0, py0, pz0 = px, py, pz
            by = pl.program_id(0)
            bx = pl.program_id(1)
            prefix = jnp.full(shape, True)
            run_home = jnp.zeros(shape, jnp.int32)
            hp = min(HOME_SLOTS, k)
            hs_cum = [jnp.zeros(shape, jnp.float32) for _ in range(hp)]
            hs_th = [jnp.zeros(shape, jnp.float32) for _ in range(hp)]
            hs_lcum = [jnp.zeros(shape, jnp.float32) for _ in range(hp)]
            hs_lhd = [jnp.zeros(shape, jnp.float32) for _ in range(hp)]
            hs_pidx = [jnp.zeros(shape, jnp.float32) for _ in range(hp)]
            hs_sidx = [jnp.zeros(shape, jnp.float32) for _ in range(hp)]

        q40 = lambda x, mx: jnp.clip(jnp.round(x * 40.0), 0.0, mx)  # noqa: E731

        for i in range(1, s_max + 1):
            if i == max_small_step + 1:
                step = jnp.full(shape, medium_step_size, jnp.float32)
                th = jnp.full(shape, marching_thickness, jnp.float32)
            if i == max_medium_step + 1:
                step = lstep
                th = jnp.full(shape, marching_thickness, jnp.float32)

            adv = step + step * dth
            cum = cum + adv
            # Positions accumulate iteratively (pos += adv*dir), exactly
            # as the unfused phase 1 — recomputing ray_pos + cum*dir
            # rounds differently and flips window-edge candidates.
            px = px + adv * dx
            py = py + adv * dy
            pz = pz + adv * dz
            u, v, raw = project(px, py, pz)

            skip = (
                (jnp.abs(u - last_u) < texel_x)
                & (jnp.abs(v - last_v) < texel_y)
            ) if i <= max_medium_step else jnp.zeros(shape, bool)
            in_screen = (u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0)
            exit_now = marching & ~skip & ~in_screen
            proc = marching & ~skip & in_screen

            ix = jnp.clip(
                jnp.floor(u * gw).astype(jnp.int32), 0, gw - 1
            )
            iy = jnp.clip(
                jnp.floor(v * gh).astype(jnp.int32), 0, gh - 1
            )
            hitd = 1.0 / (raw * zz + zw)

            mini = (iy // (TILE_H * MINI_TY)) * minis_x + ix // (
                TILE_W * MINI_TX
            )
            if dual:
                mini = mini + combo_off
            word = jnp.zeros(shape, jnp.float32)
            bword = jnp.zeros(shape, jnp.float32)
            mlow = mini & 127
            mchunk = mini >> 7
            for c in range(n_chunks):
                chunk = jnp.broadcast_to(tab_ref[c : c + 1, :], shape)
                g = jnp.take_along_axis(chunk, mlow, axis=1)
                word = g if n_chunks == 1 else jnp.where(mchunk == c, g, word)
                if dual:
                    bchunk = jnp.broadcast_to(btab_ref[c : c + 1, :], shape)
                    bg = jnp.take_along_axis(bchunk, mlow, axis=1)
                    bword = (
                        bg if n_chunks == 1 else jnp.where(mchunk == c, bg, bword)
                    )

            if dual:
                # Conservative dual candidate rule (pathtrace_hiz.py
                # phase 2, hlsl:149-181): backed window margin
                # max(th, step); search-capable lanes and front rays
                # below the block's max back depth escape the window.
                mmin, umax = _unpack_minmax_vec_signed(word)
                bmax = _half_to_f32_signed(
                    jax.lax.bitcast_convert_type(bword, jnp.uint32)
                    & jnp.uint32(0xFFFF)
                )
                margin = jnp.maximum(th, step)
                cand = proc & (hitd >= mmin) & (
                    (hitd - margin <= umax) | searchlane | (hitd <= bmax)
                )
            else:
                mmin, mmax = _unpack_minmax_vec(word)
                cand = proc & (hitd >= mmin) & (
                    (hitd - th <= mmax) | backray
                )

            scode = (
                float(i - 1)
                + 65.0 * (pidx + 1.0)
                + q40(th, th_cap) * 8192.0
            )
            hist = q40(lcum, 4095.0) * 4096.0 + q40(lhd, 4095.0)
            pack = cand
            if home:
                # ---- Prefix routing. The in-strip test uses the
                # ITERATIVE pixel coords (already computed for the
                # minitile filter) against the strip bounds SHRUNK by
                # one pixel: the post-loop exact test re-derives the
                # position (origin + cum*dir), which can differ from
                # the iterative one by at most one texel at a floor()
                # boundary — the shrink guarantees the re-derived
                # texel still lies inside the fetched strip, keeping
                # the routing decision semantics-free.
                y0 = by * 8
                x0 = bx * 128
                route = (
                    cand & prefix & (run_home < hp)
                    & (iy >= y0 - 7) & (iy <= y0 + 14)
                    & (ix >= x0 - 31) & (ix <= x0 + 158)
                )
                # Any candidate not routed (out-of-strip, or slots
                # full) is packed and ends the prefix: every routed
                # candidate strictly precedes every packed one.
                pack = cand & ~route
                prefix = prefix & ~pack
                for j in range(hp):
                    mj = route & (run_home == j)
                    hs_cum[j] = jnp.where(mj, cum, hs_cum[j])
                    hs_th[j] = jnp.where(mj, th, hs_th[j])
                    hs_lcum[j] = jnp.where(mj, lcum, hs_lcum[j])
                    hs_lhd[j] = jnp.where(mj, lhd, hs_lhd[j])
                    hs_pidx[j] = jnp.where(mj, pidx, hs_pidx[j])
                    hs_sidx[j] = jnp.where(mj, float(i - 1), hs_sidx[j])
                run_home = run_home + route.astype(jnp.int32)
            for j in range(k):
                mj = pack & (run == j)
                slots_cum[j] = jnp.where(mj, cum, slots_cum[j])
                slots_scode[j] = jnp.where(mj, scode, slots_scode[j])
                slots_hist[j] = jnp.where(mj, hist, slots_hist[j])
                if dual:
                    # The backed hit rule needs the step size
                    # (hlsl:181); quantized like the endpoints.
                    slots_step[j] = jnp.where(
                        mj, q40(step, 4095.0), slots_step[j]
                    )
            run = run + pack.astype(jnp.int32)

            step = jnp.where(proc, step + step * step_growth, step)
            th = jnp.where(
                proc, th + marching_thickness * thickness_growth, th
            )
            last_u = jnp.where(proc, u, last_u)
            last_v = jnp.where(proc, v, last_v)
            lcum = jnp.where(proc, cum, lcum)
            lhd = jnp.where(proc, hitd, lhd)
            pidx = jnp.where(proc, float(i - 1), pidx)
            marching = marching & ~exit_now

        if home:
            # ---- Post-loop prefix exact tests: resolve-round
            # semantics (phase 4's plain-path hit rule on the
            # re-derived position + quantized metadata, bit-for-bit),
            # one strip select per home slot, in slot (= step) order.
            strip = strip_ref[0, 0]  # (HOME_BANDS*HOME_PAIRS, 128)
            hitf = jnp.zeros(shape, bool)
            h_cum = jnp.zeros(shape, jnp.float32)
            h_diff = jnp.zeros(shape, jnp.float32)
            h_th = jnp.zeros(shape, jnp.float32)
            h_hitd = jnp.zeros(shape, jnp.float32)
            h_lcum = jnp.zeros(shape, jnp.float32)
            h_lhd = jnp.zeros(shape, jnp.float32)
            h_pidx = jnp.zeros(shape, jnp.float32)
            h_ixy = jnp.zeros(shape, jnp.float32)
            pdiff = jnp.zeros(shape, jnp.float32)
            psidx = jnp.full(shape, -1.0, jnp.float32)
            for j in range(hp):
                mj = run_home > j
                cum_j = hs_cum[j]
                th_qj = q40(hs_th[j], th_cap) * 0.025
                tx = px0 + cum_j * dx
                ty2 = py0 + cum_j * dy
                tz = pz0 + cum_j * dz
                u2, v2, raw2 = project(tx, ty2, tz)
                hitd2 = 1.0 / (raw2 * zz + zw)
                ix2 = jnp.clip(jnp.floor(u2 * gw).astype(jnp.int32), 0, gw - 1)
                iy2 = jnp.clip(jnp.floor(v2 * gh).astype(jnp.int32), 0, gh - 1)
                srow = ((iy2 >> 3) - (by - 1)) * HOME_PAIRS + (
                    (ix2 >> 5) - (bx * 4 - 1)
                )
                # Occupied slots are in-strip by the routing shrink;
                # clamp only to keep masked lanes' selects in range.
                srow = jnp.clip(srow, 0, HOME_BANDS * HOME_PAIRS - 1)
                texel = ((iy2 & 7) << 4) | (ix2 & 15)
                high = (ix2 >> 4) & 1
                word = jnp.zeros(shape, jnp.float32)
                for r in range(HOME_BANDS * HOME_PAIRS):
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(strip[r : r + 1, :], shape),
                        texel, axis=1,
                    )
                    word = jnp.where(srow == r, g, word)
                ub = jax.lax.bitcast_convert_type(word, jnp.uint32)
                bits16 = jnp.where(
                    high == 1, ub >> 16, ub & jnp.uint32(0xFFFF)
                )
                # Exact f16->f32 widening incl. subnormals (raw depth
                # lives in [0, 1]: sign/inf/nan impossible), matching
                # XLA's astype bit-for-bit. (uint32 -> f32 casts don't
                # lower on Mosaic; mant < 1024 so the int32 hop is
                # exact.)
                mant = (bits16 & jnp.uint32(0x3FF)).astype(jnp.int32)
                nrm = jax.lax.bitcast_convert_type(
                    (bits16 + jnp.uint32(112 << 10)) << 13, jnp.float32
                )
                d_raw = jnp.where(
                    (bits16 >> 10) == 0,
                    mant.astype(jnp.float32) * (2.0 ** -24),
                    nrm,
                )
                is_sky = bits16 == 0
                scene = 1.0 / (d_raw * zz + zw)
                dd = scene - hitd2
                halv = jnp.ceil(
                    jnp.log2(
                        jnp.maximum(-dd / jnp.maximum(th_qj, 1e-6), 1.0)
                    )
                )
                budget_ok = hs_sidx[j] + 1.0 + halv <= float(s_max)
                ok = mj & ~hitf
                hit_j = (
                    ok & (dd <= 0.0) & ~is_sky
                    & ((dd >= -th_qj) | (backray & budget_ok))
                )
                fail_j = ok & ~hit_j
                hitf = hitf | hit_j
                h_cum = jnp.where(hit_j, cum_j, h_cum)
                h_diff = jnp.where(hit_j, dd, h_diff)
                h_th = jnp.where(hit_j, th_qj, h_th)
                h_hitd = jnp.where(hit_j, hitd2, h_hitd)
                h_lcum = jnp.where(
                    hit_j, q40(hs_lcum[j], 4095.0) * 0.025, h_lcum
                )
                h_lhd = jnp.where(
                    hit_j, q40(hs_lhd[j], 4095.0) * 0.025, h_lhd
                )
                h_pidx = jnp.where(hit_j, hs_pidx[j], h_pidx)
                h_ixy = jnp.where(
                    hit_j, (iy2 * gw + ix2).astype(jnp.float32), h_ixy
                )
                pdiff = jnp.where(fail_j, dd, pdiff)
                psidx = jnp.where(fail_j, hs_sidx[j], psidx)
            for j in range(k):
                o_cum[0, 0, j] = slots_cum[j]
                o_scode[0, 0, j] = slots_scode[j]
                o_hist[0, 0, j] = slots_hist[j]
            # A prefix hit precedes every packed candidate: drop them.
            o_cnt[0, 0, 0] = jnp.where(hitf, 0, jnp.minimum(run, k))
            for j, fld in enumerate(
                (hitf.astype(jnp.float32), h_cum, h_diff, h_th, h_hitd,
                 h_lcum, h_lhd, h_pidx, h_ixy, pdiff, psidx)
            ):
                o_home[0, 0, j] = fld
        else:
            for j in range(k):
                o_cum[0, j] = slots_cum[j]
                o_scode[0, j] = slots_scode[j]
                o_hist[0, j] = slots_hist[j]
                if dual:
                    o_step[0, j] = slots_step[j]
            o_cnt[0, 0] = jnp.minimum(run, k)

    n_pk = 4 if dual else 3
    if home:
        nby, nbx = hh // 8, hw // 128
        n_home = HOME_BANDS * HOME_PAIRS
        lane_block = pl.BlockSpec(
            (8, 128), lambda by, bx: (by, bx), memory_space=pltpu.VMEM
        )
        out_block = pl.BlockSpec(
            (1, 1, k, 8, 128), lambda by, bx: (by, bx, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        cnt_block = pl.BlockSpec(
            (1, 1, 1, 8, 128), lambda by, bx: (by, bx, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        home_block = pl.BlockSpec(
            (1, 1, 11, 8, 128), lambda by, bx: (by, bx, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        outs = pl.pallas_call(
            kern,
            grid=(nby, nbx),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((nby, nbx, k, 8, 128), jnp.float32)]
                * n_pk
                + [jax.ShapeDtypeStruct((nby, nbx, 1, 8, 128), jnp.int32)]
                + [jax.ShapeDtypeStruct((nby, nbx, 11, 8, 128), jnp.float32)]
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [
                pl.BlockSpec(
                    (n_chunks, 128), lambda by, bx: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, n_home, 128), lambda by, bx: (by, bx, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [lane_block] * len(ins),
            out_specs=tuple(
                [out_block] * n_pk + [cnt_block, home_block]
            ),
            interpret=_use_interpret(),
        )(scalars, mini_table, home_strips, *ins)

        def to_rows(o, lead):
            # (nby, nbx, lead, 8, 128) -> (lead, N) in row-major pixels
            return (
                o.transpose(2, 0, 3, 1, 4).reshape(lead, hh * hw)
            )

        pk = [to_rows(o, k) for o in outs[:n_pk]]
        n_cand = to_rows(outs[n_pk], 1)[0]
        home_out = to_rows(outs[n_pk + 1], 11)
        return (*pk, n_cand, home_out)

    lane_block = pl.BlockSpec(
        (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_block = pl.BlockSpec(
        (1, k, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    cnt_block = pl.BlockSpec(
        (1, 1, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    table_specs = [
        pl.BlockSpec(
            (n_chunks, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    tables = [mini_table]
    if dual:
        table_specs.append(
            pl.BlockSpec(
                (n_chunks, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        )
        tables.append(bmax_table)
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nb, k, 8, 128), jnp.float32)] * n_pk
            + [jax.ShapeDtypeStruct((nb, 1, 8, 128), jnp.int32)]
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + table_specs
        + [lane_block] * len(ins),
        out_specs=tuple([out_block] * n_pk + [cnt_block]),
        interpret=_use_interpret(),
    )(scalars, *tables, *ins)

    pk = [
        o.transpose(1, 0, 2, 3).reshape(k, np_)[:, :n] for o in outs[:n_pk]
    ]
    n_cand = outs[n_pk].reshape(np_)[:n]
    return (*pk, n_cand)


_fused_schedule_pack_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "gh", "gw", "minis_x", "n_chunks", "s_max", "k",
        "max_small_step", "max_medium_step", "small_step_size",
        "medium_step_size", "marching_thickness", "step_growth",
        "thickness_growth", "dual", "chunks_per_combo", "home_shape",
    ),
)(_fused_schedule_pack)


def schedule_scalars(cam) -> jnp.ndarray:
    """The (1, 18) SMEM operand: view_proj row-major + the
    linear-eye-depth coefficients (camera.linear_eye_depth)."""
    zz = 1.0 / cam.near - 1.0 / cam.far
    zw = 1.0 / cam.far
    vp = jnp.asarray(cam.view_proj, jnp.float32).reshape(16)
    return jnp.concatenate(
        [vp, jnp.asarray([zz, zw], jnp.float32)]
    ).reshape(1, 18)
