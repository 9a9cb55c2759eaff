"""Tiled + hierarchical depth structures for the fast march.

The parity tracer (ops/pathtrace.py) fetches depth at every march step
with a full-price XLA gather. The fast tracer (ops/pathtrace_hiz.py)
instead marches against this two-level structure:

  * ``pair_table`` — (NP, 128) rows, each covering a PAIR of
    horizontally adjacent 16x8-texel tiles (a 32x8-pixel window): word
    w holds the raw reversed-Z depth of texel w of the left tile in
    its low f16 half and of the right tile in its high half. One XLA
    row gather (~3.7 ns/ray on v5e, same price as a scalar fetch)
    therefore fetches 256 texels; march positions inside the window
    are then tested with cheap one-hot selects. f16 raw depth keeps
    ~0.05% relative linear-depth error (vs the 0.4 m thickness
    window), and the sky sentinel raw==0 is exact in f16.
  * ``mini_table`` — per 2x2-tile (32x16 px) "minitile", the min/max
    linear eye depth (sky linearizes to ``far``), conservatively
    rounded f16, packed one u32 per entry, stored as (chunks, 128)
    rows for the broadcast_table_select fast path. A march step whose
    ray depth interval [hitd - thickness, hitd] cannot intersect the
    minitile's interval provably cannot hit any of its texels under
    the reference hit rules (PathTracing.hlsl:168-190) — no fetch
    needed.

This is the TPU analog of hierarchical-Z ray marching; the structure
is rebuilt densely (no gathers) whenever the depth buffer changes and
can be reused across frames while it doesn't (static-camera offline
accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..camera import linear_eye_depth

TILE_W = 16
TILE_H = 8
# Minitile grouping in tiles: 2 wide x 2 tall = 32x16 px (one tile
# pair, vertically doubled). Coarser groupings halve the filter's
# select cost but add enough false candidates to cost more in resolve
# rounds (measured at 1080p).
MINI_TX = 2
MINI_TY = 2


@struct.dataclass
class DepthTiles:
    pair_table: jnp.ndarray  # (NP, 128) f32-bitcast u32 f16-pair raw depth
    mini_table: jnp.ndarray  # (chunks, 128) f32-bitcast u32 f16 min|max<<16
    height: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)
    tiles_x: int = struct.field(pytree_node=False)
    tiles_y: int = struct.field(pytree_node=False)
    pairs_x: int = struct.field(pytree_node=False)
    minis_x: int = struct.field(pytree_node=False)

    @property
    def n_mini_chunks(self) -> int:
        return self.mini_table.shape[0]


@struct.dataclass
class DualDepthTiles:
    """Multi-layer depth structures for the refraction / backface
    variants (PathTracing.hlsl:79-98 3-layer selection + :111-136
    backface thickness rules).

    The per-lane depth *pair* (test layer, back layer) is one of up to
    3 static combos chosen by the insideObject state (constant within
    one march call — it only changes between bounces):

      combo 0 (inside==0): (layer1, back)
      combo 1 (inside==1): (back,   opaque)   [refraction+backface]
      combo 2 (inside==2): (opaque, back)     [refraction+backface]
      refraction-only:     (layer1, none) / (opaque, none)
      backface-only:       (layer1, back)

    ``tile_table`` rows hold ONE 16x8 tile per combo, one u32 word per
    texel: low f16 = test-layer raw depth, high f16 = back-layer raw
    depth (0 = no back data, the sky sentinel). Row = combo * NT +
    tile index, so one row gather fetches both layers of the right
    combo. ``mini_table`` packs per 32x16-px minitile per combo
    f16(mmin)|f16(umax)<<16 where mmin = min linear test depth and
    umax = max over texels of (back-valid ? max(back, test) : test) —
    the conservative upper bound of the backface hit rule
    (hlsl:168-181). ``bmax_table`` packs the max valid back depth
    (-inf where no texel has valid back data): a front ray below it
    may start the reference's binary search (hlsl:149-156).
    """

    tile_table: jnp.ndarray  # (n_combos*NT, 128) u32-as-f32 test|back f16
    mini_table: jnp.ndarray  # (n_combos*chunks, 128) mmin|umax
    bmax_table: jnp.ndarray  # (n_combos*chunks, 128) bmax f16 (low half)
    height: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)
    tiles_x: int = struct.field(pytree_node=False)
    tiles_y: int = struct.field(pytree_node=False)
    minis_x: int = struct.field(pytree_node=False)
    n_combos: int = struct.field(pytree_node=False)

    @property
    def tiles_per_combo(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def chunks_per_combo(self) -> int:
        return self.mini_table.shape[0] // self.n_combos

    @property
    def n_mini_chunks(self) -> int:
        return self.mini_table.shape[0]


def _f16bits(x):
    return jax.lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)


def build_depth_tiles(depth: jnp.ndarray, near, far) -> DepthTiles:
    """Build the pair table + minitile interval table from a raw
    reversed-Z depth image (H, W). Dense ops only."""
    h, w = depth.shape
    pad_y = (-h) % (TILE_H * MINI_TY)
    pad_x = (-w) % (TILE_W * MINI_TX)
    # Sky sentinel (raw 0.0) padding: padded texels behave like sky.
    d = jnp.pad(depth, ((0, pad_y), (0, pad_x)))
    hp, wp = h + pad_y, w + pad_x
    ty, tx = hp // TILE_H, wp // TILE_W
    tiles = (
        d.reshape(ty, TILE_H, tx, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(ty, tx, TILE_H * TILE_W)
    )
    # Pair rows: left tile in low f16, right tile in high f16.
    px_n = tx // 2
    pairs = _f16bits(tiles[:, 0::2, :]) | (_f16bits(tiles[:, 1::2, :]) << 16)
    pair_table = jax.lax.bitcast_convert_type(
        pairs.reshape(ty * px_n, TILE_H * TILE_W), jnp.float32
    )

    # Minitile table: min/max linear depth per 2x2-tile (32x16 px)
    # group, conservatively rounded to f16, packed one-u32-per-entry.
    lin_tiles = linear_eye_depth(tiles, near, far)  # sky (raw 0) -> far
    tmin = jnp.min(lin_tiles, axis=2) * (1.0 - 2.0**-9)
    tmax = jnp.max(lin_tiles, axis=2) * (1.0 + 2.0**-9)
    mx_n = tx // MINI_TX
    my_n = ty // MINI_TY
    mmin = tmin.reshape(my_n, MINI_TY, mx_n, MINI_TX).min(axis=(1, 3)).reshape(-1)
    mmax = tmax.reshape(my_n, MINI_TY, mx_n, MINI_TX).max(axis=(1, 3)).reshape(-1)
    n_mini = my_n * mx_n
    m_chunks = -(-n_mini // 128)
    mmin = jnp.pad(mmin, (0, m_chunks * 128 - n_mini), constant_values=jnp.inf)
    mmax = jnp.pad(mmax, (0, m_chunks * 128 - n_mini), constant_values=-jnp.inf)
    packed = _f16bits(mmin) | (_f16bits(mmax) << 16)
    mini_table = jax.lax.bitcast_convert_type(packed, jnp.float32).reshape(
        m_chunks, 128
    )
    return DepthTiles(
        pair_table=pair_table,
        mini_table=mini_table,
        height=h,
        width=w,
        tiles_x=tx,
        tiles_y=ty,
        pairs_x=px_n,
        minis_x=mx_n,
    )


def _tile_layout(img: jnp.ndarray, h: int, w: int):
    """(H, W) -> (ty, tx, 128) single-tile texel layout, sky-padded."""
    pad_y = (-h) % (TILE_H * MINI_TY)
    pad_x = (-w) % (TILE_W * MINI_TX)
    d = jnp.pad(img, ((0, pad_y), (0, pad_x)))
    hp, wp = h + pad_y, w + pad_x
    ty, tx = hp // TILE_H, wp // TILE_W
    return (
        d.reshape(ty, TILE_H, tx, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(ty, tx, TILE_H * TILE_W)
    ), ty, tx


def build_dual_depth_tiles(combos, near, far, height: int, width: int):
    """Build DualDepthTiles from per-combo (test_depth, back_depth)
    raw reversed-Z images; ``back_depth`` may be None (no back data —
    packed as the sky sentinel 0, making back_valid false everywhere,
    which reduces the hit rule to the plain thickness window)."""
    tile_rows, mini_rows, bmax_rows = [], [], []
    ty = tx = mx_n = 0
    for test, back in combos:
        tiles_t, ty, tx = _tile_layout(test, height, width)
        if back is None:
            back_b = jnp.zeros_like(tiles_t)
        else:
            back_b, _, _ = _tile_layout(back, height, width)
        tile_rows.append(
            _f16bits(tiles_t) | (_f16bits(back_b) << 16)
        )

        lin_t = linear_eye_depth(tiles_t, near, far)
        lin_b = linear_eye_depth(back_b, near, far)
        back_ok = (back_b != 0.0) & (lin_b >= lin_t)
        upper = jnp.where(back_ok, jnp.maximum(lin_b, lin_t), lin_t)
        tmin = jnp.min(lin_t, axis=2) * (1.0 - 2.0**-9)
        tumax = jnp.max(upper, axis=2) * (1.0 + 2.0**-9)
        tbmax = jnp.max(jnp.where(back_ok, lin_b, -jnp.inf), axis=2) * (
            1.0 + 2.0**-9
        )
        mx_n = tx // MINI_TX
        my_n = ty // MINI_TY
        mmin = tmin.reshape(my_n, MINI_TY, mx_n, MINI_TX).min((1, 3)).reshape(-1)
        mumax = tumax.reshape(my_n, MINI_TY, mx_n, MINI_TX).max((1, 3)).reshape(-1)
        mbmax = tbmax.reshape(my_n, MINI_TY, mx_n, MINI_TX).max((1, 3)).reshape(-1)
        n_mini = my_n * mx_n
        m_chunks = -(-n_mini // 128)
        padn = m_chunks * 128 - n_mini
        mmin = jnp.pad(mmin, (0, padn), constant_values=jnp.inf)
        mumax = jnp.pad(mumax, (0, padn), constant_values=-jnp.inf)
        mbmax = jnp.pad(mbmax, (0, padn), constant_values=-jnp.inf)
        mini_rows.append(
            (_f16bits(mmin) | (_f16bits(mumax) << 16)).reshape(m_chunks, 128)
        )
        bmax_rows.append(_f16bits(mbmax).reshape(m_chunks, 128))

    bc = jax.lax.bitcast_convert_type
    return DualDepthTiles(
        tile_table=bc(
            jnp.concatenate(tile_rows, 0).reshape(-1, TILE_H * TILE_W),
            jnp.float32,
        ),
        mini_table=bc(jnp.concatenate(mini_rows, 0), jnp.float32),
        bmax_table=bc(jnp.concatenate(bmax_rows, 0), jnp.float32),
        height=height,
        width=width,
        tiles_x=tx,
        tiles_y=ty,
        minis_x=mx_n,
        n_combos=len(combos),
    )


def variant_combos(gb, variants):
    """The (test, back) depth-image combos of a variant set, indexed by
    the per-lane insideObject state (ref PathTracing.hlsl:79-98)."""
    layer1 = gb.layer1_depth()
    back = gb.back_depth if variants.backface_textures else None
    if variants.support_refraction:
        if back is not None:
            return [
                (layer1, back),
                (back, gb.depth),
                (gb.depth, back),
            ]
        # refraction without back data: 2-layer selection only.
        return [(layer1, None), (gb.depth, None)]
    return [(layer1, back)]


def build_home_strips(tiles: DepthTiles, h: int, w: int) -> jnp.ndarray:
    """Per-lane-block home depth strips for the fused schedule kernel's
    prefix resolve (ops/fused_schedule.py home mode).

    For each (8, 128)-pixel lane block (by, bx) of a screen-ordered
    frame, gathers the pair_table rows of HOME_BANDS vertical 8-px
    bands x HOME_PAIRS horizontal 32-px pair windows centered on the
    block: bands by-1..by+1, pairs bx*4-1..bx*4+4. Out-of-image strip
    rows are zero (the sky sentinel) — unreachable anyway, since
    candidate pixel indices are clamped to the image. Dense slicing
    only; ~3x the pair table's footprint, built once per depth buffer.

    Returns (h//8, w//128, HOME_BANDS*HOME_PAIRS, 128) f32.
    """
    from .fused_schedule import HOME_BANDS, HOME_PAIRS

    assert h % TILE_H == 0 and w % 128 == 0
    nby, nbx = h // TILE_H, w // 128
    ppb = 128 // (2 * TILE_W)  # pairs per lane block (4)
    bands = tiles.pair_table.reshape(-1, tiles.pairs_x, 128)[:nby]
    pad_b = HOME_BANDS // 2
    padded = jnp.pad(bands, ((pad_b, pad_b), (1, HOME_PAIRS - ppb - 1), (0, 0)))
    rows = []
    for bj in range(HOME_BANDS):
        band = padded[bj : bj + nby]
        for pj in range(HOME_PAIRS):
            rows.append(band[:, pj : pj + ppb * (nbx - 1) + 1 : ppb])
    return jnp.stack(rows, 2)


def tile_of(ix: jnp.ndarray, iy: jnp.ndarray, tiles):
    """(tile_row, texel_word) of pixel (iy, ix) in single-tile rows."""
    row = (iy // TILE_H) * tiles.tiles_x + (ix // TILE_W)
    texel = (iy % TILE_H) * TILE_W + (ix % TILE_W)
    return row, texel


def unpack_dual(vals_f32bits: jnp.ndarray):
    """(test_raw, back_raw) f16->f32 from a dual-layer tile word."""
    u = jax.lax.bitcast_convert_type(vals_f32bits, jnp.uint32)
    t = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16), jnp.float16)
    b = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16), jnp.float16)
    return t.astype(jnp.float32), b.astype(jnp.float32)


def unpack_f16_low(vals_f32bits: jnp.ndarray):
    """f32 value from the low f16 half (bmax_table entries)."""
    u = jax.lax.bitcast_convert_type(vals_f32bits, jnp.uint32)
    lo = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16), jnp.float16)
    return lo.astype(jnp.float32)


def unpack_minmax(vals_f32bits: jnp.ndarray):
    """Unpack selected mini_table entries into (min, max) f32."""
    u = jax.lax.bitcast_convert_type(vals_f32bits, jnp.uint32)
    mn = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16), jnp.float16)
    mx = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16), jnp.float16)
    return mn.astype(jnp.float32), mx.astype(jnp.float32)


def unpack_pair_half(vals_f32bits: jnp.ndarray, take_high: jnp.ndarray):
    """Raw f16 depth from a selected pair word: low half = left tile,
    high half = right tile."""
    u = jax.lax.bitcast_convert_type(vals_f32bits, jnp.uint32)
    half = jnp.where(take_high, u >> 16, u & 0xFFFF).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(half, jnp.float16).astype(jnp.float32)


def pair_of(ix: jnp.ndarray, iy: jnp.ndarray, tiles: DepthTiles):
    """(pair_row, texel_word, is_high_half) of pixel (iy, ix)."""
    txi = ix // TILE_W
    p = (iy // TILE_H) * tiles.pairs_x + (txi // 2)
    texel = (iy % TILE_H) * TILE_W + (ix % TILE_W)
    return p, texel, (txi % 2) == 1


def mini_of(ix: jnp.ndarray, iy: jnp.ndarray, tiles: DepthTiles):
    """Minitile index of pixel (iy, ix)."""
    return (iy // (TILE_H * MINI_TY)) * tiles.minis_x + (
        ix // (TILE_W * MINI_TX)
    )
