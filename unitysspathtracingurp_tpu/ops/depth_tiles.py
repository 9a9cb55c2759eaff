"""Tiled + hierarchical depth structures for the fast march.

The parity tracer (ops/pathtrace.py) fetches depth at every march step
with a full-price XLA gather. The fast tracer (ops/pathtrace_hiz.py)
instead marches against this two-level structure:

  * ``tile_table``  — (NT, 128) f32 raw reversed-Z depth, the screen cut
    into 16x8-texel tiles (one table row per tile). A whole tile is
    fetched with ONE row gather (~3.7 ns/ray on v5e, same price as a
    scalar fetch), then any march position inside it is tested with the
    Pallas rowwise_select at ~30-50 G tests/s.
  * ``coarse_min`` / ``coarse_max`` — per 64x64-pixel cell, the min/max
    *linear eye* depth over the cell (sky linearizes to ``far``), stored
    as (chunks, 128) rows for the broadcast_table_select fast path. A
    march step whose ray depth is in front of ``cell_min`` (or more than
    the maximum possible thickness behind ``cell_max``) provably cannot
    hit any texel of the cell under the reference's hit rules
    (PathTracing.hlsl:168-190), so the step needs no texel fetch at all.

This is the TPU analog of hierarchical-Z ray marching; the structure is
rebuilt densely per frame (cheap reduction, no gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..camera import linear_eye_depth

TILE_W = 16
TILE_H = 8


def default_cell(height: int, width: int) -> int:
    """Coarse cell size in pixels: aim for ~500-2000 cells (the
    broadcast-select table stays a few chunks) while keeping cells
    small enough to discriminate depth intervals."""
    if max(height, width) >= 1024:
        return 32
    return 16


@struct.dataclass
class DepthTiles:
    tile_table: jnp.ndarray  # (NT, 128) f32 raw depth, 16x8 tiles
    # Minitile = 2x2 tiles = 32x16 px. Packed conservative f16
    # (min | max<<16) linear depth per minitile, bitcast to f32 chunk
    # rows for broadcast_table_select: the whole screen's tile-level
    # depth intervals are testable per-lane with NO memory fetch.
    mini_table: jnp.ndarray  # (chunks, 128) f32-bitcast u32
    coarse_min: jnp.ndarray  # (chunks, 128) f32 min linear depth / cell
    coarse_max: jnp.ndarray  # (chunks, 128) f32 max linear depth / cell
    height: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)
    tiles_x: int = struct.field(pytree_node=False)
    tiles_y: int = struct.field(pytree_node=False)
    cells_x: int = struct.field(pytree_node=False)
    cells_y: int = struct.field(pytree_node=False)
    cell: int = struct.field(pytree_node=False)
    minis_x: int = struct.field(pytree_node=False)

    @property
    def n_coarse_chunks(self) -> int:
        return self.coarse_min.shape[0]

    @property
    def n_mini_chunks(self) -> int:
        return self.mini_table.shape[0]


def build_depth_tiles(depth: jnp.ndarray, near, far, cell: int | None = None) -> DepthTiles:
    """Build the tile table + coarse min/max pyramid from a raw
    reversed-Z depth image (H, W). Dense ops only."""
    h, w = depth.shape
    CELL = default_cell(h, w) if cell is None else cell
    pad_y = (-h) % TILE_H
    pad_x = (-w) % TILE_W
    # Sky sentinel (raw 0.0) padding: padded texels behave like sky.
    d = jnp.pad(depth, ((0, pad_y), (0, pad_x)))
    hp, wp = h + pad_y, w + pad_x
    ty, tx = hp // TILE_H, wp // TILE_W
    tiles = (
        d.reshape(ty, TILE_H, tx, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(ty * tx, TILE_H * TILE_W)
    )

    # Minitile table: min/max linear depth per 2x2-tile (32x16 px)
    # group, conservatively rounded to f16 and packed one-u32-per-entry.
    lin_tiles = linear_eye_depth(tiles, near, far)  # sky (raw 0) -> far
    tmin = jnp.min(lin_tiles, axis=1) * (1.0 - 2.0**-9)
    tmax = jnp.max(lin_tiles, axis=1) * (1.0 + 2.0**-9)
    mx_n = -(-tx // 2)
    my_n = -(-ty // 2)
    tmin_img = jnp.full((my_n * 2, mx_n * 2), jnp.inf,
                        jnp.float32).at[:ty, :tx].set(tmin.reshape(ty, tx))
    tmax_img = jnp.full((my_n * 2, mx_n * 2), -jnp.inf,
                        jnp.float32).at[:ty, :tx].set(tmax.reshape(ty, tx))
    mmin = tmin_img.reshape(my_n, 2, mx_n, 2).min(axis=(1, 3)).reshape(-1)
    mmax = tmax_img.reshape(my_n, 2, mx_n, 2).max(axis=(1, 3)).reshape(-1)
    n_mini = my_n * mx_n
    m_chunks = -(-n_mini // 128)
    mmin = jnp.pad(mmin, (0, m_chunks * 128 - n_mini), constant_values=jnp.inf)
    mmax = jnp.pad(mmax, (0, m_chunks * 128 - n_mini), constant_values=-jnp.inf)
    packed = (
        jax.lax.bitcast_convert_type(mmin.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
        | (jax.lax.bitcast_convert_type(mmax.astype(jnp.float16), jnp.uint16).astype(jnp.uint32) << 16)
    )
    mini_table = jax.lax.bitcast_convert_type(packed, jnp.float32).reshape(m_chunks, 128)

    # Coarse cells on *linear* depth; sky (raw 0) linearizes to far.
    lin = linear_eye_depth(depth, near, far)
    cy, cx = -(-h // CELL), -(-w // CELL)
    lin_min = jnp.pad(lin, ((0, cy * CELL - h), (0, cx * CELL - w)),
                      constant_values=jnp.inf)
    lin_max = jnp.pad(lin, ((0, cy * CELL - h), (0, cx * CELL - w)),
                      constant_values=-jnp.inf)
    cmin = lin_min.reshape(cy, CELL, cx, CELL).min(axis=(1, 3)).reshape(-1)
    cmax = lin_max.reshape(cy, CELL, cx, CELL).max(axis=(1, 3)).reshape(-1)
    n_cells = cy * cx
    chunks = -(-n_cells // 128)
    cmin = jnp.pad(cmin, (0, chunks * 128 - n_cells),
                   constant_values=jnp.inf).reshape(chunks, 128)
    cmax = jnp.pad(cmax, (0, chunks * 128 - n_cells),
                   constant_values=-jnp.inf).reshape(chunks, 128)
    return DepthTiles(
        tile_table=tiles,
        mini_table=mini_table,
        coarse_min=cmin,
        coarse_max=cmax,
        height=h,
        width=w,
        tiles_x=tx,
        tiles_y=ty,
        cells_x=cx,
        cells_y=cy,
        cell=CELL,
        minis_x=mx_n,
    )


def unpack_minmax(vals_f32bits: jnp.ndarray):
    """Unpack selected mini_table entries into (min, max) f32."""
    u = jax.lax.bitcast_convert_type(vals_f32bits, jnp.uint32)
    mn = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16), jnp.float16)
    mx = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16), jnp.float16)
    return mn.astype(jnp.float32), mx.astype(jnp.float32)


def tile_of(ix: jnp.ndarray, iy: jnp.ndarray, tiles: DepthTiles):
    """(tile_row_index, texel_index_within_tile) of pixel (iy, ix)."""
    t = (iy // TILE_H) * tiles.tiles_x + (ix // TILE_W)
    texel = (iy % TILE_H) * TILE_W + (ix % TILE_W)
    return t, texel


def cell_of(ix: jnp.ndarray, iy: jnp.ndarray, tiles: DepthTiles):
    """Coarse cell index of pixel (iy, ix)."""
    return (iy // tiles.cell) * tiles.cells_x + (ix // tiles.cell)
