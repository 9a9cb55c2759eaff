"""Multi-chip scaling: SPMD sharding over a jax device Mesh.

The reference is single-GPU (SURVEY.md §2 parallelism audit: per-pixel
SIMT only, no distributed backend). The TPU-native scaling design is:

  * **Replicate the G-buffer, shard the work** — ray marching gathers
    arbitrary screen coordinates (PathTracing.hlsl:63-98), so every chip
    needs the full depth/material buffers (a 1080p G-buffer is ~60 MB).
  * **2D mesh ('spp', 'tile')**:
      - 'spp'  — data parallelism over samples-per-pixel / frame seeds:
        each chip traces the full or tiled frame with decorrelated RNG
        streams; one psum-mean over ICI combines them. This is the
        NCCL-allreduce analog and the only required collective.
      - 'tile' — row-block parallelism: each chip traces a horizontal
        band of the image over the replicated G-buffer (trace_frame's
        row0/lane_height hook).
  * Collectives are jax.lax primitives inside shard_map — XLA schedules
    them on ICI; multi-host runs use the same code over a DCN-backed
    mesh via jax.distributed initialization.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PTConfig, PTSettings, PTVariants
from ..ops.accumulate import OfflineAccumState, offline_accumulate
from ..ops.pathtrace import trace_frame


def make_mesh(n_spp: int = 1, n_tile: int = 1, devices=None) -> Mesh:
    """Build an ('spp', 'tile') mesh from the first n_spp*n_tile devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_spp * n_tile
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np

    grid = np.asarray(devices[:n]).reshape(n_spp, n_tile)
    return Mesh(grid, ("spp", "tile"))


def trace_frame_sharded(
    mesh: Mesh,
    gb,
    cam,
    probes,
    settings: PTSettings,
    cfg: PTConfig,
    variants: PTVariants,
    frame_index,
    height: int,
):
    """Trace one frame over the mesh: each (spp, tile) chip traces its row
    band with its own RNG stream; results are mean-reduced over 'spp' and
    concatenated (left sharded) over 'tile'.

    Returns the full (H, W, 3) frame, sharded over rows on 'tile'.
    """
    n_spp = mesh.shape["spp"]
    n_tile = mesh.shape["tile"]
    if height % n_tile:
        raise ValueError(f"height {height} not divisible by tile axis {n_tile}")
    block_h = height // n_tile

    # Per-spp-shard decorrelated frame seeds: stride the frame counter so
    # streams never collide (33 is the reference's per-frame stride).
    seeds = (
        jnp.asarray(frame_index, jnp.uint32)
        + jnp.arange(n_spp, dtype=jnp.uint32) * jnp.uint32(7919)
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("spp")),
        out_specs=P("tile"),
        check_vma=False,
    )
    def _shard(gb_rep, cam_rep, probes_rep, seed_shard):
        row0 = jax.lax.axis_index("tile") * block_h
        img = trace_frame(
            gb_rep,
            cam_rep,
            probes_rep,
            settings,
            cfg,
            variants,
            seed_shard[0],
            row0=row0,
            lane_height=block_h,
        )
        # The one required collective: mean over the sample axis (ICI psum).
        return jax.lax.pmean(img, "spp")

    return _shard(gb, cam, probes, seeds)


def render_step_sharded(
    mesh: Mesh,
    gb,
    cam,
    probes,
    accum: OfflineAccumState,
    settings: PTSettings,
    cfg: PTConfig,
    variants: PTVariants,
    frame_index,
    max_sample: int,
):
    """Full offline-accumulation step over the mesh — trace (sharded) +
    progressive average. The accumulation buffer stays row-sharded on
    'tile' across steps; the sample counter is replicated."""
    height = accum.accum.shape[0]
    frame = trace_frame_sharded(
        mesh, gb, cam, probes, settings, cfg, variants, frame_index, height
    )
    return frame, offline_accumulate(accum, frame, max_sample)
