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

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PTConfig, PTSettings, PTVariants
from ..ops.accumulate import OfflineAccumState, offline_accumulate
from ..ops.atrous import atrous_filter
from ..ops.pathtrace import trace_frame
from ..ops.temporal import TemporalState, temporal_reproject

# À-Trous halo: the randomized dilation radius reaches 9 texels
# (shader:497), so 9 boundary rows cover every stencil tap.
ATROUS_HALO = 9


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed for multi-host meshes (SURVEY.md §5.8:
    same collectives code over a DCN-backed mesh across hosts).

    On single-process runs (no coordinator configured anywhere) this is
    a no-op. On TPU pods the arguments are auto-detected from the
    environment when omitted (jax.distributed.initialize contract).
    Returns the number of processes. Call once, before any backend use;
    then build meshes from jax.devices() as usual — make_mesh over the
    global device list gives each host its local shards automatically
    under shard_map.
    """
    if (
        coordinator_address is None
        and num_processes is None
        and "COORDINATOR_ADDRESS" not in os.environ
        and "JAX_COORDINATOR_ADDRESS" not in os.environ
        and "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ
    ):
        return 1  # single-host: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


def make_mesh(n_spp: int = 1, n_tile: int = 1, devices=None) -> Mesh:
    """Build an ('spp', 'tile') mesh from the first n_spp*n_tile devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_spp * n_tile
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np

    grid = np.asarray(devices[:n]).reshape(n_spp, n_tile)
    return Mesh(grid, ("spp", "tile"))


def _dispatch_trace(
    gb, cam, probes, settings, cfg, variants, seed,
    use_hiz, tiles, rng_tables, row0, lane_height, history_sample=None,
    back_depth_enabled=0, n_rounds=None,
):
    """Kernel dispatch inside a shard: the hiz wavefront whenever the
    variant set supports it (same production-kernel rule as the
    Renderer), marching the row band against the FULL-frame depth
    structures (replicated, like the G-buffer)."""
    if use_hiz:
        from ..ops.pathtrace_hiz import trace_frame_hiz

        return trace_frame_hiz(
            gb, cam, probes, settings, cfg, variants, seed,
            history_sample=history_sample, rng_tables=rng_tables,
            back_depth_enabled=back_depth_enabled,
            tiles=tiles, row0=row0, lane_height=lane_height,
            n_rounds=n_rounds,
        )
    return trace_frame(
        gb, cam, probes, settings, cfg, variants, seed,
        history_sample=history_sample, rng_tables=rng_tables,
        back_depth_enabled=back_depth_enabled,
        row0=row0, lane_height=lane_height,
    )


def _prep_tiles(gb, cam, use_hiz, tiles, variants):
    if use_hiz and tiles is None:
        from ..ops.pathtrace_hiz import build_tiles_for

        tiles = build_tiles_for(gb, cam, variants)
    return tiles


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
    use_hiz: bool = False,
    tiles=None,
    rng_tables=None,
    n_rounds=None,
):
    """Trace one frame over the mesh: each (spp, tile) chip traces its row
    band with its own RNG stream; results are mean-reduced over 'spp' and
    concatenated (left sharded) over 'tile'.

    ``n_rounds`` caps the hiz resolve-round budget (pathtrace_hiz
    default_rounds otherwise); the dryrun uses it to bound compile size.

    Returns the full (H, W, 3) frame, sharded over rows on 'tile'.
    """
    n_spp = mesh.shape["spp"]
    n_tile = mesh.shape["tile"]
    if height % n_tile:
        raise ValueError(f"height {height} not divisible by tile axis {n_tile}")
    block_h = height // n_tile
    tiles = _prep_tiles(gb, cam, use_hiz, tiles, variants)

    # Per-spp-shard decorrelated frame seeds: stride the frame counter so
    # streams never collide (33 is the reference's per-frame stride).
    seeds = (
        jnp.asarray(frame_index, jnp.uint32)
        + jnp.arange(n_spp, dtype=jnp.uint32) * jnp.uint32(7919)
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("spp"), P(), P()),
        out_specs=P("tile"),
        check_vma=False,
    )
    def _shard(gb_rep, cam_rep, probes_rep, seed_shard, tiles_rep, tables_rep):
        row0 = jax.lax.axis_index("tile") * block_h
        img = _dispatch_trace(
            gb_rep, cam_rep, probes_rep, settings, cfg, variants,
            seed_shard[0], use_hiz, tiles_rep, tables_rep,
            row0, block_h, n_rounds=n_rounds,
        )
        # The one required collective: mean over the sample axis (ICI psum).
        return jax.lax.pmean(img, "spp")

    return _shard(gb, cam, probes, seeds, tiles, rng_tables)


def _pad_rows_edge(tree, halo: int, full_h: int):
    """Edge-replicate ``halo`` rows on top/bottom of every (H, W[,C])
    image in a pytree (so band slices at row0-halo are always valid and
    boundary taps clamp to the true image edge, matching the unsharded
    stencil)."""

    def f(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] == full_h:
            return jnp.concatenate(
                [jnp.repeat(x[:1], halo, 0), x, jnp.repeat(x[-1:], halo, 0)], 0
            )
        return x

    return jax.tree.map(f, tree)


def _band(tree, start, rows: int, padded_h: int):
    """Dynamic row-band slice of every padded image in a pytree."""

    def f(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] == padded_h:
            return jax.lax.dynamic_slice_in_dim(x, start, rows, 0)
        return x

    return jax.tree.map(f, tree)


def realtime_step_sharded(
    mesh: Mesh,
    gb,
    cam,
    probes,
    t_state: TemporalState,
    settings: PTSettings,
    cfg: PTConfig,
    variants: PTVariants,
    frame_index,
    pixel_spread_tangent,
    spatial_passes: int,
    back_depth_enabled: int = 0,
    use_hiz: bool = False,
    tiles=None,
    rng_tables=None,
    n_rounds=None,
):
    """One real-time (temporal + À-Trous) step over the mesh
    (SURVEY.md §5.8; VERDICT r1 item 6).

    Sharding design:
      * The trace — ~95% of the frame — is row-sharded on 'tile' with
        decorrelated RNG streams pmean-reduced over 'spp'.
      * The À-Trous stencil runs on the row bands with a ppermute
        **halo exchange** per pass (9 rows: the max dilation radius);
        true image edges replicate their own boundary rows so clamping
        matches the unsharded filter exactly.
      * Temporal reprojection gathers history at arbitrary reprojected
        screen positions (motion + virtual specular reprojection), so
        the history state follows the same design rule as the G-buffer:
        **replicate the state, shard the work that dominates**. The
        denoised bands are all_gathered over ICI and the cheap
        reprojection pass runs replicated; its inputs/outputs stay
        bit-identical to the unsharded pipeline.

    Returns (color, new_state), both replicated.
    """
    n_spp = mesh.shape["spp"]
    n_tile = mesh.shape["tile"]
    height = gb.height
    if height % n_tile:
        raise ValueError(f"height {height} not divisible by tile axis {n_tile}")
    bh = height // n_tile
    halo = min(ATROUS_HALO, bh)
    tiles = _prep_tiles(gb, cam, use_hiz, tiles, variants)

    seeds = (
        jnp.asarray(frame_index, jnp.uint32)
        + jnp.arange(n_spp, dtype=jnp.uint32) * jnp.uint32(7919)
    )
    fwd = [(i, i + 1) for i in range(n_tile - 1)]  # band i -> band i+1
    bwd = [(i + 1, i) for i in range(n_tile - 1)]

    emission = gb.emission  # the _PathTracingEmissionTexture copy
    gb_pad = _pad_rows_edge(gb, halo, height)
    emission_pad = _pad_rows_edge(emission, halo, height)
    sample_pad = _pad_rows_edge(t_state.history_sample, halo, height)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P("spp"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _shard(gb_rep, gb_pad_rep, em_pad, samp_pad, probes_rep, cam_rep,
               state_rep, seed_shard, tiles_rep, tables_rep):
        ti = jax.lax.axis_index("tile")
        row0 = ti * bh
        traced = _dispatch_trace(
            gb_rep, cam_rep, probes_rep, settings, cfg, variants,
            seed_shard[0], use_hiz, tiles_rep, tables_rep, row0, bh,
            history_sample=state_rep.history_sample,
            back_depth_enabled=back_depth_enabled, n_rounds=n_rounds,
        )
        traced = jax.lax.pmean(traced, "spp")

        # Guide bands with halo (padded images: start row0 is valid).
        gb_band = _band(gb_pad_rep, row0, bh + 2 * halo, height + 2 * halo)
        em_band = _band(em_pad, row0, bh + 2 * halo, height + 2 * halo)
        samp_band = _band(samp_pad, row0, bh + 2 * halo, height + 2 * halo)

        color = traced
        for _ in range(spatial_passes):
            # Halo exchange: my top rows come from the band above's
            # bottom rows (and vice versa); true edges self-replicate.
            from_above = jax.lax.ppermute(color[-halo:], "tile", fwd)
            from_below = jax.lax.ppermute(color[:halo], "tile", bwd)
            from_above = jnp.where(
                (ti == 0), jnp.repeat(color[:1], halo, 0), from_above
            )
            from_below = jnp.where(
                (ti == n_tile - 1), jnp.repeat(color[-1:], halo, 0), from_below
            )
            ext = jnp.concatenate([from_above, color, from_below], 0)
            ext = atrous_filter(
                ext, gb_band, em_band, samp_band, cfg,
                support_refraction=variants.support_refraction,
                row_offset=row0 - halo,
            )
            color = ext[halo : halo + bh]

        full = jax.lax.all_gather(color, "tile", axis=0, tiled=True)
        result = temporal_reproject(
            full, gb_rep, cam_rep, state_rep, gb_rep.emission, cfg,
            temporal_intensity=settings.temporal_intensity,
            pixel_spread_angle_tangent=pixel_spread_tangent,
            support_refraction=variants.support_refraction,
        )
        return result.color, result.sample_count

    color, sample_count = _shard(
        gb, gb_pad, emission_pad, sample_pad, probes, cam, t_state, seeds,
        tiles, rng_tables,
    )
    hist_dtype = t_state.history_color.dtype
    new_state = TemporalState(
        history_color=color.astype(hist_dtype),
        history_sample=sample_count,
        history_depth=gb.layer1_depth(),
        history_emission=emission.astype(hist_dtype),
        prev_inv_view_proj=cam.inv_view_proj,
        prev_view_proj=cam.view_proj,
        prev_camera_position=cam.position,
    )
    return color, new_state


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
    use_hiz: bool = False,
    tiles=None,
    rng_tables=None,
    n_rounds=None,
):
    """Full offline-accumulation step over the mesh — trace (sharded) +
    progressive average. The accumulation buffer stays row-sharded on
    'tile' across steps; the sample counter is replicated."""
    height = accum.accum.shape[0]
    frame = trace_frame_sharded(
        mesh, gb, cam, probes, settings, cfg, variants, frame_index, height,
        use_hiz=use_hiz, tiles=tiles, rng_tables=rng_tables,
        n_rounds=n_rounds,
    )
    return frame, offline_accumulate(accum, frame, max_sample)
