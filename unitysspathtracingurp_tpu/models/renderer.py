"""Frame orchestrator — the renderer-feature analog.

Rebuild of ScreenSpacePathTracingAccumulation.cs (C9/C9a/C9b): owns the
per-frame pass pipeline, the accumulation state machines, invalidation
rules, and the frame counter. Host control flow mirrors the C# side;
all pixel work happens in jitted functions over pytrees.

Pipeline per frame (== the reference's pass order, SURVEY.md §3.2-3.4):

  offline mode (DenoiserType.OFFLINE, static camera):
    trace (pass 0) -> progressive average (pass 3) -> progress bar (pass 4)

  real-time modes (TEMPORAL / SPATIAL_TEMPORAL):
    trace (pass 0)
    [SPATIAL_TEMPORAL] À-Trous ping-pong x(2q+1)      (pass 5)
    temporal reprojection (pass 1, MRT color+count)
    history updates: emission (pass 6), color/count (blits), depth (pass 2)

Invalidation (cs:772-823): camera matrix change, scene-light change
(caller-provided key), play-state pause -> restart offline accumulation.
Checkpoint/resume: the state pytrees serialize with save()/load().
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..camera import Camera, pixel_spread_angle_tangent
from ..config import (
    DenoiserType,
    MAX_SAMPLES_LOW_PRECISION,
    PTConfig,
    PTSettings,
    SpatialDenoiseQuality,
    ThicknessMode,
)
from ..gbuffer import GBuffers
from ..ops.accumulate import OfflineAccumState, add_convergence_cue, offline_accumulate
from ..ops.atrous import atrous_filter
from ..ops.envprobe import ProbeSet, constant_probe
from ..ops.pathtrace import trace_frame
from ..ops.rng import advance_frame_index
from ..ops.temporal import TemporalState, temporal_reproject


def _trace(
    gb, cam, probes, settings, cfg, variants, frame_index,
    back_depth_enabled, use_hiz, tiles, rng_tables, history_sample=None,
):
    """Pass-0 dispatch: the production kernel is the hiz wavefront
    whenever the variant set supports it (the reference always runs its
    one production kernel, ScreenSpacePathTracingAccumulation.cs:536-549);
    the parity tracer covers the rest."""
    if use_hiz:
        from ..ops.pathtrace_hiz import trace_frame_hiz

        return trace_frame_hiz(
            gb, cam, probes, settings, cfg, variants, frame_index,
            history_sample=history_sample, rng_tables=rng_tables,
            back_depth_enabled=back_depth_enabled, tiles=tiles,
        )
    return trace_frame(
        gb, cam, probes, settings, cfg, variants, frame_index,
        history_sample=history_sample, rng_tables=rng_tables,
        back_depth_enabled=back_depth_enabled,
    )


@partial(
    jax.jit,
    static_argnames=(
        "settings", "cfg", "variants", "back_depth_enabled", "max_sample", "use_hiz"
    ),
)
def _offline_step(
    gb, cam, probes, state, settings, cfg, variants, frame_index,
    back_depth_enabled, max_sample, paused, use_hiz=False, tiles=None,
    rng_tables=None,
):
    traced = _trace(
        gb, cam, probes, settings, cfg, variants, frame_index,
        back_depth_enabled, use_hiz, tiles, rng_tables,
    )
    new_state = offline_accumulate(state, traced, max_sample, paused)
    return traced, new_state


@partial(
    jax.jit,
    static_argnames=(
        "settings", "cfg", "variants", "back_depth_enabled", "spatial_passes",
        "use_hiz",
    ),
)
def _realtime_step(
    gb, cam, probes, t_state, settings, cfg, variants, frame_index,
    back_depth_enabled, spatial_passes, pixel_spread_tangent,
    use_hiz=False, tiles=None, rng_tables=None,
):
    traced = _trace(
        gb, cam, probes, settings, cfg, variants, frame_index,
        back_depth_enabled, use_hiz, tiles, rng_tables,
        history_sample=t_state.history_sample,
    )
    emission = gb.emission  # the _PathTracingEmissionTexture copy (pass 6 src)
    color = traced
    for _ in range(spatial_passes):
        color = atrous_filter(
            color, gb, emission, t_state.history_sample, cfg,
            support_refraction=variants.support_refraction,
        )
    result = temporal_reproject(
        color, gb, cam, t_state, emission, cfg,
        temporal_intensity=settings.temporal_intensity,
        pixel_spread_angle_tangent=pixel_spread_tangent,
        support_refraction=variants.support_refraction,
    )
    hist_dtype = t_state.history_color.dtype
    new_state = TemporalState(
        history_color=result.color.astype(hist_dtype),
        history_sample=result.sample_count,
        history_depth=gb.layer1_depth(),
        history_emission=emission.astype(hist_dtype),
        prev_inv_view_proj=cam.inv_view_proj,
        prev_view_proj=cam.view_proj,
        prev_camera_position=cam.position,
    )
    return result.color, new_state


class Renderer:
    """Stateful frame renderer. Construct once per camera/resolution;
    call render_frame(gbuffers, camera) per frame."""

    def __init__(
        self,
        settings: PTSettings,
        height: int,
        width: int,
        cfg: PTConfig = PTConfig(),
        probes: Optional[ProbeSet] = None,
        fov_y: float = np.radians(60.0),
        hdr_64bit: bool = True,
        display_size: Optional[tuple] = None,
        mesh=None,
        kernel: str = "auto",
    ):
        """``display_size=(H_out, W_out)`` enables the render-scale path
        (reference: renderScale 0.7 demo / 0.5 mobile guidance,
        README.md:58): trace at (height, width), upscale the displayed
        image with the edge-adaptive upscaler.

        ``mesh``: an ('spp', 'tile') jax Mesh (parallel.dist.make_mesh)
        — offline frames then trace sharded across chips (replicated
        G-buffer, pmean over the sample axis, row-band tiles).

        ``hdr_64bit=False`` is the reference's 11-bit-float HDR target
        (URP-HighFidelity.asset:29-31): accumulation/history buffers
        switch to bfloat16 and the offline budget caps at 64 samples
        (cs:810-814).

        ``kernel``: "auto" dispatches the fast hiz wavefront tracer
        whenever the variant set supports it and the parity tracer
        otherwise; "hiz"/"xla" force one (forcing "hiz" on an
        unsupported variant set is an error, never a silent fallback)."""
        settings.validate()
        self.settings = settings
        self.cfg = cfg
        self.variants = settings.variants()
        self.height, self.width = height, width
        self.probes = probes or ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0]))
        self.frame_index = 0
        self.paused = False
        # Offline budget: 11-bit HDR caps at 64 samples (cs:810-814).
        self.max_sample = (
            settings.maximum_samples if hdr_64bit else
            min(settings.maximum_samples, MAX_SAMPLES_LOW_PRECISION)
        )
        self.accum_dtype = jnp.float32 if hdr_64bit else jnp.bfloat16
        self.pixel_spread_tangent = pixel_spread_angle_tangent(fov_y, width, height)
        self.back_depth_enabled = int(settings.accurate_thickness.value)
        self.spatial_passes = (
            2 * settings.spatial_denoise_quality.value + 1
            if settings.denoiser == DenoiserType.SPATIAL_TEMPORAL
            else 0
        )

        if kernel == "auto":
            # hiz covers every variant set since round 3 (refraction/
            # backface march against DualDepthTiles).
            self.kernel = "hiz"
        elif kernel in ("hiz", "xla"):
            self.kernel = kernel
        else:
            raise ValueError(f"unknown kernel {kernel!r} (auto|hiz|xla)")
        # DepthTiles reuse across static-depth frames; keyed by buffer
        # identity (a held reference, so ids can't be recycled).
        self._tiles = None
        self._tiles_src = None
        self._tiles_key = None

        # Blue-noise mode builds its tables once (the reference binds
        # the three noise textures once at feature setup, cs:401-420).
        if self.variants.blue_noise:
            from ..ops.blue_noise import BlueNoiseTables

            self.rng_tables = BlueNoiseTables()
        else:
            self.rng_tables = None

        self.offline_state = OfflineAccumState.create(
            height, width, dtype=self.accum_dtype
        )
        self.temporal_state: Optional[TemporalState] = None
        self._prev_vp: Optional[np.ndarray] = None
        self._scene_key = None
        self.display_size = display_size
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.dist import render_step_sharded

            def _step(gb, cam, probes, accum, frame_index, tiles, rng_tables):
                return render_step_sharded(
                    mesh, gb, cam, probes, accum,
                    self.settings, self.cfg, self.variants,
                    frame_index, self.max_sample,
                    use_hiz=self.kernel == "hiz", tiles=tiles,
                    rng_tables=rng_tables,
                )

            self._sharded_step = jax.jit(
                _step, static_argnames=()
            )

    # ----- invalidation (cs:772-823) -----
    def _check_invalidation(self, cam: Camera, scene_key=None):
        vp = np.asarray(cam.view_proj)
        moved = self._prev_vp is not None and not np.allclose(vp, self._prev_vp)
        scene_changed = scene_key is not None and scene_key != self._scene_key
        if moved or scene_changed or self._prev_vp is None:
            self.offline_state = self.offline_state.replace(
                sample=jnp.zeros((), jnp.int32)
            )
        self._prev_vp = vp
        self._scene_key = scene_key

    @property
    def sample(self) -> int:
        return int(self.offline_state.sample)

    def bind_probes(self, probe_list, positions, cam: Camera):
        """Per-frame probe binding (the PathTracingSetReflectionProbe
        behavior, C11): select the two closest probes to the camera and
        make them the tracer's environment fallback."""
        from .probes import closest_probes

        self.probes = closest_probes(probe_list, positions, np.asarray(cam.position))

    def _get_tiles(self, gb: GBuffers, cam: Camera):
        """Hierarchical depth structure for the hiz kernel, rebuilt only
        when the depth buffer (or clip range) changes — static-camera
        offline frames re-render the same G-buffer, so the build
        (~10 ms at 1080p) amortizes to zero."""
        if self.kernel != "hiz":
            return None
        src = gb.layer1_depth()
        key = (src, float(cam.near), float(cam.far))
        if self._tiles is None or self._tiles_src != key[1:] or (
            self._tiles_key is not src
        ):
            from ..ops.pathtrace_hiz import build_tiles_for

            self._tiles = jax.jit(
                build_tiles_for, static_argnames=("variants",)
            )(gb, cam, self.variants)
            self._tiles_key = src  # held reference: ids can't recycle
            self._tiles_src = key[1:]
        return self._tiles

    def render_frame(self, gb: GBuffers, cam: Camera, scene_key=None):
        """Render one frame; returns the displayed image (H, W, 3)."""
        if not self.settings.state:
            return gb.emission

        denoiser = self.settings.denoiser

        if denoiser in (DenoiserType.NONE, DenoiserType.OFFLINE):
            self._check_invalidation(cam, scene_key)
            # Skip tracing once converged (cs:436-438) — pure host control.
            if denoiser == DenoiserType.OFFLINE and self.sample >= self.max_sample:
                image = self.offline_state.accum
            elif self.mesh is not None:
                traced, self.offline_state = self._sharded_step(
                    gb, cam, self.probes, self.offline_state,
                    jnp.uint32(self.frame_index),
                    self._get_tiles(gb, cam), self.rng_tables,
                )
                image = traced if denoiser == DenoiserType.NONE else self.offline_state.accum
            else:
                traced, self.offline_state = _offline_step(
                    gb, cam, self.probes, self.offline_state,
                    self.settings, self.cfg, self.variants,
                    jnp.uint32(self.frame_index), self.back_depth_enabled,
                    self.max_sample, self.paused,
                    use_hiz=self.kernel == "hiz",
                    tiles=self._get_tiles(gb, cam),
                    rng_tables=self.rng_tables,
                )
                image = traced if denoiser == DenoiserType.NONE else self.offline_state.accum
            if denoiser == DenoiserType.OFFLINE and self.settings.progress_bar:
                image = add_convergence_cue(
                    image, self.offline_state.sample, self.max_sample,
                    self.height, self.width,
                )
        else:
            if self.temporal_state is None:
                self.temporal_state = TemporalState.create(
                    self.height, self.width, cam, dtype=self.accum_dtype
                )
            if self.mesh is not None:
                from ..parallel.dist import realtime_step_sharded

                image, self.temporal_state = realtime_step_sharded(
                    self.mesh, gb, cam, self.probes, self.temporal_state,
                    self.settings, self.cfg, self.variants,
                    jnp.uint32(self.frame_index), self.pixel_spread_tangent,
                    self.spatial_passes, self.back_depth_enabled,
                    use_hiz=self.kernel == "hiz",
                    tiles=self._get_tiles(gb, cam),
                    rng_tables=self.rng_tables,
                )
            else:
                image, self.temporal_state = _realtime_step(
                    gb, cam, self.probes, self.temporal_state,
                    self.settings, self.cfg, self.variants,
                    jnp.uint32(self.frame_index), self.back_depth_enabled,
                    self.spatial_passes, self.pixel_spread_tangent,
                    use_hiz=self.kernel == "hiz",
                    tiles=self._get_tiles(gb, cam),
                    rng_tables=self.rng_tables,
                )

        self.frame_index = advance_frame_index(self.frame_index)
        if self.display_size is not None:
            from ..ops.upscale import easu_like_upscale

            image = easu_like_upscale(image, *self.display_size)
        return image

    # ----- checkpoint / resume (SURVEY.md §5.4) -----
    def save(self, path: str):
        state = {
            "frame_index": self.frame_index,
            "offline_accum": np.asarray(self.offline_state.accum),
            "offline_sample": np.asarray(self.offline_state.sample),
        }
        if self._prev_vp is not None:
            state["prev_vp"] = self._prev_vp
        if self.temporal_state is not None:
            for k, v in dataclasses.asdict(self.temporal_state).items():
                state[f"temporal_{k}"] = np.asarray(v)
        np.savez(path, **state)

    def load(self, path: str):
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        self.frame_index = int(data["frame_index"])
        self.offline_state = OfflineAccumState(
            accum=jnp.asarray(data["offline_accum"]),
            sample=jnp.asarray(data["offline_sample"]),
        )
        if "prev_vp" in data:
            self._prev_vp = data["prev_vp"]
        if "temporal_history_color" in data:
            self.temporal_state = TemporalState(
                **{
                    k: jnp.asarray(data[f"temporal_{k}"])
                    for k in TemporalState.__dataclass_fields__  # type: ignore[attr-defined]
                    if f"temporal_{k}" in data
                }
            )
