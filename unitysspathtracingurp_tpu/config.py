"""Configuration system.

Three tiers, mirroring the reference's config architecture
(reference: PathTracingConfig.hlsl compile-time constants;
ScreenSpacePathTracing.shader:47-55 keyword variant axes;
PathTracingVolume.cs:17-71 runtime volume settings):

  * ``PTConfig``   — compile-time constants baked into kernels (static).
  * ``PTVariants`` — shader-keyword analog: static booleans that select
                     jit specializations of the pass functions.
  * ``PTSettings`` — per-frame runtime settings with the same fields,
                     ranges, and defaults as the reference volume
                     component. Loop bounds (steps/bounces/spp) are
                     static jit arguments: changing them recompiles.
"""

from __future__ import annotations

import dataclasses
import enum


class NoiseMethod(enum.Enum):
    """Per-pixel random source (reference: PathTracingVolume.cs:111-119).

    SOBOL_OWEN is a beyond-reference extension: an unbounded
    hash-based Owen-scrambled Sobol sampler for offline convergence runs
    (the reference's blue-noise sequence wraps every 256 samples; see
    ops/rng._sobol_owen_sample)."""

    HASHED_RANDOM = 0
    BLUE_NOISE = 1
    SOBOL_OWEN = 2


class DenoiserType(enum.Enum):
    """Accumulation/denoise mode (reference: PathTracingVolume.cs:138-152)."""

    NONE = 0
    OFFLINE = 1  # progressive averaging, static camera ("Offline" / Camera)
    TEMPORAL = 2  # motion-vector reprojection ("PerObject")
    SPATIAL_TEMPORAL = 3  # À-Trous spatial + temporal ("PerObjectBlur")


class SpatialDenoiseQuality(enum.Enum):
    """À-Trous ping-pong pass count = 2*q+1 (reference: cs:52-65, 866-876)."""

    LOW = 0  # 1 pass
    MEDIUM = 1  # 3 passes
    HIGH = 2  # 5 passes


class ThicknessMode(enum.Enum):
    """Backface data source (reference: ScreenSpacePathTracingAccumulation.cs:34-50)."""

    CONSTANT = 0  # no backface textures; constant thickness assumption
    DEPTH_ONLY = 1  # backface depth available
    DEPTH_NORMALS = 2  # backface depth + normals available


@dataclasses.dataclass(frozen=True)
class PTConfig:
    """Compile-time tracer constants (reference: PathTracingConfig.hlsl:41-98)."""

    # Adaptive ray-march step schedule: 6 small steps, then 12 medium steps,
    # then large steps (ref config :43-44).
    max_small_step: int = 6
    max_medium_step: int = 18  # MAX_SMALL_STEP + 12
    small_step_size: float = 0.005  # meters (ref :48)
    medium_step_size: float = 0.1  # meters (ref :49)

    # Assumed object thickness per tier (ref :52-54). The small/medium
    # values are DEAD CODE in the reference too: PathTracing.hlsl writes
    # its per-tier `thickness` variable (:44-58) but every hit rule reads
    # only `marchingThickness` (:111-136). Kept to document the quirk.
    marching_thickness: float = 0.4
    marching_thickness_small: float = 0.0075  # dead in reference
    marching_thickness_medium: float = 0.1  # dead in reference

    ray_bias: float = 1.0e-4  # self-intersection offset along normal (ref :60)
    use_disney_diffuse: bool = True  # ref :71

    # Temporal accumulation (ref :77-95).
    max_accum_frame_num: int = 8
    ray_count_low_sample: int = 4
    max_reprojection_distance: float = 0.02
    max_pixel_tolerance: float = 4.0
    projection_epsilon: float = 1.0e-6
    reflection_history_rejection_threshold: float = 0.75
    roughness_accumulation_threshold: float = 0.5
    spec_accum_curve: float = 1.0
    spec_accum_base_power: float = 1.0

    clamp_max: float = 65472.0  # HALF_MAX minus one (ref :98)

    # Step-size growth on unconverged march steps (ref PathTracing.hlsl:244-245).
    step_growth: float = 0.1
    thickness_growth: float = 0.25

    # TPU tuning: decode bounce hits from the bit-packed G-buffer
    # (gbuffer_packed.py) — 4 texel gathers per decode instead of ~14,
    # at the reference's own RGBA8/oct/HDR storage precision.
    use_packed_gbuffer: bool = True

    # TPU tuning: between-bounce ray compaction. Every per-bounce cost
    # (schedule build, minitile filter, candidate pack, resolve rounds,
    # G-buffer decode, BRDF) is priced per lane, but the alive-lane
    # fraction collapses across bounces (BoxScene 1080p measured:
    # 94/36/22/15% entering bounces 0-3). caps[b] is the static lane
    # capacity for bounce b as a fraction of the full pixel count;
    # alive lanes are packed densely into ceil(caps[b]*N) lanes before
    # the march. Matches the dense trace to <=2 ulp as long as the
    # alive count fits the cap (every per-lane op is elementwise and
    # bit-identical; only the final per-bounce contribution sums
    # re-associate in the cascade unwind); lanes beyond the cap are
    # dropped, counted in _debug_out["compact_drop_b{b}"], and covered
    # by tests. None disables compaction. The last entry extends to any
    # deeper bounce.
    compaction_caps: tuple | None = None

    # TPU tuning: hiz resolve-round compaction. Round 1 of the
    # candidate resolve runs on every lane, but the still-unresolved
    # fraction entering round 2 is 22-46% (BoxScene 1080p measured per
    # bounce); rounds 2+ re-pack the unresolved lanes into this
    # fraction of the lane count (same bit-exactness/overflow contract
    # as compaction_caps — overflow lanes keep their round-1 state and
    # finalize as unresolved, the already-documented R-round cutoff
    # class). None disables.
    hiz_round_cap: float | None = None

    # TPU tuning: candidates exact-tested per fetched 32x8-px tile row
    # in one hiz resolve round (consecutive candidates often share the
    # window: crawling rays). Total candidates considered per lane is
    # bounded by n_rounds * hiz_chain; raising chain trades dense VPU
    # link math for fewer gather+materialize rounds at iso-coverage.
    hiz_chain: int = 4

    # TPU tuning: hiz resolve-round budget override. None = the
    # resolution-aware default (pathtrace_hiz.default_rounds: 4 at
    # >=720p, 10 below). A tuple gives per-bounce budgets (last entry
    # extends to deeper bounces) — later bounces carry far fewer
    # candidates per lane. Candidates beyond rounds * hiz_chain per
    # lane finalize as misses — the documented R-round cutoff
    # deviation, quality-measured per config before shipping
    # (scripts/quality_headline.py).
    hiz_rounds: int | tuple | None = None

    # TPU tuning (no behavioral effect, gated equal by
    # tests/test_fused_schedule.py): run the hiz front half (schedule
    # build + minitile filter + candidate pack) as one fused Pallas
    # kernel instead of three HBM-streaming stages. Plain-tiles
    # variants only; dual (refraction/backface) and _debug_out runs
    # always use the unfused path. None = auto: fused on TPU, unfused
    # in Pallas interpret mode (XLA:CPU takes minutes compiling the
    # interpreted s_max-step kernel body into every enclosing jit).
    fused_schedule: bool | None = None

    # TPU tuning (no behavioral effect, gated order-exact by
    # tests/test_home_prefix.py): the fused schedule kernel
    # exact-tests each lane's leading candidates that fall inside the
    # lane block's home depth strip (±1 band / ±1 pair of the lane's
    # own 32x8-px window, held in VMEM) with the resolve rounds' own
    # hit rule, so most screen-ordered lanes enter the rounds already
    # resolved (83% of first candidates are in the home window,
    # measured 512²). Applies only where the lanes are the pixel grid
    # (bounce 0, unsharded, spp 1, plain tiles); None = auto (on).
    hiz_home_prefix: bool | None = None

    # TPU tuning: resolve-round lane compaction for the home-prefixed
    # march (fraction of lanes, same contract as hiz_round_cap but
    # applied from round 1 — the prefix already resolved most lanes,
    # so unlike the dense case the re-domaining pays for itself).
    # None disables.
    hiz_home_round_cap: float | None = None

    # TPU tuning (no behavioral effect, gated by
    # tests/test_hiz.py::test_extract_chain_matches_onehot): extract
    # each resolve round's chain-link candidates with ONE Pallas pass
    # over the (K, N) slot tables (pallas_gather.extract_chain) instead
    # of chain x fields separate XLA one-hot mask-sums. MEASURED
    # NEGATIVE at the headline (47.08 XLA vs 43.79 Pallas, round 5):
    # the one-hot sums fuse into the round graph while a pallas_call
    # input forces the slot tables through HBM unfused (same mechanism
    # as the r3 rowwise_select result). None = off (the XLA form).
    pallas_extract: bool | None = None

    # TPU tuning (no behavioral effect beyond f32 interpolation of
    # bf16 history, gated by tests/test_temporal.py): fetch the five
    # temporal-history reads (depth/emission point, sample/color
    # bilinear at prev_uv, color bilinear at virtual_uv) from ONE
    # packed (H*W, 8)-f32 row table — 9 wide row gathers instead of
    # ~24 channel-plane takes (per-index gather pricing, v5e).
    # None = auto: packed on TPU, unpacked elsewhere.
    packed_temporal: bool | None = None

    # TPU tuning (no behavioral effect): march-loop unroll factor.
    # True = fully unroll. Gathers inside rolled XLA loops hit a ~500x
    # slower scalar path on TPU (measured on v5e); full unrolling keeps
    # the per-step depth fetch on the fast vectorized gather path, at
    # the cost of one long compile (amortized by the persistent cache).
    march_unroll: int | bool = True

    @classmethod
    def boxscene_headline(cls) -> "PTConfig":
        """The BoxScene-1080p-tuned production config — the ONE
        definition bench.py, quality_headline.py and the tuning sweeps
        all measure (ADVICE r3: the tuned caps drifted across files).

        compaction_caps: measured max alive fractions entering bounces
        1-3 are 25/15/12% at 1080p over 14 frame seeds
        (scripts/probe_alive_var.py, round 3) but RISE at smaller
        frames (31.4/17.4/10.7% at 256² — the skip/exit balance is
        resolution-dependent), so the caps carry headroom over the
        256² maxima too: 34/21/15% is zero-drop at every measured
        shape, gated by tests/test_compaction.py::
        test_headline_caps_zero_drop (256², CPU) and the on-chip 1080p
        seed sweep (scripts/probe_alive_var.py --check-caps)."""
        return cls(compaction_caps=(1.0, 0.34, 0.21, 0.15))


@dataclasses.dataclass(frozen=True)
class PTVariants:
    """Static variant axes — the analog of the reference's multi_compile
    shader keyword matrix (reference: ScreenSpacePathTracing.shader:47-55).

    Each boolean selects a different jit specialization; there is no
    runtime branching on these inside kernels.
    """

    temporal_accumulation: bool = False  # _TEMPORAL_ACCUMULATION
    blue_noise: bool = False  # _METHOD_BLUE_NOISE (else hashed random)
    # Beyond-reference axis: tableless Owen-scrambled Sobol sampling
    # (NoiseMethod.SOBOL_OWEN; ops/rng._sobol_owen_sample).
    sobol_owen: bool = False
    support_refraction: bool = False  # _SUPPORT_REFRACTION
    backface_textures: bool = False  # _BACKFACE_TEXTURES
    ignore_forward_objects: bool = False  # _IGNORE_FORWARD_OBJECTS
    gbuffer_normals_oct: bool = False  # _GBUFFER_NORMALS_OCT
    # _FP_REFL_PROBE_ATLAS (URP Forward+ probe-atlas clustering) is URP
    # plumbing, not a capability: the framework replicates the probe list
    # instead (see envprobe.py and SURVEY.md C8).


@dataclasses.dataclass(frozen=True)
class PTSettings:
    """Runtime settings — same fields/ranges/defaults as the reference's
    volume component (reference: PathTracingVolume.cs:17-71) plus the
    renderer-feature serialized fields (cs:67-158).

    Frozen/hashable so it can be a static jit argument (loop bounds and
    lobe toggles specialize the kernel, exactly like the reference's
    cbuffer-driven loop bounds specialize occupancy).
    """

    state: bool = True  # PathTracingVolume.cs:17 (default off in ref UI)
    maximum_samples: int = 256  # [4, 512] offline accumulation budget (:23)
    maximum_depth: int = 4  # [1, 16] bounces per path (:29)
    maximum_intensity: float = 10.0  # >= 0.1 firefly clamp (:35)
    samples_per_pixel: int = 1  # [1, 16] rays per pixel per frame (:41)
    maximum_steps: int = 24  # [16, 64] march steps per bounce (:47)
    step_size: float = 0.4  # [0.1, 1.0] large-tier base step (:53)
    noise_method: NoiseMethod = NoiseMethod.HASHED_RANDOM  # (:59)
    denoiser: DenoiserType = DenoiserType.NONE  # (:65)
    accum_factor: float = 0.9  # [0.5, 1.0] temporal blend strength (:71)

    # Renderer-feature fields (ScreenSpacePathTracingAccumulation.cs:67-158).
    accurate_thickness: ThicknessMode = ThicknessMode.CONSTANT
    spatial_denoise_quality: SpatialDenoiseQuality = SpatialDenoiseQuality.MEDIUM
    support_refraction: bool = False
    progress_bar: bool = True
    dithering: bool = False
    dither_intensity: float = 1.0

    # Material toggle "_IGNORE_FORWARD_OBJECTS — Ignore Deferred 0
    # smoothness" (ScreenSpacePathTracing.shader:14, :53): smoothness==0
    # pixels emit their emission only instead of being traced.
    ignore_forward_objects: bool = False
    # Pipeline G-buffer storage axis (_GBUFFER_NORMALS_OCT,
    # shader:55/:169 — driven by URP's accurate-G-buffer-normals
    # setting): set when the bound G-buffer stores oct-encoded normals
    # (gbuffer.pack_normal_oct_quad) rather than unit vectors.
    gbuffer_normals_oct: bool = False

    def validate(self) -> "PTSettings":
        def _check(name, value, lo, hi):
            if not (lo <= value <= hi):
                raise ValueError(f"{name}={value} outside [{lo}, {hi}]")

        _check("maximum_samples", self.maximum_samples, 4, 512)
        _check("maximum_depth", self.maximum_depth, 1, 16)
        _check("samples_per_pixel", self.samples_per_pixel, 1, 16)
        _check("maximum_steps", self.maximum_steps, 16, 64)
        _check("step_size", self.step_size, 0.1, 1.0)
        _check("accum_factor", self.accum_factor, 0.5, 1.0)
        if self.maximum_intensity < 0.1:
            raise ValueError("maximum_intensity must be >= 0.1")
        return self

    @property
    def temporal_intensity(self) -> float:
        """CPU-side uniform derivation (reference: cs:394-396):
        _TemporalIntensity = lerp(0.8, 0.97, accum_factor * 2 - 1)."""
        t = self.accum_factor * 2.0 - 1.0
        return 0.8 + (0.97 - 0.8) * t

    def variants(self) -> PTVariants:
        """Derive the static variant axes the reference derives from the
        volume + feature state (cs:401-420, 480-503)."""
        return PTVariants(
            temporal_accumulation=self.denoiser
            in (DenoiserType.TEMPORAL, DenoiserType.SPATIAL_TEMPORAL),
            blue_noise=self.noise_method == NoiseMethod.BLUE_NOISE,
            sobol_owen=self.noise_method == NoiseMethod.SOBOL_OWEN,
            support_refraction=self.support_refraction,
            backface_textures=self.accurate_thickness != ThicknessMode.CONSTANT,
            ignore_forward_objects=self.ignore_forward_objects,
            gbuffer_normals_oct=self.gbuffer_normals_oct,
        )


# The reference advances the RNG frame counter by 33 (mod 64000) per frame
# (reference: ScreenSpacePathTracingAccumulation.cs:553-555).
FRAME_INDEX_STRIDE = 33
FRAME_INDEX_MOD = 64000

# Offline accumulation cap when the HDR target is 11-bit float rather than
# 64-bit (reference: cs:810-814).
MAX_SAMPLES_LOW_PRECISION = 64
