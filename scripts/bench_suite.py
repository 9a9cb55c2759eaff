"""Benchmark suite: the five BASELINE.json configs.

Prints one JSON line per config (bench.py remains the driver's
single-line headline). Run: python scripts/bench_suite.py [--small]

Each config runs in its own subprocess: the tunneled TPU backend errors
(INVALID_ARGUMENT) when a process executes a second large compiled
program after certain first ones; per-config process isolation avoids it.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

CONFIG_NAMES = [
    "box1", "box4", "refraction", "refraction1080", "classroom", "figure",
]


def _time_frames(fn, args_fn, frames):
    import jax
    import jax.numpy as jnp

    sync = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(sync(*args_fn(0)))  # compile
    t0 = time.perf_counter()
    for i in range(frames):
        # Force each frame: the tunneled device errors on deep async
        # queues, and per-frame host sync costs only ~30 ms.
        float(sync(*args_fn(i + 1)))
    return (time.perf_counter() - t0) / frames


def main():
    small = "--small" in sys.argv
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    if only is None:
        # Orchestrate: one subprocess per config (see module docstring).
        for name in CONFIG_NAMES:
            args = [sys.executable, os.path.abspath(__file__), f"--only={name}"]
            if small:
                args.append("--small")
            proc = subprocess.run(args, capture_output=True, text=True, timeout=3000)
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
            if proc.returncode != 0:
                print(json.dumps({"config": name, "error": proc.stderr.strip()[-200:]}))
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp

    from unitysspathtracingurp_tpu.config import (
        DenoiserType,
        PTConfig,
        PTSettings,
        ThicknessMode,
    )
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame
    from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz
    from unitysspathtracingurp_tpu.ops.temporal import TemporalState, temporal_reproject
    from unitysspathtracingurp_tpu.ops.upscale import easu_like_upscale
    from unitysspathtracingurp_tpu.utils.metrics import mrays_per_sec

    cfg = PTConfig()
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    frames = 2 if small else 5
    results = []
    # Kernel selection mirrors bench.py: hiz covers every variant set
    # since round 3; BENCH_KERNEL=xla forces the parity tracer.
    force_xla = os.environ.get("BENCH_KERNEL") == "xla"

    def pick_trace(variants):
        if force_xla:
            return trace_frame, "xla"
        return trace_frame_hiz, "hiz"

    def run_trace(name, sc, cam_fn, h, w, settings, bde=0, post=None):
        cam = cam_fn(h, w)
        gb = fixtures.rasterize_gbuffers(
            sc, cam, h, w, prev_cam=cam,
            with_backface=settings.accurate_thickness != ThicknessMode.CONSTANT,
        )
        variants = settings.variants()
        trace, kname = pick_trace(variants)

        def fn(fi):
            img = trace(
                gb, cam, probes, settings, cfg, variants, fi,
                back_depth_enabled=int(settings.accurate_thickness.value),
            )
            return post(img, gb, cam) if post else img

        dt = _time_frames(fn, lambda i: (jnp.uint32(33 * i % 64000),), frames)
        sky = float((np.asarray(gb.depth) == 0).mean())
        mrays = mrays_per_sec(h, w, settings.samples_per_pixel,
                              settings.maximum_depth, dt, sky)
        results.append({
            "config": name, "kernel": kname,
            "ms_per_frame": round(dt * 1e3, 1),
            "mrays_per_sec": round(mrays, 2),
        })

    s = 0.25 if small else 1.0

    # 1: BoxScene 256^2, 1 bounce diffuse-only, offline.
    if only == "box1":
        run_trace(
        "box_256_1bounce_offline",
        scene.build_box_scene(with_mirror=False),
        fixtures.box_scene_camera, 256, 256,
        PTSettings(maximum_depth=1, samples_per_pixel=1, maximum_steps=24,
                   denoiser=DenoiserType.OFFLINE, dithering=False),
    )

    # 2: BoxScene full: 4 bounces, GGX + emission + probe fallback.
    if only == "box4":
        run_trace(
        "box_full_4bounce",
        scene.build_box_scene(),
        fixtures.box_scene_camera, int(1080 * s), int(1920 * s),
        PTSettings(maximum_depth=4, samples_per_pixel=1, maximum_steps=24,
                   dithering=False),
    )

    # 3: Refraction: transmissive multi-bounce through glass.
    if only == "refraction":
        run_trace(
        "box_refraction",
        scene.build_box_scene(with_glass=True, with_mirror=False),
        fixtures.box_scene_camera, 256, 256,
        PTSettings(maximum_depth=3, samples_per_pixel=1, maximum_steps=24,
                   support_refraction=True,
                   accurate_thickness=ThicknessMode.DEPTH_NORMALS,
                   dithering=False),
        bde=2,
    )

    # 3b: Refraction at production scale (VERDICT r4 item 5): the dual
    # fused front half + 3-layer DualDepthTiles march where it matters —
    # 1080p, same variant set as the reference's full-res refraction
    # path (PathTracing.hlsl:79-136).
    if only == "refraction1080":
        run_trace(
        "box_refraction_1080p",
        scene.build_box_scene(with_glass=True, with_mirror=False),
        fixtures.box_scene_camera, int(1080 * s), int(1920 * s),
        PTSettings(maximum_depth=3, samples_per_pixel=1, maximum_steps=24,
                   support_refraction=True,
                   accurate_thickness=ThicknessMode.DEPTH_NORMALS,
                   dithering=False),
        bde=2,
    )

    # 4: Classroom 1080p real-time accumulation + reprojection.
    if only == "classroom":
        h4, w4 = int(1080 * s), int(1920 * s)
        sc4 = scene.build_classroom_scene()
        cam4 = fixtures.classroom_camera(h4, w4)
        gb4 = fixtures.rasterize_gbuffers(sc4, cam4, h4, w4, prev_cam=cam4)
        settings4 = PTSettings(maximum_depth=2, samples_per_pixel=1, maximum_steps=24,
                               denoiser=DenoiserType.TEMPORAL, dithering=False)
        variants4 = settings4.variants()
        state4 = TemporalState.create(h4, w4, cam4)
        trace4, kname4 = pick_trace(variants4)

        def fn_trace(fi):
            return trace4(gb4, cam4, probes, settings4, cfg, variants4, fi,
                          history_sample=state4.history_sample)

        def fn4(fi):
            img = fn_trace(fi)
            res = temporal_reproject(img, gb4, cam4, state4, gb4.emission, cfg,
                                     settings4.temporal_intensity, 0.001)
            return res.color

        # Per-pass breakdown (SURVEY §5.1 observability): the full
        # pipeline, then the (small) temporal pass alone — the tunneled
        # backend dies on a SECOND LARGE program per process, so the
        # trace share is derived as total - temporal.
        dt4 = _time_frames(fn4, lambda i: (jnp.uint32(33 * i % 64000),), frames)

        def fn_temporal(img):
            return temporal_reproject(img, gb4, cam4, state4, gb4.emission, cfg,
                                      settings4.temporal_intensity, 0.001).color

        img0 = jnp.zeros((h4, w4, 3), jnp.float32)
        dt_temporal = _time_frames(fn_temporal, lambda i: (img0 + i,), frames)
        dt_trace = dt4 - dt_temporal
        # Temporal mode pads every lane to the adaptive-SPP maximum
        # (RAY_COUNT_LOW_SAMPLE=4, PathTracing.hlsl:430-433) — that is
        # the work actually executed per pixel.
        effective_spp = max(cfg.ray_count_low_sample, settings4.samples_per_pixel)
        results.append({"config": "classroom_realtime", "kernel": kname4,
                        "ms_per_frame": round(dt4 * 1e3, 1),
                        "pass_ms": {"trace": round(dt_trace * 1e3, 1),
                                    "temporal": round(dt_temporal * 1e3, 1)},
                        "mrays_per_sec": round(mrays_per_sec(
                            h4, w4, effective_spp, settings4.maximum_depth, dt4), 2)})

    # 5: Figure at render-scale 0.5 + upscale.
    if only == "figure":
        h5, w5 = int(540 * s), int(960 * s)
        run_trace(
            "figure_halfres_upscale",
            scene.build_figure_scene(),
            fixtures.figure_camera, h5, w5,
            PTSettings(maximum_depth=2, samples_per_pixel=1, maximum_steps=24,
                       dithering=False),
            post=lambda img, gb, cam: easu_like_upscale(img, h5 * 2, w5 * 2),
        )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
