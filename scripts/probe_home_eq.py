"""On-TPU equality gate for the home-prefix resolve (round 5).

Renders one 256² BoxScene frame (4 bounces, headline-class config at
256² scale) with hiz_home_prefix on vs off in SEPARATE subprocesses
(one jitted tracer per process — TODO.md quirks) and compares. The
prefix is order-exact by construction; on TPU the two paths are
different Mosaic/XLA compilations, so a handful of window-edge lanes
may flip at the last ulp (same tolerance class as the fused-vs-unfused
CPU gate, tests/test_fused_schedule.py).

Usage: python scripts/probe_home_eq.py            # run both + compare
       python scripts/probe_home_eq.py --worker 0|1 --out F
"""

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

H = W = 256


def worker(home: bool, out_path: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz

    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(
        maximum_depth=4, samples_per_pixel=1, maximum_steps=24,
        dithering=False,
    )
    cfg = dataclasses.replace(PTConfig(), hiz_home_prefix=home)
    variants = settings.variants()
    tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)

    fn = jax.jit(
        lambda fi: trace_frame_hiz(
            gb, cam, probes, settings, cfg, variants, fi, tiles=tiles
        )
    )
    acc = np.zeros((H, W, 3), np.float64)
    for i in range(8):
        acc += np.asarray(fn(jnp.uint32(33 * (i + 1))))
    np.save(out_path, acc / 8.0)
    print(f"home={home} mean={acc.mean()/8.0:.6f}")


def main() -> int:
    if "--worker" in sys.argv:
        worker(
            sys.argv[sys.argv.index("--worker") + 1] == "1",
            sys.argv[sys.argv.index("--out") + 1],
        )
        return 0
    outs = []
    for home in (0, 1):
        out = f"/tmp/home_eq_{home}.npy"
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--worker",
             str(home), "--out", out],
            capture_output=True, text=True, timeout=2400,
        )
        print(r.stdout[-400:], r.stderr[-2000:] if r.returncode else "")
        if r.returncode:
            print(json.dumps({"home_eq": "worker_failed", "home": home}))
            return 1
        outs.append(np.load(out))
    a, b = outs
    diff = np.abs(a - b).max(-1)
    frac_exact = float((diff < 1e-6).mean())
    print(json.dumps({
        "home_eq_frac_exact": round(frac_exact, 6),
        "max_diff": float(diff.max()),
        "mean_rel": float(abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)),
    }))
    return 0 if frac_exact >= 0.999 else 2


if __name__ == "__main__":
    sys.exit(main())
