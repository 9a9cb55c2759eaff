"""Convergence study: hashed RNG vs generated blue-noise tables
vs Owen-scrambled Sobol (NoiseMethod.SOBOL_OWEN, the beyond-reference
unbounded sampler; VERDICT r2 item 5: frames-to-1% <= 1024)
(VERDICT r1 item 3; the reference ships blue noise precisely for
convergence, PathTracingUtilities.hlsl:78-99 / Documentation.md:28).

BoxScene 256², 1 bounce, offline accumulation. Measures 4x4-pooled
relative RMSE vs the cached 16384-frame golden as a function of
accumulated frames, for both noise methods; reports frames-to-<=1% and
writes the curves to fixtures/convergence_r5.json.

Run on TPU: python scripts/convergence_study.py [--max 4096]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "fixtures", "box256_golden.npz"
)
OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "fixtures", "convergence_r5.json"
)


def main():
    max_frames = 4096
    if "--max" in sys.argv:
        max_frames = int(sys.argv[sys.argv.index("--max") + 1])
    import jax

    from unitysspathtracingurp_tpu.utils.jaxenv import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from unitysspathtracingurp_tpu.config import (
        NoiseMethod,
        PTConfig,
        PTSettings,
    )
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.ops.blue_noise import BlueNoiseTables
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame

    H = W = 256
    pool = lambda x: np.asarray(x).reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))  # noqa: E731
    from unitysspathtracingurp_tpu.utils.metrics import relative_rmse

    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0]))
    cfg = PTConfig()

    golden = pool(np.load(GOLDEN_PATH)["image"])
    # Same metric as scripts/quality_report.py: masked (non-sky),
    # mean-normalized relative RMSE on the pooled image.
    pooled_mask = np.asarray(gb.depth).reshape(H // 4, 4, W // 4, 4).min((1, 3)) > 0

    only = None
    if "--mode" in sys.argv:
        only = sys.argv[sys.argv.index("--mode") + 1]
    results = {}
    for method in (NoiseMethod.HASHED_RANDOM, NoiseMethod.BLUE_NOISE,
                   NoiseMethod.SOBOL_OWEN):
        if only and method.name.lower() != only:
            continue
        settings = PTSettings(
            maximum_depth=1, samples_per_pixel=1, maximum_steps=24,
            dithering=False, noise_method=method,
        )
        variants = settings.variants()
        tables = BlueNoiseTables() if method == NoiseMethod.BLUE_NOISE else None

        def f(gbuf, fi):
            return trace_frame(
                gbuf, cam, probes, settings, cfg, variants, fi,
                rng_tables=tables,
            )

        fj = jax.jit(f)
        acc = np.zeros((H, W, 3), np.float64)
        curve = []
        frames_to = None
        for i in range(max_frames):
            fi = jnp.uint32((33 * (i + 1)) % 64000)
            acc += np.asarray(fj(gb, fi))
            n = i + 1
            if n % 64 == 0 or n == max_frames:
                rel = float(relative_rmse(pool(acc / n), golden, pooled_mask))
                curve.append([n, rel])
                print(f"{method.name} n={n} pooled rel RMSE {rel:.4f}", flush=True)
                if frames_to is None and rel <= 0.01:
                    frames_to = n
        results[method.name.lower()] = {
            "frames_to_1pct_pooled": frames_to,
            "curve": curve,
        }

    # Merge with any existing curves (per-mode subprocess runs: the TPU
    # backend dislikes two large programs in one process).
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as fi:
            old = json.load(fi)
        old.update(results)
        results = old
    with open(OUT_PATH, "w") as fo:
        json.dump(results, fo, indent=1)
    print(json.dumps({
        "metric": "frames-to-converge (<=1% pooled rel RMSE, BoxScene 256², 1 bounce)",
        **{k: v["frames_to_1pct_pooled"] for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
