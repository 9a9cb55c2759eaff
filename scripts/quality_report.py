"""Quality metrics report: RMSE + frames-to-converge (BASELINE.md).

Config #1 (BoxScene 256², 1 bounce, offline):
  1. builds a high-sample golden reference (16384 one-spp frames, its
     own seed stream; cached to fixtures/box256_golden.npz),
  2. measures frames-to-converge: accumulated frames until relative
     RMSE vs the golden drops under 1% (the north-star budget),
  3. reports the converged image's relative RMSE vs the world-space
     ideal-SSPT oracle (physics accuracy, bounded by the reference
     algorithm's screen-space approximations).

Prints one JSON line. Run on TPU: python scripts/quality_report.py
(--quick for a reduced-budget sanity run).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "fixtures", "box256_golden.npz"
)


def main():
    quick = "--quick" in sys.argv
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp

    from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
    from unitysspathtracingurp_tpu.models import fixtures, groundtruth, scene
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame
    from unitysspathtracingurp_tpu.utils.metrics import relative_rmse

    H = W = 256
    golden_frames = 1024 if quick else 16384
    max_measure_frames = 512 if quick else 4096
    threshold = 0.05 if quick else 0.01
    # Convergence is measured on the 4x4 spatially pooled image: the
    # per-pixel Monte-Carlo noise floor (sigma ~ 0.35/frame against a
    # mean of ~0.27) sits above 1% for any budget the reference itself
    # allows (it caps offline accumulation at 512 samples); pooling
    # measures convergence of the image estimate rather than raw noise.
    pool = lambda x: np.asarray(x).reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))  # noqa: E731

    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0]))
    settings = PTSettings(
        maximum_depth=1, samples_per_pixel=1, maximum_steps=24, dithering=False
    )
    cfg = PTConfig()
    variants = settings.variants()
    fn = jax.jit(
        lambda fi: trace_frame(gb, cam, probes, settings, cfg, variants, fi)
    )
    mask = np.asarray(gb.depth) > 0
    pooled_mask = np.asarray(gb.depth).reshape(H // 4, 4, W // 4, 4).min((1, 3)) > 0

    def accumulate(n, seed0, probe_every=None, golden_pooled=None, snapshots=()):
        acc = np.zeros((H, W, 3), np.float64)
        hit = -1
        snaps = {}
        for i in range(n):
            acc += np.asarray(fn(jnp.uint32((seed0 + 33 * i) % 64000)))
            if probe_every and (i + 1) % probe_every == 0 and hit < 0:
                if relative_rmse(pool(acc / (i + 1)), golden_pooled, pooled_mask) <= threshold:
                    hit = i + 1
            if (i + 1) in snapshots:
                snaps[i + 1] = acc / (i + 1)
        return acc / n, hit, snaps

    # 1. Golden reference (cached).
    if os.path.exists(GOLDEN_PATH) and not quick:
        golden = np.load(GOLDEN_PATH)["image"]
    else:
        t0 = time.time()
        golden, _, _ = accumulate(golden_frames, seed0=7919)
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        if not quick:
            np.savez_compressed(GOLDEN_PATH, image=golden.astype(np.float32))
        print(f"# golden built in {time.time()-t0:.0f}s", file=sys.stderr)
    golden_pooled = pool(golden)

    # 2. Frames to converge under the budget, fresh seed stream; snapshot
    # the reference's own max offline budget (512 samples).
    final, frames_to_converge, snaps = accumulate(
        max_measure_frames, seed0=0, probe_every=32,
        golden_pooled=golden_pooled, snapshots=(512,),
    )
    at_512 = snaps.get(512, final)
    noise_at_ref_budget = relative_rmse(at_512, golden, mask)

    # 3. Physics accuracy vs the ideal-SSPT world-space oracle.
    gt = groundtruth.path_trace(
        sc, cam, H, W, bounces=1, spp=256 if quick else 1024, seed=3,
        visible_only=True,
    )
    rmse_vs_oracle = relative_rmse(golden, gt, mask)

    print(
        json.dumps(
            {
                "metric": "quality (BoxScene 256x256, 1 bounce, offline)",
                "frames_to_converge_1pct_pooled": frames_to_converge,
                "rel_rmse_at_512_samples": round(float(noise_at_ref_budget), 4),
                "rel_rmse_vs_ideal_sspt_oracle": round(float(rmse_vs_oracle), 4),
                "golden_frames": golden_frames,
                "threshold": threshold,
            }
        )
    )


if __name__ == "__main__":
    main()
