"""Converged hiz-vs-parity deviation at the HEADLINE bench config
(VERDICT r2 item 4): BoxScene 1920x1080, 4 bounces, 24 steps, the
exact shape/settings bench.py reports Mrays/s on.

Methodology: both tracers accumulate the SAME seed stream (common
random numbers — the BRDF/noise draws are identical per frame, so
Monte-Carlo noise cancels in the difference and the pooled RMSE
isolates the *systematic* march deviation). Pooling/masking matches
scripts/quality_report.py (4x4 pooled, hit-lanes only). The two
kernels run in separate subprocesses: a second large program in one
process can die with INVALID_ARGUMENT on the tunneled TPU, and jax
0.9's dispatch cache can collide two same-signature jits.

Usage:
  python scripts/quality_headline.py                 # full run (both)
  python scripts/quality_headline.py --frames 256    # reduced budget
  python scripts/quality_headline.py --kernel hiz --frames N --out F
                                                     # one-kernel worker

Writes fixtures/quality_headline_r5.json + prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

H, W = 1080, 1920
BOUNCES = 4
STEPS = 24


def _arg(name, default=None):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def worker(kernel: str, frames: int, out_path: str) -> None:
    import jax

    from unitysspathtracingurp_tpu.utils.jaxenv import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe

    dual = "--dual" in sys.argv
    if dual:
        # The refraction/backface variant at production scale (VERDICT
        # r4 item 5): glass BoxScene, 3-layer depth + backface
        # thickness — the dual fused front half + DualDepthTiles march.
        from unitysspathtracingurp_tpu.config import ThicknessMode

        sc = scene.build_box_scene(with_glass=True, with_mirror=False)
        cam = fixtures.box_scene_camera(H, W)
        settings = PTSettings(
            maximum_depth=3,
            samples_per_pixel=1,
            maximum_steps=STEPS,
            dithering=False,
            support_refraction=True,
            accurate_thickness=ThicknessMode.DEPTH_NORMALS,
        )
        gb = fixtures.rasterize_gbuffers(
            sc, cam, H, W, with_backface=True
        )
    else:
        sc = scene.build_box_scene()
        cam = fixtures.box_scene_camera(H, W)
        gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
        settings = PTSettings(
            maximum_depth=BOUNCES,
            samples_per_pixel=1,
            maximum_steps=STEPS,
            dithering=False,
        )
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    # The exact headline bench config (PTConfig.boxscene_headline, the
    # definition bench.py measures); hiz additionally prebuilds the
    # static tiles. --unfused forces the XLA front half (r3 diagnosis:
    # isolate the fused Pallas kernel's contribution to the converged
    # deviation).
    import dataclasses

    cfg = dataclasses.replace(
        PTConfig.boxscene_headline(),
        fused_schedule=False if "--unfused" in sys.argv else None,
    )
    # Round-budget / home-prefix overrides for the r5 rounds-vs-quality
    # decision (bench.py BENCH_ROUNDS / BENCH_HOME analogs).
    if _arg("--rounds"):
        rr = [int(x) for x in _arg("--rounds").split(",")]
        cfg = dataclasses.replace(
            cfg, hiz_rounds=rr[0] if len(rr) == 1 else tuple(rr)
        )
    if _arg("--home"):
        cfg = dataclasses.replace(
            cfg, hiz_home_prefix=_arg("--home") == "1"
        )
    variants = settings.variants()

    bde = int(settings.accurate_thickness.value) if dual else 0
    if kernel == "hiz":
        from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz

        fn = jax.jit(
            lambda fi: trace_frame_hiz(
                gb, cam, probes, settings, cfg, variants, fi,
                back_depth_enabled=bde,
            )
        )
    else:
        from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame

        fn = jax.jit(
            lambda fi: trace_frame(
                gb, cam, probes, settings, cfg, variants, fi,
                back_depth_enabled=bde,
            )
        )

    acc = np.zeros((H, W, 3), np.float64)
    t0 = time.time()
    for i in range(frames):
        acc += np.asarray(fn(jnp.uint32((33 * i) % 64000)))
        if (i + 1) % 64 == 0:
            print(
                f"# {kernel}: {i+1}/{frames} ({time.time()-t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )
    np.savez_compressed(
        out_path,
        image=(acc / frames).astype(np.float32),
        depth=np.asarray(gb.depth).astype(np.float32),
    )


def compare(path_hiz: str, path_xla: str, frames: int) -> dict:
    from unitysspathtracingurp_tpu.utils.metrics import relative_rmse

    a = np.load(path_hiz)
    b = np.load(path_xla)
    img_h, img_x = a["image"], b["image"]
    depth = a["depth"]
    mask = depth > 0

    pool = lambda x: x.reshape(H // 4, 4, W // 4, 4, 3).mean((1, 3))  # noqa: E731
    pooled_mask = depth.reshape(H // 4, 4, W // 4, 4).min((1, 3)) > 0

    pooled = relative_rmse(pool(img_h), pool(img_x), pooled_mask)
    per_px = relative_rmse(img_h, img_x, mask)
    mh, mx = img_h[mask].mean(), img_x[mask].mean()
    bias = (mh - mx) / mx
    # Spatial decomposition: worst 4x4-pooled cells (where do the two
    # marches disagree — window edges flip whole reflection features).
    d = np.linalg.norm(pool(img_h) - pool(img_x), axis=-1)
    r = np.linalg.norm(pool(img_x), axis=-1) + 1e-6
    rel = np.where(pooled_mask, d / r, 0.0)
    frac_over_5pct = float((rel > 0.05).mean())
    frac_over_1pct = float((rel > 0.01).mean())
    dual = "--dual" in sys.argv
    return {
        "metric": "hiz-vs-parity converged deviation "
        f"({'glass BoxScene, refraction+backface' if dual else 'BoxScene'} "
        f"{W}x{H}, {3 if dual else BOUNCES} bounces, {STEPS} steps, "
        "common seed stream)",
        "frames": frames,
        "pooled_rel_rmse": round(float(pooled), 4),
        "per_pixel_rel_rmse": round(float(per_px), 4),
        "mean_bias": round(float(bias), 5),
        "pooled_cells_over_1pct": round(frac_over_1pct, 4),
        "pooled_cells_over_5pct": round(frac_over_5pct, 4),
    }


def main():
    kernel = _arg("--kernel")
    frames = int(_arg("--frames", "512"))
    if kernel:
        worker(kernel, frames, _arg("--out"))
        return 0

    dual = "--dual" in sys.argv
    sfx = "_dual" if dual else ""
    outs = {}
    for k in ("hiz", "xla"):
        outs[k] = f"/tmp/quality_headline{sfx}_{k}.npz"
        if os.path.exists(outs[k]) and "--reuse" in sys.argv:
            print(f"# reusing {outs[k]}", file=sys.stderr)
            continue
        fwd = []
        if k == "hiz":
            if _arg("--rounds"):
                fwd += ["--rounds", _arg("--rounds")]
            if _arg("--home"):
                fwd += ["--home", _arg("--home")]
        rc = subprocess.call(
            [
                sys.executable, "-u", os.path.abspath(__file__),
                "--kernel", k, "--frames", str(frames), "--out", outs[k],
            ]
            + (["--dual"] if dual else [])
            + fwd,
            cwd=ROOT,
        )
        if rc != 0:
            print(json.dumps({"error": f"{k} worker failed rc={rc}"}))
            return 1

    result = compare(outs["hiz"], outs["xla"], frames)
    if _arg("--rounds"):
        result["hiz_rounds"] = _arg("--rounds")
    if _arg("--home"):
        result["home_prefix"] = _arg("--home") == "1"
    art = os.path.join(ROOT, "fixtures", f"quality_headline{sfx}_r5.json")
    with open(art, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
