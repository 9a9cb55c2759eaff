"""Sweep (hiz_chain, n_rounds) at the headline config: Mrays/s + march
agreement vs the shipped (chain=4, R=4) reference point.

Coverage per lane is bounded by chain*R candidates; a bigger chain
tests more candidates per gather+materialize round, so fewer rounds
may reach iso-coverage at lower cost (docs/Performance.md round-3).

Each config runs in its own subprocess (tunneled-TPU quirks). Output:
one line per config + a JSON summary.

Usage: python scripts/probe_chain_sweep.py [--configs 4x4,6x3,8x2]
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
BOUNCES, STEPS = 4, 24


def worker(chain: int, rounds: int, out_path: str) -> None:
    import dataclasses

    import jax

    from unitysspathtracingurp_tpu.utils.jaxenv import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz
    from unitysspathtracingurp_tpu.utils.metrics import mrays_per_sec

    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(
        maximum_depth=BOUNCES, samples_per_pixel=1, maximum_steps=STEPS,
        dithering=False,
    )
    caps = (1.0, 0.5, 0.3125, 0.25)
    if os.environ.get("SWEEP_CAPS"):  # e.g. "1.0,0.3125,0.1875,0.15"
        caps = tuple(float(v) for v in os.environ["SWEEP_CAPS"].split(","))
    cfg = PTConfig(compaction_caps=caps, hiz_chain=chain)
    variants = settings.variants()
    tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)

    def traced(fi):
        return trace_frame_hiz(
            gb, cam, probes, settings, cfg, variants, fi, tiles=tiles,
            n_rounds=rounds,
        )

    fn = jax.jit(traced)
    sync = jax.jit(lambda fi: jnp.sum(fn(fi)))
    float(sync(jnp.uint32(0)))  # compile
    t0 = time.perf_counter()
    frames = 10
    for i in range(frames):
        out = sync(jnp.uint32((33 * (i + 1)) % 64000))
    float(out)
    dt = (time.perf_counter() - t0) / frames
    sky_fraction = float((np.asarray(gb.depth) == 0.0).mean())
    mrays = mrays_per_sec(H, W, 1, BOUNCES, dt, sky_fraction)

    # Single no-dither frame for cross-config agreement.
    img = np.asarray(fn(jnp.uint32(12345)))
    np.savez_compressed(out_path, image=img.astype(np.float32))
    print(json.dumps({
        "chain": chain, "rounds": rounds, "ms": round(dt * 1e3, 1),
        "mrays": round(mrays, 2),
    }), flush=True)


def main():
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]), sys.argv[i + 3])
        return 0

    configs = "4x4,6x3,8x2,8x3,6x4"
    if "--configs" in sys.argv:
        configs = sys.argv[sys.argv.index("--configs") + 1]
    pairs = [tuple(int(v) for v in c.split("x")) for c in configs.split(",")]

    outs = {}
    for chain, rounds in pairs:
        out = f"/tmp/chain_{chain}x{rounds}.npz"
        outs[(chain, rounds)] = out
        rc = subprocess.call(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--worker", str(chain), str(rounds), out],
            cwd=ROOT,
        )
        if rc != 0:
            print(json.dumps({"error": f"{chain}x{rounds} failed rc={rc}"}))
            return 1

    ref = np.load(outs[pairs[0]])["image"]
    summary = []
    for (chain, rounds), path in outs.items():
        img = np.load(path)["image"]
        d = np.linalg.norm(img - ref, axis=-1)
        r = np.linalg.norm(ref, axis=-1) + 1e-6
        summary.append({
            "config": f"chain{chain}xR{rounds}",
            "px_over_1pct_vs_ref": round(float((d / r > 0.01).mean()), 4),
            "mean_rel_diff": round(float((d / r).mean()), 5),
        })
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
