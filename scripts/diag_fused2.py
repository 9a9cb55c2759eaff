"""Localize the fused-schedule 1080p deviation: depth=1 (primary
bounce only, deterministic march inputs with dithering off), fused vs
unfused, at 256 and 1080p. Dumps the 1080p diff mask to /tmp.

Usage: python scripts/diag_fused2.py [--sizes 256,1080]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

from unitysspathtracingurp_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()
import jax.numpy as jnp  # noqa: E402

from unitysspathtracingurp_tpu.config import PTConfig, PTSettings  # noqa: E402
from unitysspathtracingurp_tpu.models import fixtures, scene  # noqa: E402
from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles  # noqa: E402
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe  # noqa: E402
from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz  # noqa: E402


def run(h, w):
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(h, w)
    gb = fixtures.rasterize_gbuffers(sc, cam, h, w)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(
        maximum_depth=1, samples_per_pixel=1, maximum_steps=24,
        dithering=False,
    )
    variants = settings.variants()
    tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)
    out = {}
    for name, fused in (("fused", True), ("unfused", False)):
        cfg = PTConfig(fused_schedule=fused)

        def traced(gb, cam, probes, fi, cfg=cfg):
            return trace_frame_hiz(
                gb, cam, probes, settings, cfg, variants, fi, tiles=tiles
            )

        out[name] = np.asarray(
            jax.jit(traced)(gb, cam, probes, jnp.uint32(12345))
        )
    d = np.linalg.norm(out["fused"] - out["unfused"], axis=-1)
    r = np.linalg.norm(out["unfused"], axis=-1) + 1e-6
    rel = d / r
    print(json.dumps({
        "size": f"{w}x{h}",
        "px_over_1pct": round(float((rel > 0.01).mean()), 5),
        "px_over_50pct": round(float((rel > 0.5).mean()), 5),
        "mean_ratio": round(float(out["fused"].mean() / out["unfused"].mean()), 5),
    }), flush=True)
    if h >= 1000:
        np.save("/tmp/diag2_relmask.npy", (rel > 0.01))
        np.savez_compressed("/tmp/diag2_imgs.npz", **out)


def main():
    sizes = "256,1080"
    if "--sizes" in sys.argv:
        sizes = sys.argv[sys.argv.index("--sizes") + 1]
    for s in sizes.split(","):
        s = int(s)
        run(s, 1920 if s == 1080 else s)


if __name__ == "__main__":
    main()
