"""Diagnose the r3 headline-quality regression: single no-dither
1080p frame, hiz fused vs unfused (same process, both cached
compiles), plus xla-vs-hiz single frame if requested.

Usage:
  python scripts/diag_fused_1080p.py            # fused vs unfused hiz
  python scripts/diag_fused_1080p.py --kernel xla --out /tmp/f.npz
"""

import dataclasses
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
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe  # noqa: E402

H, W = 1080, 1920
FI = 12345


def main():
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(
        maximum_depth=4, samples_per_pixel=1, maximum_steps=24,
        dithering=False,
    )
    variants = settings.variants()
    caps = (1.0, 0.5, 0.3125, 0.25)

    if "--kernel" in sys.argv and sys.argv[sys.argv.index("--kernel") + 1] == "xla":
        from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame

        cfg = PTConfig(compaction_caps=caps)
        fn = jax.jit(
            lambda gb, cam, probes, fi: trace_frame(
                gb, cam, probes, settings, cfg, variants, fi
            )
        )
        img = np.asarray(fn(gb, cam, probes, jnp.uint32(FI)))
        np.savez_compressed(
            sys.argv[sys.argv.index("--out") + 1], image=img.astype(np.float32)
        )
        print("xla frame saved")
        return

    from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles
    from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz

    tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)
    imgs = {}
    for name, fused, use_caps in (
        ("fused_caps", True, True),
        ("unfused_caps", False, True),
        ("unfused_nocaps", False, False),
    ):
        cfg = PTConfig(
            compaction_caps=caps if use_caps else None, fused_schedule=fused
        )

        def traced(gb, cam, probes, fi, cfg=cfg):
            return trace_frame_hiz(
                gb, cam, probes, settings, cfg, variants, fi, tiles=tiles
            )

        img = np.asarray(jax.jit(traced)(gb, cam, probes, jnp.uint32(FI)))
        imgs[name] = img
        np.savez_compressed(
            f"/tmp/diag_{name}.npz", image=img.astype(np.float32)
        )
        print(f"{name}: mean {img.mean():.5f}", flush=True)

    ref = imgs["unfused_nocaps"]
    for name, img in imgs.items():
        d = np.linalg.norm(img - ref, axis=-1)
        r = np.linalg.norm(ref, axis=-1) + 1e-6
        print(json.dumps({
            "config": name,
            "px_over_1pct": round(float((d / r > 0.01).mean()), 5),
            "mean_rel": round(float((d / r).mean()), 5),
            "mean_ratio": round(float(img.mean() / ref.mean()), 5),
        }))


if __name__ == "__main__":
    main()
