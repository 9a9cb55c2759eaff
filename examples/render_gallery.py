"""Demo gallery: render every analytic demo scene to PPM snapshots —
the analog of the reference's Documentation/Images gallery (BoxScene,
classroom, figure; README.md:10-46).

    python examples/render_gallery.py --scene classroom [--frames N]
                                      [--size 256] [--out /tmp]
    python examples/render_gallery.py --scene figure
    python examples/render_gallery.py --scene motion   # temporal demo

`motion` renders a camera dolly with the real-time (temporal + À-Trous)
pipeline and writes several frames along the path — the moving-camera
demo the reference shows as "Real-time Accumulation".

On the tunneled TPU run ONE scene per process (see docs/Performance.md
quirks); on CPU any size <= 256 is fine.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from render_box import write_ppm  # noqa: E402  (same tonemap everywhere)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", choices=["classroom", "figure", "motion"],
                    default="classroom")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default="/tmp")
    args = ap.parse_args()

    import jax

    from unitysspathtracingurp_tpu.utils.jaxenv import setup_jax

    setup_jax()

    from unitysspathtracingurp_tpu.config import (
        DenoiserType,
        NoiseMethod,
        PTSettings,
    )
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.models.renderer import Renderer

    H = W = args.size

    if args.scene == "motion":
        # Real-time pipeline on a dolly through the box: per-frame
        # camera + motion vectors, temporal reprojection + À-Trous.
        sc = scene.build_box_scene()
        settings = PTSettings(
            maximum_depth=2,
            maximum_steps=24,
            denoiser=DenoiserType.SPATIAL_TEMPORAL,
            progress_bar=False,
            dithering=False,
        )
        # Baked BoxScene probes, rebound per frame as the dolly moves
        # (the binder's per-frame closest-2 selection, cs:49-83).
        r = Renderer(
            settings, H, W,
            probes=fixtures.box_scene_probes(sc),
        )
        prev_cam = None
        for i in range(args.frames):
            t = i / max(args.frames - 1, 1)
            # Dolly: slide the eye sideways through 0.6 world units.
            cam = fixtures.box_scene_camera(H, W, jitter=0.6 * t - 0.3)
            gb = fixtures.rasterize_gbuffers(
                sc, cam, H, W, prev_cam=prev_cam if prev_cam is not None else cam
            )
            image = r.render_frame(gb, cam)
            if i in (0, args.frames // 2, args.frames - 1):
                write_ppm(
                    os.path.join(args.out, f"motion_f{i:03d}.ppm"),
                    np.asarray(image),
                )
            prev_cam = cam
        return

    if args.scene == "classroom":
        sc = scene.build_classroom_scene()
        cam = fixtures.classroom_camera(H, W)
    else:
        sc = scene.build_figure_scene()
        cam = fixtures.figure_camera(H, W)

    gb = fixtures.rasterize_gbuffers(sc, cam, H, W, prev_cam=cam)
    settings = PTSettings(
        maximum_depth=4,
        maximum_steps=32,
        denoiser=DenoiserType.OFFLINE,
        maximum_samples=max(args.frames, 4),
        noise_method=NoiseMethod.SOBOL_OWEN,
        progress_bar=False,
        dithering=False,
    )
    r = Renderer(settings, H, W)
    image = None
    for _ in range(args.frames):
        image = r.render_frame(gb, cam)
    write_ppm(
        os.path.join(args.out, f"{args.scene}.ppm"), np.asarray(image)
    )


if __name__ == "__main__":
    main()
