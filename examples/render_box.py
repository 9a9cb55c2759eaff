"""Demo: converge the BoxScene offline and write PPM snapshots.

    python examples/render_box.py [--glass] [--realtime] [--frames N]
                                  [--size 256] [--out /tmp]

Writes <out>/box_<mode>.ppm (plus a mid-convergence snapshot) — the
analog of the reference demo scenes' golden screenshots.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def write_ppm(path: str, image: np.ndarray):
    """Tonemap (simple Reinhard + gamma) and write a binary PPM."""
    img = np.asarray(image, np.float32)
    img = img / (1.0 + img)
    img = np.clip(img ** (1.0 / 2.2), 0.0, 1.0)
    img = (img * 255.0 + 0.5).astype(np.uint8)
    img = img[::-1]  # row 0 is the bottom in our convention
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())
    print("wrote", path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glass", action="store_true")
    ap.add_argument("--realtime", action="store_true")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default="/tmp")
    args = ap.parse_args()

    import jax

    from unitysspathtracingurp_tpu.utils.jaxenv import setup_jax

    setup_jax()

    from unitysspathtracingurp_tpu.config import (
        DenoiserType,
        PTSettings,
        ThicknessMode,
    )
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.models.renderer import Renderer

    H = W = args.size
    sc = scene.build_box_scene(with_glass=args.glass)
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(
        sc, cam, H, W, prev_cam=cam, with_backface=args.glass
    )

    settings = PTSettings(
        maximum_depth=4,
        samples_per_pixel=1,
        maximum_steps=32,
        denoiser=DenoiserType.TEMPORAL if args.realtime else DenoiserType.OFFLINE,
        support_refraction=args.glass,
        accurate_thickness=ThicknessMode.DEPTH_NORMALS
        if args.glass
        else ThicknessMode.CONSTANT,
        maximum_samples=max(args.frames, 4),
        progress_bar=False,
        dithering=False,
    )
    # The reference BoxScene's 3 baked reflection probes, closest-2
    # bound to the camera (PathTracingSetReflectionProbe.cs:49-83) —
    # probe sampling is the env light on every ray miss.
    probes = fixtures.box_scene_probes(sc, camera_position=cam.position)
    r = Renderer(settings, H, W, probes=probes)

    image = None
    for i in range(args.frames):
        image = r.render_frame(gb, cam)
        if i == args.frames // 4:
            mode = "realtime" if args.realtime else "offline"
            write_ppm(
                os.path.join(args.out, f"box_{mode}_early.ppm"), np.asarray(image)
            )
    mode = "realtime" if args.realtime else "offline"
    suffix = "_glass" if args.glass else ""
    write_ppm(os.path.join(args.out, f"box_{mode}{suffix}.ppm"), np.asarray(image))


if __name__ == "__main__":
    main()
