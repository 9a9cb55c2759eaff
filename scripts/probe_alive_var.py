"""Round-3 probe: alive-fraction variance across frame seeds at the
headline config — sets honest between-bounce compaction caps
(PTConfig.compaction_caps) with measured headroom instead of the
conservative r2 guesses (0.5/0.3125/0.25 vs true 0.25/0.15/0.12).
"""

import sys

from unitysspathtracingurp_tpu.utils.jaxenv import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unitysspathtracingurp_tpu.config import PTConfig, PTSettings  # noqa: E402
from unitysspathtracingurp_tpu.models import fixtures, scene  # noqa: E402
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe  # noqa: E402
from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles  # noqa: E402
from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz  # noqa: E402

H, W = 1080, 1920


def main():
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(maximum_depth=4, samples_per_pixel=1,
                          maximum_steps=24, dithering=False)
    cfg = PTConfig()  # no compaction: alive counts are exact
    variants = settings.variants()
    tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)

    n = H * W
    maxima = [0.0] * 4
    for i in range(14):
        fi = jnp.uint32((33 * (i + 1)) % 64000)
        dbg = {}
        out = trace_frame_hiz(gb, cam, probes, settings, cfg, variants, fi,
                              tiles=tiles, _debug_out=dbg)
        out.block_until_ready()
        fr = [float(dbg[f"alive_in_b{b}"]) / n for b in range(4)]
        maxima = [max(m, f) for m, f in zip(maxima, fr)]
        print(f"fi={int(fi):6d} alive: " + " ".join(f"{f:.4f}" for f in fr),
              flush=True)
    print("max over seeds:", " ".join(f"{m:.4f}" for m in maxima))
    print("caps @1.25x headroom:",
          [round(min(1.0, m * 1.25), 4) for m in maxima])


if __name__ == "__main__":
    sys.exit(main())
