"""Alive-fraction / compaction-cap probe at the headline config.

Two modes:
  * default — measure per-bounce alive fractions over frame seeds with
    compaction DISABLED (exact counts), to inform cap tuning.
  * --check-caps — run the SHIPPED headline config
    (PTConfig.boxscene_headline) over the seeds and assert zero
    compacted-lane drops at every bounce (the on-chip companion to
    tests/test_compaction.py::test_headline_caps_zero_drop: overflow
    lanes past a cap keep their round-1 state, so a nonzero drop means
    the caps silently change images — ADVICE r3).
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
SEEDS = 14


def main():
    check_caps = "--check-caps" in sys.argv
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(maximum_depth=4, samples_per_pixel=1,
                          maximum_steps=24, dithering=False)
    # default: no compaction, alive counts are exact per bounce.
    cfg = PTConfig.boxscene_headline() if check_caps else PTConfig()
    variants = settings.variants()
    tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)

    # One compiled stats fn reused across seeds (ADVICE r3: the eager
    # 14-iteration loop recompiled/ran dramatically slower than the
    # jitted debug-dict pattern of probe_r3_phases.py).
    @jax.jit
    def stats(fi):
        dbg = {}
        out = trace_frame_hiz(gb, cam, probes, settings, cfg, variants, fi,
                              tiles=tiles, _debug_out=dbg)
        keep = {k: v for k, v in dbg.items()
                if "alive_in_b" in k or "compact_drop" in k}
        return jnp.sum(out), keep

    n = H * W
    maxima = [0.0] * 4
    total_drops = 0
    for i in range(SEEDS):
        fi = jnp.uint32((33 * (i + 1)) % 64000)
        _, dbg = stats(fi)
        fr = [float(dbg[f"alive_in_b{b}"]) / n for b in range(4)]
        maxima = [max(m, f) for m, f in zip(maxima, fr)]
        drops = {k: int(v) for k, v in dbg.items() if "compact_drop" in k}
        total_drops += sum(drops.values())
        line = f"fi={int(fi):6d} alive: " + " ".join(f"{f:.4f}" for f in fr)
        if check_caps:
            line += "  drops: " + (str(drops) if any(drops.values()) else "0")
        print(line, flush=True)
    print("max over seeds:", " ".join(f"{m:.4f}" for m in maxima))
    print("caps @1.25x headroom:",
          [round(min(1.0, m * 1.25), 4) for m in maxima])
    if check_caps:
        print(f"total drops over {SEEDS} seeds: {total_drops}")
        if total_drops:
            print("FAIL: shipped caps drop alive rays", file=sys.stderr)
            return 1
        print("OK: shipped headline caps are zero-drop on every seed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
