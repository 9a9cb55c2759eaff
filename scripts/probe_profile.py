"""Round-3 probe: op-level TPU profile of the headline hiz frame.

Captures a jax.profiler trace of the R=4 1080p frame and prints the
top HLO ops by self time (via tensorboard_plugin_profile's xplane
converter) — replaces ablation guesswork with measured attribution.

Usage: python scripts/probe_profile.py [comp|headline]
  comp     = r3-era compaction caps
  headline = the EXACT shipped bench config (PTConfig.boxscene_headline:
             tight caps + fused front half) — round-5 attribution
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unitysspathtracingurp_tpu.config import PTConfig, PTSettings  # noqa: E402
from unitysspathtracingurp_tpu.models import fixtures, scene  # noqa: E402
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe  # noqa: E402
from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles  # noqa: E402
from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz  # noqa: E402

H, W = 1080, 1920


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "dense"
    comp = mode == "comp"
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(maximum_depth=4, samples_per_pixel=1,
                          maximum_steps=24, dithering=False)
    if mode == "headline":
        cfg = PTConfig.boxscene_headline()
    elif comp:
        cfg = PTConfig(compaction_caps=(1.0, 0.5, 0.3125, 0.25))
    else:
        cfg = PTConfig()
    variants = settings.variants()
    tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)
    fi = jnp.uint32(33)

    @jax.jit
    def f(gb, cam, probes, fi):
        return trace_frame_hiz(
            gb, cam, probes, settings, cfg, variants, fi, tiles=tiles
        ).sum()

    print("compiling ...", flush=True)
    t0 = time.perf_counter()
    float(f(gb, cam, probes, fi))
    print(f"compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        float(f(gb, cam, probes, fi))
    print(f"frame: {(time.perf_counter()-t0)/3*1000:.1f} ms", flush=True)

    logdir = "/tmp/jax_trace_" + mode
    with jax.profiler.trace(logdir):
        for _ in range(3):
            float(f(gb, cam, probes, fi))

    xs = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    print("xplanes:", xs, flush=True)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xs, "framework_op_stats", {})
    out = logdir + "_opstats.json"
    with open(out, "w") as fo:
        fo.write(data if isinstance(data, str) else data.decode())
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
