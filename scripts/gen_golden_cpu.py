"""Regenerate the CPU golden fixture (box256_golden_cpu.npz).

Same-platform golden for tests/test_e2e.py::test_golden_fixture_regression
(CPU vs TPU fp32 legitimately flips ~1% of chaotic march branches, so
the CI gate needs a CPU-rendered reference). 4096 one-spp frames,
parity tracer, BoxScene 256² 1 bounce, packed decode (the production
default the gate's render uses), seed stream disjoint from the gate's
(7919 + 33i vs 33i: 7919 % 33 != 0).

Run: JAX_PLATFORMS=cpu python scripts/gen_golden_cpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "fixtures",
    "box256_golden_cpu.npz",
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame

    R = 256
    n = 4096
    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(R, R)
    gb = fixtures.rasterize_gbuffers(sc, cam, R, R)
    probes = ProbeSet(probe0=constant_probe([0.0, 0.0, 0.0]))
    settings = PTSettings(
        maximum_depth=1, samples_per_pixel=1, maximum_steps=24, dithering=False
    )
    cfg = PTConfig(march_unroll=4)
    variants = settings.variants()
    f = jax.jit(
        lambda fi: trace_frame(gb, cam, probes, settings, cfg, variants, fi)
    )
    acc = np.zeros((R, R, 3), np.float64)
    t0 = time.time()
    for i in range(n):
        acc += np.asarray(f(jnp.uint32((7919 + 33 * i) % 64000)))
        if (i + 1) % 256 == 0:
            print(f"# {i + 1}/{n} ({time.time() - t0:.0f}s)", flush=True)
    np.savez_compressed(OUT, image=(acc / n).astype(np.float32))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
