"""Price the temporal pass both ways at 1080p on the chip
(PTConfig.packed_temporal: one (H*W, 8) row table + 9 wide gathers vs
~24 channel-plane takes). Honest scalar-reduction timing.

Usage: python scripts/probe_temporal_packed.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

from unitysspathtracingurp_tpu.utils.jaxenv import setup_jax  # noqa: E402

setup_jax()
import jax.numpy as jnp  # noqa: E402

from unitysspathtracingurp_tpu.config import PTConfig  # noqa: E402
from unitysspathtracingurp_tpu.models import fixtures, scene  # noqa: E402
from unitysspathtracingurp_tpu.camera import pixel_spread_angle_tangent  # noqa: E402
from unitysspathtracingurp_tpu.ops.temporal import (  # noqa: E402
    TemporalState,
    temporal_reproject,
)

H, W = 1080, 1920


def main():
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    cam2 = fixtures.box_scene_camera(H, W, jitter=0.01)
    gb = fixtures.rasterize_gbuffers(sc, cam2, H, W, prev_cam=cam)
    rng = np.random.default_rng(0)
    state = TemporalState.create(H, W, cam)
    state = state.replace(
        history_color=jnp.asarray(rng.random((H, W, 3), np.float32)),
        history_sample=jnp.asarray((rng.random((H, W)) * 9).astype(np.float32)),
        history_depth=gb.layer1_depth(),
        history_emission=gb.emission,
    )
    noisy = jnp.asarray(rng.random((H, W, 3), np.float32))
    spread = pixel_spread_angle_tangent(np.radians(50.0), W, H)

    out = {}
    for name, packed in (("unpacked", False), ("packed", True)):
        cfg = dataclasses.replace(PTConfig(), packed_temporal=packed)

        def f(noisy, state):
            r = temporal_reproject(
                noisy, gb, cam2, state, gb.emission, cfg,
                temporal_intensity=0.93, pixel_spread_angle_tangent=spread,
            )
            return jnp.sum(r.color) + jnp.sum(r.sample_count)

        fj = jax.jit(f)
        float(fj(noisy, state))  # compile
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            v = float(fj(noisy, state))
        dt = (time.perf_counter() - t0) / iters
        out[name] = round(dt * 1e3, 2)
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)

    out["speedup"] = round(out["unpacked"] / out["packed"], 2)
    print(json.dumps({"metric": "temporal_reproject 1080p ms", **out}))


if __name__ == "__main__":
    main()
