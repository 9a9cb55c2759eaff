"""Native C++ rasterizer vs the numpy oracle."""

import numpy as np
import pytest

from unitysspathtracingurp_tpu.models import native_raster, scene
from unitysspathtracingurp_tpu.models.scene import _intersect_scene_numpy


@pytest.mark.skipif(not native_raster.available(), reason="no native lib/toolchain")
@pytest.mark.parametrize("backface", [False, True])
def test_native_matches_numpy(backface):
    sc = scene.build_box_scene(with_glass=True)
    rng = np.random.default_rng(0)
    n = 4096
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 3.5, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t_n, n_n, i_n = native_raster.intersect_scene_native(
        sc.primitives, o, d, backface
    )
    t_p, n_p, i_p = _intersect_scene_numpy(list(sc.primitives), o, d, backface)

    hit_n = np.isfinite(t_n)
    hit_p = np.isfinite(t_p)
    assert (hit_n == hit_p).mean() > 0.999
    both = hit_n & hit_p
    assert np.allclose(t_n[both], t_p[both], atol=1e-3)
    # Ties at identical distances may pick different prims; require match
    # wherever distances are strictly ordered.
    assert (i_n[both] == i_p[both]).mean() > 0.995
    assert np.allclose(n_n[both], n_p[both], atol=1e-3)


@pytest.mark.skipif(not native_raster.available(), reason="no native lib/toolchain")
def test_native_speedup_sanity():
    import time

    sc = scene.build_box_scene()
    rng = np.random.default_rng(1)
    n = 100_000
    o = np.broadcast_to(np.array([0, 1.5, 6.5], np.float32), (n, 3)).copy()
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t0 = time.perf_counter()
    native_raster.intersect_scene_native(sc.primitives, o, d)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _intersect_scene_numpy(list(sc.primitives), o, d)
    t_numpy = time.perf_counter() - t0
    # The native path must at least not be slower.
    assert t_native < t_numpy * 1.5
