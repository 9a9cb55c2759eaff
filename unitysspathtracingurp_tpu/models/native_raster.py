"""ctypes loader for the native C++ rasterizer (native/rasterizer.cpp).

Builds the shared library with g++ on first use (cached next to the
source) and exposes ``intersect_scene_native`` with the same contract as
scene.intersect_scene. Falls back to the numpy path when the toolchain
or binary is unavailable — the native path is a host-runtime speedup
(~30x on large fixture rasterizations), not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .scene import Box, Quad, Sphere

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "rasterizer.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "_sspt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.sspt_intersect_scene.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.sspt_intersect_scene.restype = None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _pack_scene(prims):
    """Pack primitives by type, remembering original list indices."""
    spheres, quads, boxes = [], [], []
    order = []
    for i, p in enumerate(prims):
        if isinstance(p, Sphere):
            spheres.append((*p.center, p.radius))
            order.append(("s", i))
        elif isinstance(p, Quad):
            quads.append((*p.corner, *p.edge1, *p.edge2))
            order.append(("q", i))
        elif isinstance(p, Box):
            boxes.append((*p.box_min, *p.box_max))
            order.append(("b", i))
        else:
            raise TypeError(type(p))
    # packed order: spheres, quads, boxes -> original index remap
    remap = (
        [i for k, i in order if k == "s"]
        + [i for k, i in order if k == "q"]
        + [i for k, i in order if k == "b"]
    )
    return (
        np.asarray(spheres, np.float32).reshape(-1, 4),
        np.asarray(quads, np.float32).reshape(-1, 9),
        np.asarray(boxes, np.float32).reshape(-1, 6),
        np.asarray(remap, np.int32),
    )


def intersect_scene_native(prims, origins, dirs, backface=False):
    """Drop-in replacement for scene.intersect_scene, or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    spheres, quads, boxes, remap = _pack_scene(list(prims))
    o = np.ascontiguousarray(origins, np.float32)
    d = np.ascontiguousarray(dirs, np.float32)
    n_rays = o.shape[0]
    out_t = np.empty(n_rays, np.float32)
    out_n = np.empty((n_rays, 3), np.float32)
    out_i = np.empty(n_rays, np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    lib.sspt_intersect_scene(
        spheres.ctypes.data_as(fp), spheres.shape[0],
        quads.ctypes.data_as(fp), quads.shape[0],
        boxes.ctypes.data_as(fp), boxes.shape[0],
        o.ctypes.data_as(fp), d.ctypes.data_as(fp),
        n_rays, int(bool(backface)),
        out_t.ctypes.data_as(fp), out_n.ctypes.data_as(fp),
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    # Remap packed primitive ids back to original list order.
    idx = np.where(out_i >= 0, remap[np.clip(out_i, 0, len(remap) - 1)], -1)
    return out_t, out_n, idx.astype(np.int32)
