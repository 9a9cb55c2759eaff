"""Benchmark metrics: ray-throughput accounting, RMSE, convergence.

The BASELINE.md metrics (Mrays/sec/chip, frames-to-converge, RMSE vs
reference) surfaced per step (SURVEY.md §5.5).
"""

from __future__ import annotations

import numpy as np


def rays_per_frame(height: int, width: int, spp: int, bounces: int, sky_fraction: float = 0.0) -> float:
    """Rays cast per traced frame: every non-sky pixel casts spp paths of
    (1 primary-shortcut + up to ``bounces`` marched rays). We count the
    *marched* rays (the work unit of the kernel); primary hits are free
    G-buffer reads. Russian roulette terminates some early — this is the
    upper bound the reference would quote (rays launched)."""
    active_pixels = height * width * (1.0 - sky_fraction)
    return active_pixels * spp * bounces


def mrays_per_sec(height, width, spp, bounces, seconds_per_frame, sky_fraction=0.0) -> float:
    return rays_per_frame(height, width, spp, bounces, sky_fraction) / seconds_per_frame / 1e6


def rmse(a: np.ndarray, b: np.ndarray, mask: np.ndarray | None = None) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = (a - b) ** 2
    if mask is not None:
        d = d[np.asarray(mask)]
    return float(np.sqrt(d.mean()))


def relative_rmse(a, b, mask=None) -> float:
    """RMSE normalized by the reference mean (the <=1% budget metric)."""
    b64 = np.asarray(b, np.float64)
    denom = float(b64[np.asarray(mask)].mean() if mask is not None else b64.mean())
    return rmse(a, b, mask) / max(denom, 1e-12)


def frames_to_converge(frames, reference, threshold=0.01, mask=None):
    """Number of accumulated frames until relative RMSE <= threshold;
    ``frames`` is an iterable of running accumulation images."""
    for i, img in enumerate(frames):
        if relative_rmse(img, reference, mask) <= threshold:
            return i + 1
    return -1
