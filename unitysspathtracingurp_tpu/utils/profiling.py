"""Tracing/profiling helpers (SURVEY.md §5.1).

The reference wraps every pass in named GPU profiler markers
(ProfilingScope, cs:521-522 etc.). The TPU equivalents: jax named
scopes on every pass function (visible in XLA/perfetto traces) and a
small context manager to capture a trace directory.
"""

from __future__ import annotations

import contextlib
import time

import jax

# Pass names mirror the reference's ProfilingSampler labels.
PASS_PATH_TRACING = "Screen Space Path Tracing"
PASS_ACCUMULATION = "Path Tracing Accumulation"
PASS_BACKFACE = "Path Tracing Backface Data"
PASS_TRANSPARENT = "Path Tracing Transparent GBuffer"
PASS_FORWARD = "Path Tracing Forward GBuffer"
# Sub-passes of the accumulation shader (distinct blits in the
# reference; distinct jitted stages here).
PASS_OFFLINE_ACCUM = "Path Tracing Offline Accumulation"
PASS_DENOISE = "Path Tracing Denoising"
PASS_UPSCALE = "Path Tracing Upscale"


def named_pass(name: str):
    """Decorator: wrap a pass function in a jax.named_scope marker."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", "pass")
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return deco


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a perfetto/tensorboard device trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameTimer:
    """Rolling frame timer surfacing seconds-per-frame and Mrays/s
    (SURVEY.md §5.5 observability)."""

    def __init__(self):
        self.last = None
        self.dt = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        if self.last is not None:
            self.dt = now - self.last
        self.last = now
        return self.dt
