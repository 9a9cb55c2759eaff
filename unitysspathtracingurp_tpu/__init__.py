"""TPU-native screen-space path tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
jiaozi158/UnitySSPathTracingURP (a Unity URP screen-space path tracer).
Nothing here is a translation of the reference's HLSL/C#: the per-pixel
multi-bounce tracer is a jitted XLA program over the pixel grid
(ops/pathtrace.py, the parity oracle), with a TPU-tuned fast path that
moves the hot in-block marching into Pallas kernels where measurements
show a win (see docs/Performance.md for the measured gather cost model
that drives this split). Accumulation/denoising are jitted XLA ops over
pytrees, and multi-chip scaling is expressed with jax.sharding over a
device Mesh.

Conventions (documented once, used everywhere — see camera.py):
  * world space: right-handed, y up; camera looks down -Z in view space.
  * screen uv in [0,1]^2 with u right, v up; array index [row, col] with
    row 0 at the *bottom* of the image.
  * depth buffers hold raw reversed-Z device depth in [0,1]:
    1.0 at the near plane, 0.0 at the far plane (== sky sentinel).
"""

__version__ = "0.1.0"

from .config import PTConfig, PTSettings, PTVariants, NoiseMethod, DenoiserType
from .camera import Camera, make_camera
from .gbuffer import GBuffers, SurfaceData

__all__ = [
    "PTConfig",
    "PTSettings",
    "PTVariants",
    "NoiseMethod",
    "DenoiserType",
    "Camera",
    "make_camera",
    "GBuffers",
    "SurfaceData",
]
