"""Camera model: matrices, depth conventions, world/NDC transforms.

Single source of truth for the projection conventions (SURVEY.md flags
depth/NDC convention bugs as a primary hazard; reference behavior:
PathTracing.hlsl:63-72, ScreenSpacePathTracing.shader:130-134).

Conventions (fixed once, all fixtures encode them):
  * View space is right-handed; the camera looks down -Z.
  * Clip/NDC: x,y in [-1, 1]; depth is **reversed-Z** in [0, 1] with
    1.0 at the near plane and 0.0 at the far plane. Raw device depth of
    exactly 0.0 is the sky sentinel (UNITY_RAW_FAR_CLIP_VALUE analog).
  * Screen uv in [0, 1]^2, u right, v up. Pixel (row, col) of an (H, W)
    array has uv = ((col+0.5)/W, (row+0.5)/H) with row 0 at the bottom.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

RAW_FAR_CLIP = 0.0  # reversed-Z far-plane / sky sentinel


@struct.dataclass
class Camera:
    """Pytree of camera state for one frame.

    ``view_proj`` / ``inv_view_proj`` are the only matrices kernels use;
    ``position`` is the world-space camera origin; ``near``/``far`` feed
    the linear-eye-depth transform (the _ZBufferParams analog).
    """

    position: jnp.ndarray  # (3,) world-space camera position
    view: jnp.ndarray  # (4, 4) world -> view
    proj: jnp.ndarray  # (4, 4) view -> clip (reversed-Z)
    view_proj: jnp.ndarray  # (4, 4)
    inv_view_proj: jnp.ndarray  # (4, 4)
    near: jnp.ndarray  # () scalar
    far: jnp.ndarray  # () scalar


def perspective_reversed_z(fov_y: float, aspect: float, near: float, far: float):
    """Reversed-Z perspective projection.

    Maps view-space z=-near -> ndc z=1, z=-far -> ndc z=0, so raw device
    depth matches the reference's D3D convention (UNITY_REVERSED_Z path,
    PathTracing.hlsl:70-72 applies a fixup only on GL — we are always in
    the reversed-Z convention and need no fixup).
    """
    fy = 1.0 / jnp.tan(jnp.asarray(fov_y, jnp.float32) / 2.0)
    fx = fy / aspect
    n = jnp.asarray(near, jnp.float32)
    f = jnp.asarray(far, jnp.float32)
    a = n / (f - n)  # z_ndc = -a + b / z_eye  (z_eye = -z_view > 0)
    b = n * f / (f - n)
    proj = jnp.zeros((4, 4), jnp.float32)
    proj = proj.at[0, 0].set(fx)
    proj = proj.at[1, 1].set(fy)
    proj = proj.at[2, 2].set(a)
    proj = proj.at[2, 3].set(b)
    proj = proj.at[3, 2].set(-1.0)
    return proj


def look_at(eye, target, up):
    """World->view matrix; camera at ``eye`` looking at ``target``."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(right, fwd)
    rot = jnp.stack([right, true_up, -fwd])  # rows: view-space basis
    # precision=HIGHEST: eager jnp runs on the default backend, and
    # TPU default-precision matmul (bf16) would bake ~1e-3 relative
    # error into the camera coefficients themselves (r3 diagnosis).
    trans = -jnp.matmul(rot, eye, precision=jax.lax.Precision.HIGHEST)
    view = jnp.eye(4, dtype=jnp.float32)
    view = view.at[:3, :3].set(rot)
    view = view.at[:3, 3].set(trans)
    return view


def make_camera(eye, target, up, fov_y, aspect, near, far) -> Camera:
    view = look_at(eye, target, up)
    proj = perspective_reversed_z(fov_y, aspect, near, far)
    view_proj = jnp.matmul(proj, view, precision=jax.lax.Precision.HIGHEST)
    return Camera(
        position=jnp.asarray(eye, jnp.float32),
        view=view,
        proj=proj,
        view_proj=view_proj,
        inv_view_proj=jnp.linalg.inv(view_proj),
        near=jnp.asarray(near, jnp.float32),
        far=jnp.asarray(far, jnp.float32),
    )


def world_to_ndc(view_proj, position_ws):
    """Project world position(s) -> (u, v, raw_depth), uv in [0,1].

    The analog of ComputeNormalizedDeviceCoordinatesWithZ as used by the
    ray-march loop (reference: PathTracing.hlsl:63-64). ``position_ws``
    is (..., 3); returns (..., 3).
    """
    # Planar scalar expansion, NOT `p @ vp.T`: XLA:TPU lowers the
    # (..., 3) x (3, 3) dot at the default bf16 matmul precision, which
    # put up to ~2e-3 absolute error on u/v (≈ 1-3 texels at 1080p) —
    # enough to flip march skip tests and hit windows wholesale
    # (diagnosed r3; the fused Pallas schedule kernel computes this
    # expansion exactly and exposed the drift). Explicit muls+adds stay
    # in full f32 on every backend, and match fused_schedule's
    # `project` op-for-op.
    p = jnp.asarray(position_ws)
    m = view_proj
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    clipx = x * m[0, 0] + y * m[0, 1] + z * m[0, 2] + m[0, 3]
    clipy = x * m[1, 0] + y * m[1, 1] + z * m[1, 2] + m[1, 3]
    clipz = x * m[2, 0] + y * m[2, 1] + z * m[2, 2] + m[2, 3]
    w = x * m[3, 0] + y * m[3, 1] + z * m[3, 2] + m[3, 3]
    # Guard against w ~ 0 (points on the camera plane).
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return jnp.stack(
        [clipx / w * 0.5 + 0.5, clipy / w * 0.5 + 0.5, clipz / w], axis=-1
    )


def world_from_uv_depth(inv_view_proj, uv, raw_depth):
    """Reconstruct world position from screen uv + raw device depth.

    The analog of ComputeWorldSpacePosition(uv, depth, I_VP) as used by
    pass 0 (reference: ScreenSpacePathTracing.shader:134) and the
    temporal denoiser (PathTracingDenoise.hlsl:151-152).
    ``uv`` is (..., 2); ``raw_depth`` is (...); returns (..., 3).
    """
    # Planar expansion for the same reason as world_to_ndc: the TPU
    # default-precision (..., 4) x (4, 4) dot degraded reconstructed
    # world positions by ~cm at room scale.
    uv = jnp.asarray(uv)
    m = inv_view_proj
    nx = uv[..., 0] * 2.0 - 1.0
    ny = uv[..., 1] * 2.0 - 1.0
    d = raw_depth
    hx = nx * m[0, 0] + ny * m[0, 1] + d * m[0, 2] + m[0, 3]
    hy = nx * m[1, 0] + ny * m[1, 1] + d * m[1, 2] + m[1, 3]
    hz = nx * m[2, 0] + ny * m[2, 1] + d * m[2, 2] + m[2, 3]
    hw = nx * m[3, 0] + ny * m[3, 1] + d * m[3, 2] + m[3, 3]
    return jnp.stack([hx / hw, hy / hw, hz / hw], axis=-1)


def linear_eye_depth(raw_depth, near, far):
    """Raw reversed-Z device depth -> linear eye depth in [near, far].

    The analog of LinearEyeDepth(d, _ZBufferParams) (used throughout
    the march loop, PathTracing.hlsl:102-103). For reversed-Z:
    1/z_eye = raw * (1/near - 1/far) + 1/far.
    """
    zz = (1.0 / near - 1.0 / far)
    zw = 1.0 / far
    return 1.0 / (raw_depth * zz + zw)


def pixel_uv(height: int, width: int, dtype=jnp.float32, row0=0, full_height=None):
    """Per-pixel uv grid, shape (H, W, 2); row 0 = bottom of image.

    With ``row0``/``full_height``, produces the uv grid of a row block
    [row0, row0+height) of a taller image — used for tile-sharded
    tracing over a replicated G-buffer (multi-chip path)."""
    fh = height if full_height is None else full_height
    v = (jnp.arange(height, dtype=dtype) + jnp.asarray(row0, dtype) + 0.5) / fh
    u = (jnp.arange(width, dtype=dtype) + 0.5) / width
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    return jnp.stack([uu, vv], axis=-1)


def pixel_spread_angle_tangent(fov_y: float, width: int, height: int) -> float:
    """Reference: _PixelSpreadAngleTangent = tan(fov/2) * 2 / min(w, h)
    (ScreenSpacePathTracingAccumulation.cs:880-896)."""
    import math

    return math.tan(fov_y / 2.0) * 2.0 / min(width, height)
