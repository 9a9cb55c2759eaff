"""Image-space math helpers: luminance, HSV firefly clamp, oct normals."""

from __future__ import annotations

import jax.numpy as jnp


def luminance(rgb):
    """Rec.709 luma (Unity's Luminance())."""
    return (
        0.2126729 * rgb[..., 0] + 0.7151522 * rgb[..., 1] + 0.0721750 * rgb[..., 2]
    )


def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # Select chains instead of jnp.choose: choose lowers to per-element
    # 3D gathers, which are scalar-slow on TPU.
    def pick(options):
        out = options[0]
        for k in range(1, 6):
            out = jnp.where(i == k, options[k], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def clamp_brightness_hsv(rgb, max_brightness):
    """Firefly suppression: clamp the HSV value channel to max_brightness
    (reference: ScreenSpacePathTracing.shader:141-144 in pass 0)."""
    hsv = rgb_to_hsv(rgb)
    hsv = hsv.at[..., 2].set(jnp.clip(hsv[..., 2], 0.0, max_brightness))
    return hsv_to_rgb(hsv)


def oct_normal_encode(normal):
    """World normal -> the _GBUFFER_NORMALS_OCT packed representation's
    intermediate [0,1]^2 oct coordinates."""
    from ..ops.envprobe import oct_encode

    return oct_encode(normal)


def oct_normal_decode(oct_uv):
    from ..ops.envprobe import oct_decode

    return oct_decode(oct_uv)
