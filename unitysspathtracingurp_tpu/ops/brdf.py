"""BRDF sampling and microfacet math (vectorized, pure jax.numpy).

Rebuild of the sampling/shading math the reference pulls from Unity's
core shader library plus its own helpers (PathTracingUtilities.hlsl:214-280
and URP BSDF/ImageBasedLighting includes). All formulas are the standard
published ones (GGX/Trowbridge-Reitz NDF sampling, height-correlated
Smith visibility, Schlick Fresnel, Burley/Disney diffuse, Duff et al.
branchless ONB); implemented here batched over pixel lanes.

Roughness convention matches the reference: ``roughness`` arguments are
*linear* roughness (= perceptualRoughness^2); the GGX alpha used in the
NDF is roughness^2, squared internally by the samplers.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.283185307179586
EPS = 1.1920929e-07  # REAL_EPS analog (fp32 machine epsilon)


def clamp_ndotv(ndotv):
    return jnp.maximum(ndotv, 1.0e-4)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def reflect(incident, normal):
    """Mirror ``incident`` (pointing *into* the surface) about ``normal``."""
    return incident - 2.0 * dot3(incident, normal)[..., None] * normal


def refract(incident, normal, eta):
    """Snell refraction of a unit incident direction (into the surface).

    Returns (direction, valid); on total internal reflection direction is
    zero and valid is False — callers fall back to reflection, matching
    HLSL refract()'s null-vector contract (PathTracing.hlsl:293-303).
    """
    eta = jnp.asarray(eta)
    cos_i = -dot3(incident, normal)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    valid = k >= 0.0
    k_safe = jnp.maximum(k, 0.0)
    d = eta[..., None] * incident + (eta * cos_i - jnp.sqrt(k_safe))[..., None] * normal
    return jnp.where(valid[..., None], d, 0.0), valid


def get_local_frame(normal):
    """Branchless orthonormal basis around ``normal`` (Duff et al. 2017,
    the same construction as Unity's GetLocalFrame). Returns (x, y, z=n),
    each (..., 3)."""
    x, y, z = normal[..., 0], normal[..., 1], normal[..., 2]
    sz = jnp.where(z >= 0.0, 1.0, -1.0)
    a = 1.0 / (sz + z)
    ya = y * a
    b = x * ya
    c = x * sz
    local_x = jnp.stack([c * x * a - 1.0, sz * b, c], axis=-1)
    local_y = jnp.stack([b, y * ya - sz, y], axis=-1)
    return local_x, local_y, normal


def to_world(local_vec, frame):
    """Local (tangent-space) vector -> world via frame rows (x, y, z)."""
    fx, fy, fz = frame
    return (
        local_vec[..., 0:1] * fx + local_vec[..., 1:2] * fy + local_vec[..., 2:3] * fz
    )


def to_local(world_vec, frame):
    fx, fy, fz = frame
    return jnp.stack(
        [dot3(world_vec, fx), dot3(world_vec, fy), dot3(world_vec, fz)], axis=-1
    )


def spherical_to_cartesian(phi, cos_theta):
    sin_theta = jnp.sqrt(saturate(1.0 - cos_theta * cos_theta))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def f_schlick(f0, u):
    """Schlick Fresnel with f90 = 1; ``f0`` may be scalar or (..., 3)."""
    x = (1.0 - u) ** 5
    if jnp.ndim(f0) > jnp.ndim(u):
        x = x[..., None]
    return f0 + (1.0 - f0) * x


def f_schlick_f90(f0, f90, u):
    """Schlick Fresnel with explicit grazing reflectance f90."""
    x = (1.0 - u) ** 5
    return f0 + (f90 - f0) * x


def v_smith_joint_ggx(ndotl, ndotv, roughness):
    """Height-correlated Smith visibility for GGX (Heitz 2014),
    V = G / (4 NdotL NdotV); alpha = roughness^2."""
    a2 = (roughness * roughness).astype(jnp.float32)
    lambda_v = ndotl * jnp.sqrt((-ndotv * a2 + ndotv) * ndotv + a2)
    lambda_l = ndotv * jnp.sqrt((-ndotl * a2 + ndotl) * ndotl + a2)
    return 0.5 / jnp.maximum(lambda_v + lambda_l, 1e-5)


def disney_diffuse_no_pi(ndotv, ndotl, ldotv, perceptual_roughness):
    """Burley diffuse, no 1/pi, with Unity's energy renormalization
    (1/1.03571). Uses the (2 LdotH^2 = 1 + LdotV) identity."""
    fd90 = 0.5 + (perceptual_roughness + perceptual_roughness * ldotv)
    light_scatter = f_schlick_f90(1.0, fd90, ndotl)
    view_scatter = f_schlick_f90(1.0, fd90, ndotv)
    return (1.0 / 1.03571) * light_scatter * view_scatter


def reflectivity_specular(specular_rgb):
    """Max3 of the specular color — the lobe-probability heuristic
    (EvaluateBRDF lobe weights, PathTracing.hlsl:266-269)."""
    return jnp.max(specular_rgb, axis=-1)


def sample_ggx_cos_theta(u1, roughness):
    """GGX NDF half-vector cos(theta): sqrt((1-u)/(1+(a^2-1)u)),
    a = roughness^2."""
    a = roughness * roughness
    denom = 1.0 + (a * a - 1.0) * u1
    return jnp.sqrt(saturate((1.0 - u1) / jnp.maximum(denom, 1e-12)))


def sample_ggx_dir(u, view, frame, roughness):
    """Sample a GGX half-vector and reflect: returns (L, NdotL, NdotH, VdotH).

    The SampleGGXDir analog (Unity ImageBasedLighting): H sampled around
    the frame's z (the normal), L = reflect(-V, H) in local space.
    """
    cos_theta = sample_ggx_cos_theta(u[..., 0], roughness)
    phi = TWO_PI * u[..., 1]
    local_h = spherical_to_cartesian(phi, cos_theta)
    ndoth = cos_theta
    local_v = to_local(view, frame)
    vdoth = saturate(dot3(local_v, local_h))
    local_l = -local_v + 2.0 * vdoth[..., None] * local_h
    ndotl = local_l[..., 2]
    light = to_world(local_l, frame)
    return light, ndotl, ndoth, vdoth


def sample_ggx_ndf(u, view, frame, roughness):
    """Sample only the GGX microfacet normal H (SampleGGXNDF analog,
    PathTracingUtilities.hlsl:214-251). Returns (H, NdotH, VdotH)."""
    cos_theta = sample_ggx_cos_theta(u[..., 0], roughness)
    phi = TWO_PI * u[..., 1]
    local_h = spherical_to_cartesian(phi, cos_theta)
    local_v = to_local(view, frame)
    vdoth = saturate(dot3(local_v, local_h))
    h = to_world(local_h, frame)
    return h, cos_theta, vdoth


def importance_sample_ggx_pdf(u, view, frame, roughness, ndotv):
    """GGX importance sample with weight-over-pdf, Fresnel applied outside
    (ImportanceSampleGGX_PDF analog, PathTracingUtilities.hlsl:253-280):
    weightOverPdf = 4 * Vis * NdotL * VdotH / NdotH, with the reference's
    degenerate-case fallback to 1 for mirror-smooth or grazing H."""
    light, ndotl, ndoth, vdoth = sample_ggx_dir(u, view, frame, roughness)
    ndotl = saturate(ndotl)
    vis = v_smith_joint_ggx(ndotl, ndotv, roughness)
    w = 4.0 * vis * ndotl * vdoth / jnp.maximum(ndoth, 1e-12)
    weight_over_pdf = jnp.where((roughness > 0.001) & (ndoth > 0.0), w, 1.0)
    return light, vdoth, ndotl, weight_over_pdf


def importance_sample_lambert(u, frame):
    """Cosine-weighted hemisphere sample around the frame normal.
    Returns (L, NdotL, weightOverPdf=1)."""
    r = jnp.sqrt(u[..., 0])
    phi = TWO_PI * u[..., 1]
    local_l = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(saturate(1.0 - u[..., 0]))],
        axis=-1,
    )
    ndotl = local_l[..., 2]
    light = to_world(local_l, frame)
    return light, ndotl, jnp.ones_like(ndotl)
