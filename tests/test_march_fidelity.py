"""March-fidelity decomposition gate (VERDICT r1 weak item 7).

The e2e oracle gap (converged render vs the ideal world-space tracer,
~30% rel RMSE, docs/Performance.md) is claimed to be the *march
approximation level* — the reference's own screen-space thickness
heuristics and hit rules (PathTracing.hlsl:7-254), reproduced by
design. This test proves that decomposition at the march level and
pins it: against analytic ray-scene visibility, the march must

  * find >= the pinned fraction of analytically screen-visible hits
    (recall), and
  * place them within a pinned distance of the analytic hit point.

A change that degrades march fidelity by >= 2% absolute recall fails
here even if the loose e2e RMSE gate would still pass.
"""

import numpy as np
import jax.numpy as jnp

from unitysspathtracingurp_tpu.camera import (
    linear_eye_depth,
    pixel_uv,
    world_from_uv_depth,
    world_to_ndc,
)
from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
from unitysspathtracingurp_tpu.gbuffer import uv_to_pixel
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.models.scene import intersect_scene
from unitysspathtracingurp_tpu.ops import pathtrace


def _fidelity(h=160, w=160, seed=5):
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(h, w)
    gb = fixtures.rasterize_gbuffers(sc, cam, h, w)
    uv = pixel_uv(h, w)
    depth = gb.depth
    pos_ws = world_from_uv_depth(cam.inv_view_proj, uv, depth)
    n = gb.normal
    view_dir = pos_ws - cam.position
    view_dir = view_dir / jnp.linalg.norm(view_dir, axis=-1, keepdims=True)

    # Deterministic pseudo-random bounce directions in the normal
    # hemisphere (a diffuse-like field; fixed seed pins the sample set).
    rng = np.random.default_rng(seed)
    rd = rng.normal(size=(h, w, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    nn = np.asarray(n)
    flip = (rd * nn).sum(-1) < 0.0
    rd = np.where(flip[..., None], -rd, rd)
    d = jnp.asarray(rd)

    alive = depth != 0.0
    origin = pos_ws + n * 1e-4
    scene_dist = linear_eye_depth(depth, cam.near, cam.far)
    zero = jnp.zeros((h, w), jnp.float32)
    cfg = PTConfig()
    settings = PTSettings(maximum_steps=24, dithering=False)
    variants = settings.variants()

    march = pathtrace.ray_march(
        cfg, settings, variants, gb, cam, origin, d, zero, zero,
        -view_dir, scene_dist, alive,
    )

    # Analytic ground truth: nearest scene intersection per ray.
    o_np = np.asarray(origin).reshape(-1, 3)
    d_np = np.asarray(d).reshape(-1, 3)
    t, _, idx = intersect_scene(list(sc.primitives), o_np, d_np)
    ana_hit = np.isfinite(t).reshape(h, w)
    ana_point = (o_np + d_np * np.where(np.isfinite(t), t, 0.0)[:, None]).reshape(h, w, 3)

    # Screen-space-visible analytic hits: the hit projects on-screen AND
    # is the front surface at its pixel (its depth matches the depth
    # buffer within a small linear tolerance) AND lies within the
    # march's reach (cumulative step budget).
    ndc = np.asarray(world_to_ndc(cam.view_proj, jnp.asarray(ana_point)))
    on_screen = (
        (ndc[..., 0] > 0.0) & (ndc[..., 0] < 1.0)
        & (ndc[..., 1] > 0.0) & (ndc[..., 1] < 1.0)
    )
    iy, ix = uv_to_pixel(jnp.asarray(ndc[..., :2]), h, w)
    buf_raw = np.asarray(gb.depth)[np.asarray(iy), np.asarray(ix)]
    lin = lambda r: np.asarray(  # noqa: E731
        linear_eye_depth(jnp.asarray(r), cam.near, cam.far)
    )
    front_match = np.abs(lin(buf_raw) - lin(ndc[..., 2])) < 0.05
    reach = t.reshape(h, w) < 4.0  # 6*0.005+12*0.1+large-tier reach, conservative
    visible = ana_hit & on_screen & front_match & reach & np.asarray(alive)

    m_hit = np.asarray(march.hit)
    recall = m_hit[visible].mean()
    pos_err = np.linalg.norm(np.asarray(march.position) - ana_point, axis=-1)
    med_err = np.median(pos_err[visible & m_hit])
    return recall, med_err, m_hit, visible


def test_march_recall_pinned():
    recall, med_err, m_hit, visible = _fidelity()
    # Pinned at measured level (see docs/Performance.md quality section)
    # minus a 2% regression margin: fails if march fidelity regresses.
    assert recall >= _PINNED_RECALL - 0.02, f"march recall {recall:.4f}"
    assert med_err < 0.05, f"median hit position error {med_err:.4f} m"


# Measured on the parity tracer at 160x160, seed 5: recall 0.884,
# median hit-position error 1.5 cm. The ~12% of screen-visible analytic
# hits the march misses ARE the march approximation (thickness windows,
# step discretization, no binary search for front rays) — the measured
# decomposition of the e2e oracle gap. Update only with a
# quality-improving change, never to paper over a regression.
_PINNED_RECALL = 0.88
