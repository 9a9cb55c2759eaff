import jax.numpy as jnp
import numpy as np
import pytest

from unitysspathtracingurp_tpu import camera


@pytest.fixture
def cam():
    return camera.make_camera(
        eye=[0.0, 1.0, 5.0],
        target=[0.0, 1.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y=np.radians(60.0),
        aspect=1.0,
        near=0.1,
        far=100.0,
    )


def test_reversed_z_bounds(cam):
    # Point on the optical axis at the near plane -> raw depth 1.
    p_near = jnp.array([0.0, 1.0, 5.0 - 0.1])
    p_far = jnp.array([0.0, 1.0, 5.0 - 100.0])
    ndc_near = camera.world_to_ndc(cam.view_proj, p_near)
    ndc_far = camera.world_to_ndc(cam.view_proj, p_far)
    assert np.allclose(ndc_near[2], 1.0, atol=1e-4)
    assert np.allclose(ndc_far[2], 0.0, atol=1e-4)
    # Center of screen.
    assert np.allclose(ndc_near[:2], 0.5, atol=1e-4)


def test_project_unproject_roundtrip(cam):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-4.0, 4.0, size=64)  # keep in front of camera
    ndc = camera.world_to_ndc(cam.view_proj, jnp.asarray(pts))
    rec = camera.world_from_uv_depth(cam.inv_view_proj, ndc[:, :2], ndc[:, 2])
    # fp32 projective roundtrip: tolerance scales with eye depth (~0.5%
    # relative at the far end of the test range; same precision class as
    # the reference's fp32 depth pipeline).
    assert np.abs(np.asarray(rec) - pts).max() < 5e-2
    assert np.abs(np.asarray(rec) - pts).mean() < 1e-2


def test_linear_eye_depth(cam):
    # Raw 1 -> near, raw 0 -> far; a mid point is consistent with projection.
    assert np.allclose(camera.linear_eye_depth(jnp.array(1.0), 0.1, 100.0), 0.1)
    assert np.allclose(camera.linear_eye_depth(jnp.array(0.0), 0.1, 100.0), 100.0)
    p = jnp.array([0.3, 1.2, 5.0 - 7.0])  # eye depth 7 on the -z axis from cam
    ndc = camera.world_to_ndc(cam.view_proj, p)
    eye_depth = camera.linear_eye_depth(ndc[2], 0.1, 100.0)
    assert np.allclose(eye_depth, 7.0, rtol=1e-4)


def test_pixel_uv_convention():
    uv = camera.pixel_uv(4, 8)
    assert uv.shape == (4, 8, 2)
    assert np.allclose(uv[0, 0], [0.5 / 8, 0.5 / 4])  # bottom-left pixel
    assert np.allclose(uv[-1, -1], [7.5 / 8, 3.5 / 4])


def test_view_looks_down_negative_z(cam):
    # Target is straight ahead: view-space z must be negative.
    target_vs = cam.view @ jnp.array([0.0, 1.0, 0.0, 1.0])
    assert target_vs[2] < 0
    assert np.allclose(target_vs[:2], 0.0, atol=1e-6)
