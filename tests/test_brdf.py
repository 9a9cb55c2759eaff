import jax
import jax.numpy as jnp
import numpy as np

from unitysspathtracingurp_tpu.ops import brdf


def test_local_frame_orthonormal():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    fx, fy, fz = brdf.get_local_frame(jnp.asarray(n))
    fx, fy, fz = np.asarray(fx), np.asarray(fy), np.asarray(fz)
    for a, b in [(fx, fy), (fy, fz), (fx, fz)]:
        assert np.abs((a * b).sum(-1)).max() < 1e-5
    for a in (fx, fy):
        assert np.abs(np.linalg.norm(a, axis=-1) - 1).max() < 1e-5


def test_to_world_roundtrip():
    rng = np.random.default_rng(2)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    frame = brdf.get_local_frame(jnp.asarray(n))
    v = rng.normal(size=(64, 3)).astype(np.float32)
    back = brdf.to_world(brdf.to_local(jnp.asarray(v), frame), frame)
    assert np.allclose(np.asarray(back), v, atol=1e-5)


def test_reflect_refract():
    n = jnp.array([0.0, 0.0, 1.0])
    i = brdf.normalize(jnp.array([1.0, 0.0, -1.0]))
    r = brdf.reflect(i, n)
    assert np.allclose(np.asarray(r), np.array([1, 0, 1]) / np.sqrt(2), atol=1e-6)
    # Refraction into denser medium bends toward normal.
    d, valid = brdf.refract(i, n, 1.0 / 1.5)
    assert bool(valid)
    d = np.asarray(d)
    # Snell: sin_t = sin_i / 1.5
    assert np.allclose(np.abs(d[0]), np.sin(np.arcsin(1 / np.sqrt(2)) ) / 1.5, atol=1e-5)
    # TIR going out at a grazing angle.
    i2 = brdf.normalize(jnp.array([0.95, 0.0, -0.31224990]))
    _, valid2 = brdf.refract(i2, n, 1.5)
    assert not bool(valid2)


def test_cosine_sampling_distribution():
    # Cosine-weighted sampling: E[NdotL] = 2/3.
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.uniform(size=(20000, 2)).astype(np.float32))
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (20000, 3))
    frame = brdf.get_local_frame(n)
    l, ndotl, w = brdf.importance_sample_lambert(u, frame)
    assert np.asarray(ndotl).min() >= 0
    assert abs(np.asarray(ndotl).mean() - 2 / 3) < 0.01
    assert np.allclose(np.asarray(w), 1.0)
    assert np.abs(np.linalg.norm(np.asarray(l), axis=-1) - 1).max() < 1e-4


def test_ggx_sampling_mirror_limit():
    # roughness -> 0: sampled L approaches the mirror reflection of V.
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.uniform(size=(512, 2)).astype(np.float32))
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (512, 3))
    frame = brdf.get_local_frame(n)
    v = jnp.broadcast_to(brdf.normalize(jnp.array([0.5, 0.0, 1.0])), (512, 3))
    roughness = jnp.full((512,), 1e-4)
    ndotv = brdf.clamp_ndotv(brdf.dot3(n, v))
    l, vdoth, ndotl, w = brdf.importance_sample_ggx_pdf(u, v, frame, roughness, ndotv)
    mirror = np.asarray(brdf.reflect(-v, n))
    assert np.abs(np.asarray(l) - mirror).max() < 1e-2
    assert np.allclose(np.asarray(w), 1.0)  # degenerate fallback weight


def test_ggx_furnace_energy_bounded():
    # weightOverPdf * F(=1) must keep bounded energy for mid roughness.
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.uniform(size=(50000, 2)).astype(np.float32))
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (50000, 3))
    frame = brdf.get_local_frame(n)
    v = jnp.broadcast_to(brdf.normalize(jnp.array([0.3, 0.1, 1.0])), (50000, 3))
    roughness = jnp.full((50000,), 0.25)
    ndotv = brdf.clamp_ndotv(brdf.dot3(n, v))
    _, _, _, w = brdf.importance_sample_ggx_pdf(u, v, frame, roughness, ndotv)
    mean_w = float(np.asarray(w).mean())
    # White-furnace-ish: integral of G-weighted lobe is <= 1 (shadowing).
    assert 0.5 < mean_w <= 1.05


def test_schlick_and_disney():
    f = brdf.f_schlick(jnp.asarray(0.04), jnp.asarray(1.0))
    assert np.allclose(np.asarray(f), 0.04)
    f_grazing = brdf.f_schlick(jnp.asarray(0.04), jnp.asarray(0.0))
    assert np.allclose(np.asarray(f_grazing), 1.0)
    d = brdf.disney_diffuse_no_pi(
        jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(0.0)
    )
    # fd90=0.5 at zero roughness head-on: (1-0.5*0)=..., value close to 1/1.03571
    assert 0.9 < float(d) < 1.01


def test_v_smith_matches_bruteforce():
    # Compare against an independent numpy implementation of the formula.
    rng = np.random.default_rng(6)
    ndotl = rng.uniform(0.05, 1, 128).astype(np.float32)
    ndotv = rng.uniform(0.05, 1, 128).astype(np.float32)
    rough = rng.uniform(0.05, 1, 128).astype(np.float32)
    got = np.asarray(brdf.v_smith_joint_ggx(jnp.asarray(ndotl), jnp.asarray(ndotv), jnp.asarray(rough)))
    a2 = rough**2
    lv = ndotl * np.sqrt((-ndotv * a2 + ndotv) * ndotv + a2)
    ll = ndotv * np.sqrt((-ndotl * a2 + ndotl) * ndotl + a2)
    want = 0.5 / (lv + ll)
    assert np.allclose(got, want, rtol=1e-4)
