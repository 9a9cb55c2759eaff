"""Ray-compaction equivalence gates (PTConfig.compaction_caps /
hiz_round_cap, VERDICT r2 item 1a).

Compaction only re-domains per-lane state (every march/BRDF op is
elementwise per lane), so with honest capacities every per-lane value
is bit-identical to the dense trace; the only deviation is <=2 ulp of
summation-order drift where the cascade unwind re-associates the
per-bounce contribution adds. These gates assert that, plus the
documented overflow contract when a capacity is dishonest.
"""

import numpy as np
import jax.numpy as jnp

from unitysspathtracingurp_tpu.config import PTConfig, PTSettings
from unitysspathtracingurp_tpu.models import fixtures, scene
from unitysspathtracingurp_tpu.ops import pathtrace, pathtrace_hiz
from unitysspathtracingurp_tpu.ops.pathtrace import _compact_indices


def _frame_inputs(h=128, w=128):
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(h, w)
    gb = fixtures.rasterize_gbuffers(sc, cam, h, w)
    from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe

    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    return gb, cam, probes


def test_compact_indices_packs_densely():
    rng = np.random.default_rng(5)
    alive = jnp.asarray(rng.random(4096) < 0.23)
    idx, valid, drop, slots, keep = _compact_indices(alive, 2048)
    alive_ids = np.flatnonzero(np.asarray(alive))
    n = alive_ids.size
    assert int(drop) == 0
    np.testing.assert_array_equal(np.asarray(idx)[:n], alive_ids)
    np.testing.assert_array_equal(np.asarray(valid), np.arange(2048) < n)
    # Inverse map: keep flags exactly the packed lanes, slots maps each
    # kept lane to its compact slot (slots[idx[j]] == j).
    np.testing.assert_array_equal(np.flatnonzero(np.asarray(keep)), alive_ids)
    np.testing.assert_array_equal(
        np.asarray(slots)[alive_ids], np.arange(n))
    # Overflow: capacity below the alive count drops the tail, counted.
    idx2, valid2, drop2, _, keep2 = _compact_indices(alive, 512)
    assert int(drop2) == n - 512
    np.testing.assert_array_equal(np.asarray(idx2), alive_ids[:512])
    assert bool(np.asarray(valid2).all())
    np.testing.assert_array_equal(
        np.flatnonzero(np.asarray(keep2)), alive_ids[:512])


def test_bounce_compaction_bitexact():
    """Between-bounce compaction with honest caps reproduces the dense
    parity trace up to float summation order (the cascade unwind sums
    per-bounce contributions right-to-left; every per-lane value is
    bit-identical, so the only deviation is <=2 ulp on the final adds).
    (128², 4 bounces, box scene)."""
    gb, cam, probes = _frame_inputs()
    settings = PTSettings(maximum_depth=4, samples_per_pixel=1,
                          maximum_steps=24, dithering=False)
    variants = settings.variants()
    fi = jnp.uint32(11)
    dense = pathtrace.trace_frame(
        gb, cam, probes, settings, PTConfig(), variants, fi)
    dbg = {}
    comp = pathtrace.trace_frame(
        gb, cam, probes, settings,
        PTConfig(compaction_caps=(1.0, 0.75, 0.625, 0.5)), variants, fi,
        _debug_out=dbg)
    for b in range(1, 4):
        assert int(dbg[f"compact_drop_b{b}"]) == 0, f"cap dishonest at b{b}"
    np.testing.assert_allclose(
        np.asarray(comp), np.asarray(dense), rtol=1e-6, atol=2e-6)


def test_hiz_compaction_bitexact():
    """Bounce + resolve-round compaction on the hiz tracer reproduces
    the dense hiz trace exactly."""
    gb, cam, probes = _frame_inputs()
    settings = PTSettings(maximum_depth=3, samples_per_pixel=1,
                          maximum_steps=24, dithering=False)
    variants = settings.variants()
    fi = jnp.uint32(29)
    dense = pathtrace_hiz.trace_frame_hiz(
        gb, cam, probes, settings, PTConfig(), variants, fi)
    dbg = {}
    comp = pathtrace_hiz.trace_frame_hiz(
        gb, cam, probes, settings,
        PTConfig(compaction_caps=(1.0, 0.75, 0.625), hiz_round_cap=0.75),
        variants, fi, _debug_out=dbg)
    drops = [int(v) for k, v in dbg.items() if "compact_drop" in k or "round_compact_drop" in k]
    assert drops and all(d == 0 for d in drops), dbg.keys()
    np.testing.assert_allclose(
        np.asarray(comp), np.asarray(dense), rtol=1e-6, atol=2e-6)


def test_headline_caps_zero_drop():
    """The SHIPPED headline caps (PTConfig.boxscene_headline) are
    zero-drop and bit-close to the dense hiz trace at 256² — the
    smallest shape whose alive fractions were measured (31.4/17.4/10.7%
    entering bounces 1-3; they RISE as frames shrink, so this is the
    tight end of the gate; the 1080p end runs on-chip via
    scripts/probe_alive_var.py --check-caps). ADVICE r3: adopting
    measured caps requires a zero-drop equivalence gate at the target
    config."""
    gb, cam, probes = _frame_inputs(256, 256)
    settings = PTSettings(maximum_depth=4, samples_per_pixel=1,
                          maximum_steps=24, dithering=False)
    variants = settings.variants()
    fi = jnp.uint32(11)
    dense = pathtrace_hiz.trace_frame_hiz(
        gb, cam, probes, settings, PTConfig(), variants, fi)
    dbg = {}
    comp = pathtrace_hiz.trace_frame_hiz(
        gb, cam, probes, settings, PTConfig.boxscene_headline(),
        variants, fi, _debug_out=dbg)
    for b in range(1, 4):
        assert int(dbg[f"compact_drop_b{b}"]) == 0, (
            f"shipped headline cap drops rays at b{b}"
        )
    np.testing.assert_allclose(
        np.asarray(comp), np.asarray(dense), rtol=1e-6, atol=2e-6)


def test_compaction_overflow_contract():
    """A dishonest cap drops overflow lanes: the drop is counted in the
    debug ledger and the image stays finite (dropped lanes just lose
    their remaining bounces — energy-bounded, never NaN)."""
    gb, cam, probes = _frame_inputs()
    settings = PTSettings(maximum_depth=2, samples_per_pixel=1,
                          maximum_steps=24, dithering=False)
    variants = settings.variants()
    fi = jnp.uint32(3)
    dbg = {}
    img = pathtrace.trace_frame(
        gb, cam, probes, settings,
        PTConfig(compaction_caps=(1.0, 0.05)), variants, fi,
        _debug_out=dbg)
    assert int(dbg["compact_drop_b1"]) > 0
    a = np.asarray(img)
    assert np.isfinite(a).all()
    # Dropped lanes lose their remaining bounces: the image darkens
    # overall (not necessarily per-pixel — the HDR clamp interacts),
    # and stays close to dense.
    dense = np.asarray(pathtrace.trace_frame(
        gb, cam, probes, settings, PTConfig(), variants, fi))
    assert a.mean() <= dense.mean()
    assert np.abs(a - dense).mean() < 0.10 * dense.mean()
