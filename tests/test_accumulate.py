import jax.numpy as jnp
import numpy as np

from unitysspathtracingurp_tpu.ops.accumulate import (
    OfflineAccumState,
    add_convergence_cue,
    offline_accumulate,
)


def test_offline_accumulation_is_running_mean():
    rng = np.random.default_rng(0)
    frames = [rng.uniform(size=(8, 8, 3)).astype(np.float32) for _ in range(10)]
    state = OfflineAccumState.create(8, 8)
    for f in frames:
        state = offline_accumulate(state, jnp.asarray(f), max_sample=64)
    assert int(state.sample) == 10
    assert np.allclose(np.asarray(state.accum), np.mean(frames, axis=0), atol=1e-5)


def test_offline_accumulation_pauses_at_max():
    state = OfflineAccumState.create(4, 4)
    one = jnp.ones((4, 4, 3))
    two = jnp.full((4, 4, 3), 2.0)
    for _ in range(3):
        state = offline_accumulate(state, one, max_sample=3)
    # At max: further frames must not change the average or the counter.
    state2 = offline_accumulate(state, two, max_sample=3)
    assert int(state2.sample) == 3
    assert np.allclose(np.asarray(state2.accum), 1.0)


def test_offline_accumulation_paused_flag():
    state = OfflineAccumState.create(4, 4)
    state = offline_accumulate(state, jnp.ones((4, 4, 3)), max_sample=64)
    frozen = offline_accumulate(state, jnp.zeros((4, 4, 3)), max_sample=64, paused=True)
    assert np.allclose(np.asarray(frozen.accum), 1.0)
    assert int(frozen.sample) == 1


def test_restart_overwrites():
    state = OfflineAccumState.create(4, 4)
    state = offline_accumulate(state, jnp.ones((4, 4, 3)), max_sample=64)
    # Reset the counter (the invalidation path), then a new frame replaces.
    state = state.replace(sample=jnp.zeros((), jnp.int32))
    state = offline_accumulate(state, jnp.full((4, 4, 3), 5.0), max_sample=64)
    assert np.allclose(np.asarray(state.accum), 5.0)


def test_progress_bar_geometry():
    h, w = 64, 64
    img = jnp.full((h, w, 3), 0.2)
    out = np.asarray(add_convergence_cue(img, 16, 64, h, w))
    # Bar height: max(4, ceil(64*0.005)) = 4 rows; width 16/64 of screen.
    bar = np.abs(out - 0.2).max(-1) > 1e-6
    assert bar[:4, : w // 4 - 1].all()
    assert not bar[4:].any()
    assert not bar[:4, w // 4 + 1 :].any()
    # Completed -> no bar.
    done = np.asarray(add_convergence_cue(img, 64, 64, h, w))
    assert np.allclose(done, 0.2)
