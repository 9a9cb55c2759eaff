"""Blue-noise sampler tables (the C13 asset equivalent, generated).

The reference ships three PNG tables consumed by GetBNDSequenceSample
(PathTracingUtilities.hlsl:78-99): a 256-sample x 256-dimension
Owen-scrambled sequence, plus 128x128x8 ranking/scrambling tiles that
distribute Monte Carlo error as blue noise in screen space (Heitz et
al. 2019). We do not copy the assets; we *generate* our own:

  * sequence table: Owen-scrambled van der Corput (base-2 radical
    inverse with per-dimension nested scrambling), 8-bit quantized —
    the same low-discrepancy family;
  * ranking/scrambling tiles: void-and-cluster blue-noise masks
    (Ulichney 1993) computed with a periodic Gaussian energy filter.

The sampler's *index arithmetic* (rng.py:_blue_noise_sample) matches the
reference exactly; the table contents are our own. Tables are cached to
an .npz next to the package to keep startup fast.
"""

from __future__ import annotations

import os

import numpy as np

SEQ_SAMPLES = 256
SEQ_DIMS = 256
TILE = 128
TILE_DIMS = 8

_DEFAULT_CACHE = os.path.join(os.path.dirname(__file__), "_blue_noise_tables.npz")


_TABLE_VERSION = 2  # v2: true 2D Sobol pair per consecutive dims


def _reverse_bits8(i: np.ndarray) -> np.ndarray:
    i = i.astype(np.uint32)
    out = np.zeros_like(i)
    for b in range(8):
        out |= ((i >> b) & 1) << (7 - b)
    return out


def _sobol2_8bit(i: np.ndarray) -> np.ndarray:
    """Second Sobol dimension (primitive polynomial x^2 + x + 1), 8-bit.

    Paired with the radical inverse (first dimension) this forms a
    (0, 2)-net in base 2 — genuinely 2D-stratified points. (Using the
    SAME van-der-Corput sequence for every dimension, as v1 of these
    tables did, collapses 2D draws onto 1-D curves and biased the
    render by ~10%.)"""
    # Standard dimension-2 direction numbers (the Pascal/Sierpinski
    # matrix): m_j = 1, 3, 5, 15, 17, 51, 85, 255.
    m = [1, 3, 5, 15, 17, 51, 85, 255]
    v = np.array([mm << (8 - j - 1) for j, mm in enumerate(m)], np.uint32) & 0xFF
    i = i.astype(np.uint32)
    out = np.zeros_like(i)
    for b in range(8):
        out ^= np.where((i >> b) & 1, v[b], 0).astype(np.uint32)
    return out & np.uint32(0xFF)


def _owen_scramble8(value: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """Nested (Owen) scrambling of an 8-bit radical-inverse value: each
    bit is flipped by a hash of the preceding bits and the seed."""
    v = value.astype(np.uint32)
    out = np.zeros_like(v)
    prefix = np.zeros_like(v)
    for b in range(7, -1, -1):  # most significant first
        h = (prefix * np.uint32(0x9E3779B9)) ^ seed.astype(np.uint32)
        h ^= h >> 16
        h = (h * np.uint32(0x85EBCA6B)) & np.uint32(0xFFFFFFFF)
        h ^= h >> 13
        flip = (h >> np.uint32(b)) & 1
        bit = ((v >> b) & 1) ^ flip
        out |= bit << b
        prefix = (prefix << 1) | bit
    return out & np.uint32(0xFF)


def _void_and_cluster(size: int, seed: int, sigma: float = 1.9) -> np.ndarray:
    """Periodic void-and-cluster blue-noise rank mask in [0, size*size)."""
    rng = np.random.default_rng(seed)
    n = size * size

    # Periodic Gaussian energy kernel (via FFT for O(n log n) updates).
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    dy = np.minimum(yy, size - yy)
    dx = np.minimum(xx, size - xx)
    kernel = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    kf = np.fft.rfft2(kernel)

    def energy(binary):
        return np.fft.irfft2(np.fft.rfft2(binary) * kf, s=(size, size))

    # Initial pattern: 10% random points, relaxed.
    binary = np.zeros((size, size))
    pts = rng.choice(n, n // 10, replace=False)
    binary.ravel()[pts] = 1.0
    for _ in range(24):
        e = energy(binary)
        tight = np.unravel_index(np.argmax(np.where(binary > 0, e, -np.inf)), e.shape)
        binary[tight] = 0.0
        e = energy(binary)
        void = np.unravel_index(np.argmin(np.where(binary > 0, np.inf, e)), e.shape)
        if void == tight:
            binary[tight] = 1.0
            break
        binary[void] = 1.0

    rank = np.zeros((size, size), np.int64)
    # Phase 1: remove from the initial pattern, ranking tightest first.
    work = binary.copy()
    count = int(work.sum())
    for r in range(count - 1, -1, -1):
        e = energy(work)
        p = np.unravel_index(np.argmax(np.where(work > 0, e, -np.inf)), e.shape)
        work[p] = 0.0
        rank[p] = r
    # Phase 2: fill the remaining voids.
    work = binary.copy()
    for r in range(count, n):
        e = energy(work)
        p = np.unravel_index(np.argmin(np.where(work > 0, np.inf, e)), e.shape)
        work[p] = 1.0
        rank[p] = r
    return rank


def generate_tables(seed: int = 0, cache_path: str | None = _DEFAULT_CACHE):
    """Build (or load) the three tables; returns dict of numpy arrays:
    sobol (256, 256) uint32 in [0,256), ranking (128*128*8,) uint32,
    scrambling (128*128*8,) uint32 — laid out exactly as the sampler's
    index math expects (cell = (x + y*128)*8 + (dim & 7))."""
    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path)
        if "version" in data and int(data["version"]) == _TABLE_VERSION:
            return {k: data[k] for k in ("sobol", "ranking", "scrambling")}

    # Sequence table: layout [sample, dim] (rng.py indexes
    # sample*256 + dim). Consecutive dimensions alternate the two Sobol
    # dimensions (radical inverse / x^2+x+1) so every draw2 pair —
    # GGX/cosine 2D sampling uses dims (d, d+1) — is a (0,2)-net, then
    # each dimension is independently Owen-scrambled.
    i = np.arange(SEQ_SAMPLES, dtype=np.uint32)
    base0 = _reverse_bits8(i)  # (256,)
    base1 = _sobol2_8bit(i)
    dims = np.arange(SEQ_DIMS, dtype=np.uint32)
    dim_seed = (dims * np.uint32(0x9E3779B1)) ^ np.uint32(0xA511E9B3)
    base = np.where((dims[None, :] & 1) == 0, base0[:, None], base1[:, None])
    sobol = _owen_scramble8(
        base,
        np.broadcast_to(dim_seed[None, :], (SEQ_SAMPLES, SEQ_DIMS)),
    ).astype(np.uint32)

    # Ranking/scrambling tiles: one blue-noise mask per sub-dimension,
    # quantized to 8 bits.
    ranking = np.zeros((TILE * TILE, TILE_DIMS), np.uint32)
    scrambling = np.zeros((TILE * TILE, TILE_DIMS), np.uint32)
    for d in range(TILE_DIMS):
        r = _void_and_cluster(TILE, seed=seed * 31 + d)
        s = _void_and_cluster(TILE, seed=seed * 31 + 101 + d)
        ranking[:, d] = (r.ravel() * 256 // (TILE * TILE)).astype(np.uint32)
        scrambling[:, d] = (s.ravel() * 256 // (TILE * TILE)).astype(np.uint32)
    # Layout: cell = (x + y*128)*8 + dim.
    ranking = ranking.reshape(-1)
    scrambling = scrambling.reshape(-1)

    tables = {"sobol": sobol, "ranking": ranking, "scrambling": scrambling}
    if cache_path:
        np.savez_compressed(cache_path, version=_TABLE_VERSION, **tables)
    return tables


class BlueNoiseTables:
    """Device-array bundle consumed by ops.rng.make_rng(tables=...).
    Registered as a jax pytree so it can flow through jit boundaries
    (the Renderer passes it into the jitted frame steps)."""

    def __init__(self, tables=None, _arrays=None):
        import jax.numpy as jnp

        if _arrays is not None:
            self.sobol, self.ranking, self.scrambling = _arrays
            return
        t = tables or generate_tables()
        self.sobol = jnp.asarray(t["sobol"], jnp.uint32)
        self.ranking = jnp.asarray(t["ranking"], jnp.uint32)
        self.scrambling = jnp.asarray(t["scrambling"], jnp.uint32)


def _bnt_flatten(t):
    return (t.sobol, t.ranking, t.scrambling), None


def _bnt_unflatten(aux, children):
    return BlueNoiseTables(_arrays=children)


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(BlueNoiseTables, _bnt_flatten, _bnt_unflatten)
