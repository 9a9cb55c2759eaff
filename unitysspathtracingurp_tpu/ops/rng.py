"""Counter-based per-pixel RNG.

Rebuild of the reference's noise system (PathTracingUtilities.hlsl:74-113):
a per-draw counter (`_Seed += 1`) combined with a per-frame stride-33
frame index (cs:553-555), feeding either
  * a Jenkins-hash float construction (hashed mode), or
  * a Heitz blue-noise-distributed Owen-scrambled sequence lookup
    (blue-noise mode; tables in ``blue_noise.py``).

Both are stateless counter-based generators — ideal for TPU: no carried
PRNG key, every draw is pure elementwise integer math on uint32 lanes.

Deviation from the reference (documented per SURVEY.md §7 RNG-fidelity
note): the reference increments `_Seed` only on branch-taken draws, so
per-pixel streams depend on control flow. Here every *potential* draw
site increments the counter unconditionally (uniform control flow — the
TPU-native choice). Sequence structure is equivalent in distribution;
convergence baselines are re-derived against our own oracle.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


def jenkins_hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Bob Jenkins' one-at-a-time hash of a uint32 (public domain;
    same construction the reference reaches via URP's Random.hlsl)."""
    x = x.astype(jnp.uint32)
    x = x + (x << jnp.uint32(10))
    x = x ^ (x >> jnp.uint32(6))
    x = x + (x << jnp.uint32(3))
    x = x ^ (x >> jnp.uint32(11))
    x = x + (x << jnp.uint32(15))
    return x


def jenkins_hash_u32_3(x, y, z) -> jnp.ndarray:
    """Hash of a uint3: h(x ^ h(y ^ h(z)))."""
    return jenkins_hash_u32(
        x.astype(jnp.uint32)
        ^ jenkins_hash_u32(y.astype(jnp.uint32) ^ jenkins_hash_u32(z))
    )


def construct_float(m: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float in [0, 1): keep 23 mantissa bits, OR in exponent
    for [1, 2), subtract 1 (the standard bit trick)."""
    m = m.astype(jnp.uint32)
    m = (m & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000)
    return jnp.asarray(m).view(jnp.float32) - 1.0


def hashed_random_float(pix_x, pix_y, z) -> jnp.ndarray:
    """GenerateHashedRandomFloat(uint3(pixel, z)) analog."""
    return construct_float(jenkins_hash_u32_3(pix_x, pix_y, z))


@struct.dataclass
class RNG:
    """Per-pixel counter RNG state.

    ``seed`` is the per-pixel draw counter (the `_Seed` analog, uint32);
    ``frame_index`` is the per-frame stride-33 counter. Pixel coordinates
    are in texels. Blue-noise tables, when used, ride along as arrays.
    """

    pix_x: jnp.ndarray  # (...) uint32
    pix_y: jnp.ndarray  # (...) uint32
    frame_index: jnp.ndarray  # () uint32
    seed: jnp.ndarray  # (...) uint32 per-pixel draw counter
    # Blue-noise tables (None in hashed mode); see ops/blue_noise.py.
    sobol: jnp.ndarray | None = None  # (256, 256) uint32 values in [0,256)
    ranking: jnp.ndarray | None = None  # (128*128*8,) uint32
    scrambling: jnp.ndarray | None = None  # (128*128*8,) uint32
    blue_noise: bool = struct.field(pytree_node=False, default=False)
    # Owen-scrambled Sobol mode (beyond-reference offline sampler; see
    # _sobol_owen_sample). Tableless: pure elementwise integer math.
    sobol_owen: bool = struct.field(pytree_node=False, default=False)


def make_rng(
    height: int, width: int, frame_index, tables=None, row0=0,
    sobol_owen: bool = False,
) -> RNG:
    """Fresh per-frame RNG grid. ``tables`` enables blue-noise mode;
    ``sobol_owen`` the tableless Owen-scrambled Sobol mode.
    ``row0`` offsets pixel-y coordinates for tile-sharded tracing so
    every global pixel keeps its own stream."""
    xs = jnp.arange(width, dtype=jnp.uint32)
    ys = jnp.asarray(row0, jnp.uint32) + jnp.arange(height, dtype=jnp.uint32)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    kw = {}
    if tables is not None:
        kw = dict(
            sobol=tables.sobol,
            ranking=tables.ranking,
            scrambling=tables.scrambling,
            blue_noise=True,
        )
    return RNG(
        pix_x=px,
        pix_y=py,
        frame_index=jnp.asarray(frame_index, jnp.uint32),
        seed=jnp.zeros((height, width), jnp.uint32),
        sobol_owen=sobol_owen,
        **kw,
    )


def _blue_noise_sample(rng: RNG) -> jnp.ndarray:
    """Heitz et al. blue-noise-distributed sample (GetBNDSequenceSample,
    PathTracingUtilities.hlsl:78-99): pixel wrapped to 128, sample index
    to 256, dimension to 256; sequence value XOR-scrambled by per-pixel
    ranking/scrambling tiles; jittered by the scrambling value."""
    px = rng.pix_x & jnp.uint32(127)
    py = rng.pix_y & jnp.uint32(127)
    sample_index = rng.frame_index & jnp.uint32(255)
    dim = rng.seed & jnp.uint32(255)

    cell = (px + py * jnp.uint32(128)) * jnp.uint32(8) + (dim & jnp.uint32(7))
    ranking = jnp.take(rng.ranking, cell.astype(jnp.int32), mode="wrap")
    ranked_index = (sample_index ^ ranking) & jnp.uint32(255)

    seq_idx = ranked_index.astype(jnp.int32) * 256 + dim.astype(jnp.int32)
    value = jnp.take(rng.sobol.reshape(-1), seq_idx, mode="wrap")

    scrambling = jnp.take(rng.scrambling, cell.astype(jnp.int32), mode="wrap")
    value = value ^ scrambling
    scramble_f = jnp.minimum(scrambling.astype(jnp.float32) / 256.0, 0.999)
    u = (scramble_f + (value & jnp.uint32(255)).astype(jnp.float32)) / 256.0

    # Beyond-reference extension: the 256-sample sequence wraps, which
    # plateaus long accumulations at the single-cycle QMC error (the
    # reference itself caps offline accumulation at 512 samples and
    # lives with it). A Cranley-Patterson rotation keyed per wrap CYCLE
    # turns successive cycles into decorrelated estimates so
    # accumulation keeps converging past the wrap, while frames within
    # one cycle keep the sequence's exact stratification. The rotation
    # is keyed by (epoch, draw dimension) ONLY — constant across pixels
    # — because a per-pixel rotation would whiten the blue-noise
    # spatial error arrangement the ranking/scrambling tiles encode
    # (tests/test_rng.py::test_blue_noise_spatial_spectrum). Epoch 0 is
    # exactly the unmodified reference sampler (rotation 0).
    # Frame number k from the 33-stride counter: 33·9697 ≡ 1 (mod 64000).
    k = (rng.frame_index * jnp.uint32(9697)) % jnp.uint32(64000)
    epoch = k >> jnp.uint32(8)
    rot = jnp.where(
        epoch == 0,
        0.0,
        construct_float(jenkins_hash_u32(epoch * jnp.uint32(9173) + rng.seed)),
    )
    return jnp.mod(u + rot, 1.0)


# ---------------------------------------------------------------------------
# Owen-scrambled Sobol mode (beyond-reference extension, NoiseMethod
# SOBOL_OWEN). The reference's blue-noise sequence wraps every 256
# samples (PathTracingUtilities.hlsl:85), so long offline accumulations
# converge only as sqrt(#cycles) past the wrap; the reference lives with
# it by capping offline accumulation at 512 samples. This mode is a true
# *unbounded* low-discrepancy sampler for offline convergence runs:
# per-pixel index-shuffled, Owen-scrambled 2D Sobol pairs (the
# hash-based construction of Burley, "Practical Hash-based Owen
# Scrambling", JCGT 2020) — every quantity is elementwise uint32 math on
# the pixel lanes, no tables, no gathers: the TPU-native choice.
#
# Structure per draw d (0-based per-pixel draw counter):
#   pair p = d >> 1, component c = d & 1
#   n  = nested_uniform_scramble(frame_number, key(pixel, p))   [index]
#   v  = sobol_dim_c(n)                                         [point]
#   v  = nested_uniform_scramble(v, key(pixel, d))              [Owen]
# Index shuffling decorrelates pixels and reuses the one globally
# well-stratified 2D (0,2)-sequence for every pair dimension (padding);
# nested uniform scrambling maps aligned 2^m index blocks to aligned
# 2^m blocks, and any aligned block of a (0,2)-sequence is a
# (0,m,2)-net, so every power-of-two frame prefix stays perfectly
# 2D-stratified per pixel. Spatial error is white (unlike blue-noise
# mode) — this mode trades single-frame dither quality for asymptotic
# convergence, hence "offline".

# Direction numbers for Sobol dimension 2 (primitive polynomial x+1,
# m_k = (m_{k-1} << 1) ^ m_{k-1}: the Pascal/Sierpinski matrix; same
# family as ops/blue_noise._sobol2_8bit, widened to 32 bits).
def _sobol2_dirs():
    m = 1
    dirs = []
    for j in range(32):
        dirs.append((m << (31 - j)) & 0xFFFFFFFF)
        m = ((m << 1) ^ m) & 0xFFFFFFFF
    return tuple(dirs)


_SOBOL2_DIRS = _sobol2_dirs()


def reverse_bits_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-reverse a uint32 (5 mask/shift rounds)."""
    x = x.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def _laine_karras(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine-Karras hash: bit i of the output depends only on bits <= i
    of the input, so reversed it is a valid nested (Owen) scramble.
    Constants from Burley 2020 (JCGT), public domain."""
    x = x.astype(jnp.uint32) + seed.astype(jnp.uint32)
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def nested_uniform_scramble(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Owen scramble of a uint32 radical-inverse value: each bit flipped
    by a hash of the bits above it (and the seed)."""
    return reverse_bits_u32(_laine_karras(reverse_bits_u32(x), seed))


def _sobol_pair(n: jnp.ndarray, comp: jnp.ndarray) -> jnp.ndarray:
    """Component ``comp`` (0|1) of the 2D Sobol (0,2)-sequence at index
    ``n``. ``comp`` is a compile-time-constant lane array (the draw
    counter is uniform), so XLA folds the select and DCEs the unused
    branch."""
    v0 = reverse_bits_u32(n)
    v1 = jnp.zeros_like(n)
    for j, dj in enumerate(_SOBOL2_DIRS):
        v1 = v1 ^ jnp.where((n >> jnp.uint32(j)) & 1, jnp.uint32(dj), jnp.uint32(0))
    return jnp.where(comp == 0, v0, v1)


def _sobol_owen_sample(rng: RNG) -> jnp.ndarray:
    d = rng.seed - jnp.uint32(1)  # 0-based draw index
    pair, comp = d >> jnp.uint32(1), d & jnp.uint32(1)
    # Frame number from the stride-33 counter: 33*9697 == 1 (mod 64000).
    k = (rng.frame_index * jnp.uint32(9697)) % jnp.uint32(64000)
    pkey = jenkins_hash_u32_3(
        rng.pix_x, rng.pix_y, pair * jnp.uint32(0x51633E2D) + jnp.uint32(0xA511E9B3)
    )
    n = nested_uniform_scramble(jnp.broadcast_to(k, d.shape), pkey)
    vkey = jenkins_hash_u32_3(
        rng.pix_x, rng.pix_y, d * jnp.uint32(0x68BC21EB) + jnp.uint32(0x02E5BE93)
    )
    v = nested_uniform_scramble(_sobol_pair(n, comp), vkey)
    # Top 24 bits -> [0, 1).
    return (v >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def draw(rng: RNG):
    """One random draw per pixel lane; returns (value in [0,1), new rng).

    GenerateRandomValue analog (PathTracingUtilities.hlsl:104-113): the
    counter increments first, then the value is derived from
    (pixel, frame_index + seed).
    """
    seed = rng.seed + jnp.uint32(1)
    rng = rng.replace(seed=seed)
    if rng.sobol_owen:
        return _sobol_owen_sample(rng), rng
    if rng.blue_noise:
        return _blue_noise_sample(rng), rng
    value = hashed_random_float(rng.pix_x, rng.pix_y, rng.frame_index + seed)
    return value, rng


def draw2(rng: RNG):
    """Two draws forming a 2D sample. In Sobol mode the draw counter is
    first rounded up to even so the two values are the two components of
    one Sobol pair (a genuinely 2D-stratified point) regardless of how
    many single draws preceded them."""
    if rng.sobol_owen:
        rng = rng.replace(seed=(rng.seed + jnp.uint32(1)) & ~jnp.uint32(1))
    a, rng = draw(rng)
    b, rng = draw(rng)
    return jnp.stack([a, b], axis=-1), rng


def advance_frame_index(frame_index: int) -> int:
    """CPU-side frame counter: += 33 (mod 64000) per frame
    (reference: cs:553-555, 634-636)."""
    from ..config import FRAME_INDEX_MOD, FRAME_INDEX_STRIDE

    return (frame_index + FRAME_INDEX_STRIDE) % FRAME_INDEX_MOD
