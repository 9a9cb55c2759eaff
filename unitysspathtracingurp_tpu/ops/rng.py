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


def make_rng(height: int, width: int, frame_index, tables=None, row0=0) -> RNG:
    """Fresh per-frame RNG grid. ``tables`` enables blue-noise mode.
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


def draw(rng: RNG):
    """One random draw per pixel lane; returns (value in [0,1), new rng).

    GenerateRandomValue analog (PathTracingUtilities.hlsl:104-113): the
    counter increments first, then the value is derived from
    (pixel, frame_index + seed).
    """
    seed = rng.seed + jnp.uint32(1)
    rng = rng.replace(seed=seed)
    if rng.blue_noise:
        return _blue_noise_sample(rng), rng
    value = hashed_random_float(rng.pix_x, rng.pix_y, rng.frame_index + seed)
    return value, rng


def draw2(rng: RNG):
    a, rng = draw(rng)
    b, rng = draw(rng)
    return jnp.stack([a, b], axis=-1), rng


def advance_frame_index(frame_index: int) -> int:
    """CPU-side frame counter: += 33 (mod 64000) per frame
    (reference: cs:553-555, 634-636)."""
    from ..config import FRAME_INDEX_MOD, FRAME_INDEX_STRIDE

    return (frame_index + FRAME_INDEX_STRIDE) % FRAME_INDEX_MOD
