"""Pallas TPU select/gather kernels — the primitives under the fast tracer.

XLA:TPU prices every data-dependent texel fetch through a scalar gather
emitter at ~8.4 ns/index (docs/Performance.md), which made the parity
tracer's per-step depth fetches the entire frame cost. Two Mosaic forms
run far below that price (measured on v5e, scripts/probe_hiz.py):

  * ``broadcast_table_select`` — per-lane select from a small shared
    table held in VMEM as (chunks, 128) rows: ~120 G selects/s. Used for
    the coarse min/max depth cell tests (every march step of every ray).
  * ``rowwise_select`` — per-row select from each row's own 128-wide
    block (jnp.take_along_axis = Mosaic tpu.dynamic_gather): ~30-50
    G selects/s. Used to test march positions against fetched 128-texel
    depth tiles (ops/depth_tiles.py).

Both kernels run in interpret mode off-TPU so CPU CI exercises the same
code path (SURVEY.md §4 "fake backend" strategy).

Large-shape forms of tpu.dynamic_gather still crash the remote Mosaic
compiler on this toolchain (jax 0.9.0 / libtpu 0.0.34): axis=0 beyond
(8,128) and lane widths >128 return HTTP 500 from the compile service
(scripts/probe_gather_r2.py part A is the minimal reproducer). The
kernels here stay inside the forms measured to compile: lane-dim 128,
take_along_axis on axis=-1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_rows(n_rows: int, target: int = 512) -> int:
    """Largest divisor of n_rows that is <= target, preferring multiples
    of 8 (sublane alignment)."""
    best_any, best_8 = 1, 0
    for d in range(1, target + 1):
        if n_rows % d == 0:
            best_any = d
            if d % 8 == 0:
                best_8 = d
    return best_8 or best_any


def _as_rows128(x: jnp.ndarray):
    """Reshape a flat (N,) array to (N/128, 128), padding N to a
    multiple of 128*8 (so the row count stays sublane-aligned).
    Returns (reshaped, original_n)."""
    n = x.shape[0]
    pad = (-n) % (128 * 8)
    if pad:
        x = jnp.pad(x, (0, pad))
    return x.reshape(-1, 128), n


@functools.partial(jax.jit, static_argnames=("n_chunks",))
def broadcast_table_select(table: jnp.ndarray, idx: jnp.ndarray, n_chunks: int):
    """values[i] = table_flat[idx[i]] for a small shared table.

    ``table`` is (n_chunks, 128) — the flattened table split into
    128-entry chunk rows (entry e lives at table[e >> 7, e & 127]).
    ``idx`` is any int32 array; entries must be in [0, n_chunks*128).
    Runs as chunked take_along_axis from sublane-broadcast rows — the
    fast Mosaic path (~120 G selects/s measured).
    """
    flat_idx, n = _as_rows128(idx.reshape(-1).astype(jnp.int32))
    m = flat_idx.shape[0]
    rows = _pick_rows(m)

    def kern(tab_ref, i_ref, o_ref):
        ii = i_ref[:]
        got = jnp.zeros(ii.shape, jnp.float32)
        for c in range(n_chunks):
            chunk = jnp.broadcast_to(tab_ref[c : c + 1, :], ii.shape)
            g = jnp.take_along_axis(chunk, ii & 127, axis=1)
            if n_chunks == 1:
                got = g
            else:
                got = jnp.where((ii >> 7) == c, g, got)
        o_ref[:] = got

    out = pl.pallas_call(
        kern,
        grid=(m // rows,),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((n_chunks, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(table, flat_idx)
    return out.reshape(-1)[:n].reshape(idx.shape)


@jax.jit
def rowwise_select(blocks: jnp.ndarray, idx: jnp.ndarray):
    """values[r, k] = blocks[r, idx[r, k]] — per-row dynamic select.

    ``blocks`` is (N, 128) f32 or u32/i32 (each row = one ray's fetched
    depth tile; integer dtypes move raw bit patterns with no float
    canonicalization — use them for f16-pair words that may hold
    NaN-payload encodings); ``idx`` is (N, K) int32 with K <= 128
    (padded to 128 lanes internally; pad entries may be any value in
    [0, 128)). This is the Mosaic tpu.dynamic_gather form measured at
    ~30-50 G selects/s.
    """
    n, bw = blocks.shape
    assert bw == 128, "blocks must be (N, 128) tile rows"
    k = idx.shape[1]
    if k != 128:
        idx = jnp.pad(idx, ((0, 0), (0, 128 - k)))
    idx = idx.astype(jnp.int32) & 127
    rows = _pick_rows(n)

    def kern(b_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(b_ref[:], i_ref[:], axis=1)

    out = pl.pallas_call(
        kern,
        grid=(n // rows,),
        out_shape=jax.ShapeDtypeStruct((n, 128), blocks.dtype),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(blocks, idx)
    return out[:, :k]


def pack_by_slot(cand: jnp.ndarray, fields, k: int):
    """Compact per-lane candidate lists in one pass.

    ``cand`` is (S, N) bool — candidate flags per step (rows) per lane
    (columns). Each field is (S, N) f32. Returns, per field, a (k, N)
    array where row j holds the field value of lane n's j-th candidate
    step (0 where the lane has fewer); plus an (N,) int32 candidate
    count (clamped to k).

    One streaming pass over the (S, N) arrays on the VPU; the XLA
    equivalent materializes an (N, S, K) one-hot and measured ~40 ms at
    1080p (the Pallas form is ~2-4 ms).
    """
    s, n = cand.shape
    s_pad = -(-s // 8) * 8
    cols = 512
    n_pad = -(-n // cols) * cols
    candf = jnp.pad(cand.astype(jnp.float32), ((0, s_pad - s), (0, n_pad - n)))
    fieldsp = [jnp.pad(f, ((0, s_pad - s), (0, n_pad - n))) for f in fields]
    nf = len(fieldsp)

    def kern(*refs):
        c_ref = refs[0]
        f_refs = refs[1 : 1 + nf]
        o_refs = refs[1 + nf : 1 + 2 * nf]
        cnt_ref = refs[1 + 2 * nf]
        c = c_ref[:] > 0.5  # (s_pad, cols)
        ci = c.astype(jnp.int32)
        # Manual prefix sum over the step rows (Mosaic has no cumsum
        # lowering on TPU; the unrolled form is ~s_pad cheap row adds).
        run = jnp.zeros((1, ci.shape[1]), jnp.int32)
        slot_rows = []
        for r in range(ci.shape[0]):
            row = ci[r : r + 1, :]
            slot_rows.append(run + row - 1)
            run = run + row
        slot = jnp.concatenate(slot_rows, axis=0)
        cnt_ref[:] = jnp.minimum(run, k)
        for j in range(k):
            m = c & (slot == j)
            for f_ref, o_ref in zip(f_refs, o_refs):
                o_ref[j : j + 1, :] = jnp.sum(
                    jnp.where(m, f_ref[:], 0.0), axis=0, keepdims=True
                )

    out_shapes = [jax.ShapeDtypeStruct((k, n_pad), jnp.float32) for _ in range(nf)]
    out_shapes.append(jax.ShapeDtypeStruct((1, n_pad), jnp.int32))
    outs = pl.pallas_call(
        kern,
        grid=(n_pad // cols,),
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec((s_pad, cols), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * (1 + nf),
        out_specs=tuple(
            [pl.BlockSpec((k, cols), lambda i: (0, i), memory_space=pltpu.VMEM)] * nf
            + [pl.BlockSpec((1, cols), lambda i: (0, i), memory_space=pltpu.VMEM)]
        ),
        interpret=_use_interpret(),
    )(candf, *fieldsp)
    packed = [o[:, :n] for o in outs[:nf]]
    return packed, outs[nf][0, :n]


def extract_chain(fields, ptr: jnp.ndarray, chain: int, slot_hi: int):
    """out[f][j, n] = fields[f][ptr[n] + j, n] (0 when ptr+j >= slot_hi).

    One resolve round's candidate extraction for all ``chain`` links at
    once (ops/pathtrace_hiz.py phase 4): each field is a (K, N) slot
    table, ``ptr`` the per-lane resolve pointer. The XLA equivalent is
    chain x len(fields) separate one-hot mask-sums over (slot_hi, N) —
    ~one full HBM pass over the slot tables per mask — while this
    kernel streams each table once per round and does the
    chain x slot_hi compare/select tree in VMEM. Bit-identical: the
    one-hot sum has at most one nonzero term, so sum == select.
    """
    k, n = fields[0].shape
    slot_hi = min(slot_hi, k)
    nf = len(fields)
    cols = 512
    n_pad = -(-n // cols) * cols
    k_pad = -(-k // 8) * 8
    fp = [jnp.pad(f, ((0, k_pad - k), (0, n_pad - n))) for f in fields]
    pp = jnp.pad(ptr.astype(jnp.int32).reshape(1, -1), ((0, 0), (0, n_pad - n)))

    def kern(*refs):
        p_ref = refs[0]
        f_refs = refs[1 : 1 + nf]
        o_refs = refs[1 + nf :]
        ptrv = p_ref[:]  # (1, cols)
        iota = jax.lax.broadcasted_iota(jnp.int32, (slot_hi, ptrv.shape[1]), 0)
        for f_ref, o_ref in zip(f_refs, o_refs):
            f = f_ref[:slot_hi]
            for j in range(chain):
                m = iota == (ptrv + j)
                o_ref[j : j + 1, :] = jnp.sum(
                    jnp.where(m, f, 0.0), axis=0, keepdims=True
                )

    c_pad = -(-chain // 8) * 8
    outs = pl.pallas_call(
        kern,
        grid=(n_pad // cols,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((c_pad, n_pad), jnp.float32) for _ in range(nf)
        ),
        in_specs=[pl.BlockSpec((1, cols), lambda i: (0, i), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec((k_pad, cols), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * nf,
        out_specs=tuple(
            [pl.BlockSpec((c_pad, cols), lambda i: (0, i), memory_space=pltpu.VMEM)]
            * nf
        ),
        interpret=_use_interpret(),
    )(pp, *fp)
    return [o[:chain, :n] for o in outs]


def row_gather(table: jnp.ndarray, row_idx: jnp.ndarray) -> jnp.ndarray:
    """rows[i] = table[row_idx[i], :] — the XLA wide row gather.

    For tables of <= ~32K rows this runs at ~3.7 ns/index on v5e (the
    VMEM-resident-table discount, docs/Performance.md) — the price of
    one depth-tile fetch round. Plain XLA (no Pallas needed).
    """
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    nt, c = table.shape
    return jax.lax.gather(
        table,
        jnp.clip(row_idx.reshape(-1, 1), 0, nt - 1),
        dn,
        slice_sizes=(1, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(row_idx.shape + (c,))
