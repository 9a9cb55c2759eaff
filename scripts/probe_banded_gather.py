"""Round-3 probe: can banded (small-table) gathers beat the flat
big-table gathers that dominate compaction plumbing?

Profile (docs/Performance.md round 3): the bounce-compaction state
gather (1M idx from a 2M-row x22 table) costs 35.6 ms and the color
unwind (2M idx from a ~1M-row x3 table) 41.6 ms, while in-graph
gathers from the 8160-row pair table run at 1.9 ns/idx. Hypothesis:
splitting the lane axis into 64 interleaved bands of 32K rows makes
every compaction gather a small-table gather.

Measures, on the real chip:
  A. flat gather: (2M,22) table, 1M sorted idx      (the current cost)
  B. banded gather: (64,32768,22) table, (64,16384) idx, batched dims
  C. banded via one-level scan over bands
  D. unwind flat: (1M,3) table, 2M idx
  E. unwind banded: (64,16384,3) table, (64,32768) idx
  F. band transpose cost: (2M,22) -> (64,32768,22) interleaved
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 64 * 32768          # 2,097,152 full lanes
B = 64                  # bands
BN = N // B             # 32768 rows per band
M = N // 2              # compact size (cap 0.5)
BM = M // B


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # force through a scalar (tunnel can return early)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    s = jax.tree.leaves(out)[0].sum()
    float(s)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"  {name}: {dt:.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (N, 22), jnp.float32)
    table3 = jax.random.normal(key, (M, 3), jnp.float32)
    # sorted indices ~ compaction's monotone src_idx
    idx_flat = jnp.sort(jax.random.randint(key, (M,), 0, N, jnp.int32))
    idx_band = jnp.sort(
        jax.random.randint(key, (B, BM), 0, BN, jnp.int32), axis=1
    )
    # unwind: per full lane, a slot into the compact domain
    uw_flat = jnp.sort(jax.random.randint(key, (N,), 0, M, jnp.int32))
    uw_band = jnp.sort(
        jax.random.randint(key, (B, BN), 0, BM, jnp.int32), axis=1
    )
    table3b = table3.reshape(B, BM, 3)
    tableb = table.reshape(B, BN, 22)

    ledger = {}

    def g_flat(t, i):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        return jax.lax.gather(
            t, i[:, None], dn, slice_sizes=(1, t.shape[1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ) * 2.0

    def g_band(t, i):
        # batched gather: operand (B, BN, C), indices (B, BM)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(1,),
            start_index_map=(1,), operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        return jax.lax.gather(
            t, i[..., None], dn, slice_sizes=(1, 1, t.shape[2]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ) * 2.0

    def g_scan(t, i):
        def body(_, ti):
            tt, ii = ti
            return None, g_flat(tt, ii)
        _, out = jax.lax.scan(body, None, (t, i))
        return out

    def transpose_band(t):
        # lane l -> band l % B, row l // B  (uniform spatial sampling)
        return t.reshape(BN, B, 22).transpose(1, 0, 2) + 1.0

    print("A. flat (2M,22) @ 1M idx:", flush=True)
    ledger["flat_22"] = bench("flat22", jax.jit(g_flat), table, idx_flat)
    print("B. banded (64,32768,22) @ (64,16384):", flush=True)
    ledger["band_22"] = bench("band22", jax.jit(g_band), tableb, idx_band)
    print("C. banded via scan:", flush=True)
    ledger["scan_22"] = bench("scan22", jax.jit(g_scan), tableb, idx_band)
    print("D. unwind flat (1M,3) @ 2M idx:", flush=True)
    ledger["flat_3"] = bench("flat3", jax.jit(g_flat), table3, uw_flat)
    print("E. unwind banded (64,16384,3) @ (64,32768):", flush=True)
    ledger["band_3"] = bench("band3", jax.jit(g_band), table3b, uw_band)
    print("F. interleave transpose (2M,22):", flush=True)
    ledger["transpose"] = bench("transp", jax.jit(transpose_band), table)

    print(json.dumps(ledger, indent=1))
    with open("/tmp/probe_banded.json", "w") as f:
        json.dump(ledger, f)


if __name__ == "__main__":
    main()
