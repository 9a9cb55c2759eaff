"""Round-3 probe: XLA row-gather price vs slice width and coherence.

The hiz resolve rounds are gather-bound (~29 ms per 2M×128 f32 row
gather, scripts/probe_r3_phases.py kernels mode). Decide between the
candidate fixes by measuring, at the bench shapes (2M indices, the
1080p pair-table row count):

  A. slice width sweep (128/64/32/16/8/4/1 f32): if the per-index price
     scales with the slice, narrower windows + more (cheaper) rounds
     win; if flat, only locality/fusion can.
  B. coherence sweep at width 128: random rows vs sorted rows vs
     near-diagonal rows (each lane hits a pair near its own tile, the
     round-1 reality at bounce 0).
  C. table height sweep at width 128 (8K/32K/128K rows): VMEM residency
     cliff check.

Usage: python scripts/probe_gather_width.py [A|B|C|all]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1080 * 1920
ROWS = 8100  # 1080p pair-table rows (32x8-px windows)


def bench(name, f, *args, iters=10):
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*args))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"  {name}: {dt:.2f} ms", flush=True)
    return dt


def gather_rows(table, idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        table, idx.reshape(-1, 1), dn, slice_sizes=(1, table.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(7)
    ledger = {}

    if part in ("A", "all"):
        print("-- A: slice width sweep (2M random rows, 8100-row table)")
        idx = jnp.asarray(rng.integers(0, ROWS, size=(N,)), jnp.int32)
        for w in (128, 64, 32, 16, 8, 4, 1):
            table = jnp.asarray(rng.random((ROWS, w)), jnp.float32)
            f = jax.jit(lambda t, i: gather_rows(t, i).sum())
            ledger[f"width_{w}_ms"] = round(bench(f"width {w}", f, table, idx), 2)

    if part in ("B", "all"):
        print("-- B: coherence sweep (width 128)")
        table = jnp.asarray(rng.random((ROWS, 128)), jnp.float32)
        f = jax.jit(lambda t, i: gather_rows(t, i).sum())
        cases = {
            "random": rng.integers(0, ROWS, size=(N,)),
            "sorted": np.sort(rng.integers(0, ROWS, size=(N,))),
            # near-diagonal: lane i hits a pair near i*ROWS/N +- 8
            "near_diag": np.clip(
                (np.arange(N) * ROWS) // N + rng.integers(-8, 9, size=(N,)),
                0, ROWS - 1,
            ),
            "constant": np.zeros((N,), np.int64),
        }
        for k, v in cases.items():
            idx = jnp.asarray(v, jnp.int32)
            ledger[f"coh_{k}_ms"] = round(bench(f"coherence {k}", f, table, idx), 2)

    if part in ("C", "all"):
        print("-- C: table height sweep (width 128, random)")
        for rows in (2048, 8192, 32768, 131072):
            table = jnp.asarray(rng.random((rows, 128)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, rows, size=(N,)), jnp.int32)
            f = jax.jit(lambda t, i: gather_rows(t, i).sum())
            ledger[f"rows_{rows}_ms"] = round(bench(f"rows {rows}", f, table, idx), 2)

    print(json.dumps(ledger, indent=1))
    with open(f"/tmp/probe_gather_width_{part}.json", "w") as f:
        json.dump(ledger, f, indent=1)


if __name__ == "__main__":
    main()
