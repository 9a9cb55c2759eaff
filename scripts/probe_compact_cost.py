"""Round-3 probe: price the compaction-overhead primitives on v5e.

The comp profile (probe_profile.py comp) shows compaction's own plumbing
costs ~150 ms/frame at 1080p: 3x ~29.5 ms radiance scatter-backs,
~44 ms of column-major state gathers, ~17 ms of 1-D cumsums. This probe
prices each alternative. One mode per process (jit-cache quirk).

Usage: python scripts/probe_compact_cost.py <mode>
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 2073600   # full domain (1080p)
M = 1037312   # b1 compact domain


def timeit(f, *args, reps=10):
    r = f(*args)
    jax.block_until_ready(r)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / reps * 1000


def row_gather(table, row_idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    nt, c = table.shape
    return jax.lax.gather(
        table, jnp.clip(row_idx.reshape(-1, 1), 0, nt - 1), dn,
        slice_sizes=(1, c), mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(row_idx.shape + (c,))


def main():
    mode = sys.argv[1]
    rng = np.random.default_rng(3)
    idx = jnp.asarray(np.sort(rng.choice(N, M, replace=False)), jnp.int32)
    planes = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(22)]

    if mode == "g1":
        def f(p, i):
            return p[i]
        dt = timeit(jax.jit(f), planes[0], idx)
    elif mode in ("g22cm", "g16cm", "g15cm"):
        k = int(mode[1:3])
        def f(i, *ps):
            tab = jnp.concatenate([p[:, None] for p in ps], axis=1)
            return row_gather(tab, i)
        dt = timeit(jax.jit(f), idx, *planes[:k])
    elif mode in ("g128row", "g32row", "g24row"):
        k = int(mode[1:-3])
        def f(i, *ps):
            cols = [p[:, None] for p in ps]
            cols.append(jnp.zeros((N, k - len(ps)), jnp.float32))
            tab = jnp.concatenate(cols, axis=1)
            return row_gather(tab, i)
        dt = timeit(jax.jit(f), idx, *planes[:min(22, k)])
    elif mode == "scatter3":
        tgt = jnp.zeros((N, 3), jnp.float32)
        upd = jnp.stack(planes[:3], axis=1)[:M]
        def f(t, i, u):
            return t.at[i].add(u)
        dt = timeit(jax.jit(f), tgt, idx, upd)
    elif mode == "cascade3":
        # inverse direction: full-domain gather of compact 3-col rows
        child = jnp.stack(planes[:3], axis=1)[:M]
        slots = jnp.asarray(rng.integers(0, M, N), jnp.int32)
        amask = jnp.asarray(rng.random(N) < 0.5)
        def f(c, s, a):
            g = row_gather(c, s)
            return jnp.where(a[:, None], g, 0.0)
        dt = timeit(jax.jit(f), child, slots, amask)
    elif mode == "cascade3p":
        # planar variant: 3 separate 1-D gathers
        cs = [p[:M] for p in planes[:3]]
        slots = jnp.asarray(rng.integers(0, M, N), jnp.int32)
        amask = jnp.asarray(rng.random(N) < 0.5)
        def f(s, a, *cs_):
            return [jnp.where(a, c[s], 0.0) for c in cs_]
        dt = timeit(jax.jit(f), slots, amask, *cs)
    elif mode == "cumsum":
        x = jnp.asarray(rng.integers(0, 2, N), jnp.int32)
        def f(x):
            return jnp.cumsum(x)
        dt = timeit(jax.jit(f), x)
    elif mode == "cumsum2":
        x = jnp.asarray(rng.integers(0, 2, N), jnp.int32)
        def f(x):
            x2 = x.reshape(-1, 128)
            within = jnp.cumsum(x2, axis=1)
            row_tot = within[:, -1]
            offs = jnp.cumsum(row_tot) - row_tot
            return (within + offs[:, None]).reshape(-1)
        dt = timeit(jax.jit(f), x)
    elif mode == "cumsum3":
        x = jnp.asarray(rng.integers(0, 2, N), jnp.int32)
        def f(x):
            x2 = x.reshape(-1, 128)          # (16200, 128)
            within = jnp.cumsum(x2, axis=1)
            row_tot = within[:, -1]          # (16200,)
            r2 = row_tot.reshape(-1, 128)    # (~127, 128)
            w2 = jnp.cumsum(r2, axis=1)
            t2 = w2[:, -1]
            o2 = jnp.cumsum(t2) - t2         # tiny 1-D
            offs = (w2 + o2[:, None] - r2).reshape(-1)[: row_tot.shape[0]]
            return (within + offs[:, None]).reshape(-1)
        dt = timeit(jax.jit(f), x)
    elif mode == "ascan":
        x = jnp.asarray(rng.integers(0, 2, N), jnp.int32)
        def f(x):
            return jax.lax.associative_scan(jnp.add, x)
        dt = timeit(jax.jit(f), x)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"{mode}: {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
