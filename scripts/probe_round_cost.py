"""Round-3 probe: standalone resolve-round cost decomposition.

The R-ablation in probe_r3_phases gives contradictory per-round prices
(marginal round 15.2 ms/bounce < the 28.5 ms the gather alone costs in
isolation), so this isolates one full resolve-round body at frame scale
(2M lanes, K=16, chain=4) and prices the candidate fixes:

  round_full     — extraction + row gather + 4 one-hot selects + test
  round_nogather — same with the gather replaced by an affine broadcast
                   (the bounce-0 "home row" trick: blocks[y,x] =
                   table3[y//8, x//32], pure layout ops)
  round_compact  — gather + select only for ACTIVE lanes (42%):
                   compact indices, gather compact, test, scatter back
  scatter        — price of an (N,) f32 scatter at 0.42N updates
  onehot128      — price of ONE 128-wide one-hot select at 2M lanes
  extract        — price of one chain link's K=16 extraction (3 fields)

Usage: python scripts/probe_round_cost.py <mode>
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 1080, 1920
N = H * W
ROWS = 8128  # pair rows, padded to 64
K = 16
CHAIN = 4


def bench(name, f, *args, iters=10):
    t0 = time.perf_counter()
    float(f(*args))
    print(f"  compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
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


def round_body(blocks_u, pk, ptr, texel, cd):
    """The post-fetch part of one resolve round: 4 one-hot texel
    selects + extraction + a stand-in test combine."""
    texel_oh = jnp.arange(128, dtype=jnp.int32)
    k_iota = jnp.arange(K, dtype=jnp.int32)[:, None]
    out = jnp.zeros((N,), jnp.float32)
    for j in range(CHAIN):
        oh_k = k_iota == (ptr + j)[None, :]
        cdj = jnp.sum(jnp.where(oh_k, pk, 0.0), 0)
        w = jnp.sum(
            jnp.where((texel + j)[:, None] % 128 == texel_oh[None, :128],
                      blocks_u, jnp.uint32(0)),
            -1, dtype=jnp.uint32,
        )
        d = jax.lax.bitcast_convert_type(w, jnp.float32)
        out = out + jnp.where(d > cdj, cdj, cd)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "round_full"
    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.random((ROWS, 128)), jnp.float32)
    pair = jnp.asarray(rng.integers(0, ROWS, size=(N,)), jnp.int32)
    texel = jnp.asarray(rng.integers(0, 128, size=(N,)), jnp.int32)
    ptr = jnp.asarray(rng.integers(0, K - CHAIN, size=(N,)), jnp.int32)
    pk = jnp.asarray(rng.random((K, N)), jnp.float32)
    cd = jnp.asarray(rng.random((N,)), jnp.float32)
    active = jnp.asarray(rng.random(N) < 0.42)
    ledger = {}

    if mode == "round_full":
        def f(table, pair, texel, ptr, pk, cd):
            blocks = gather_rows(table, pair)
            bu = jax.lax.bitcast_convert_type(blocks, jnp.uint32)
            return round_body(bu, pk, ptr, texel, cd).sum()
        ledger[mode] = bench(mode, jax.jit(f), table, pair, texel, ptr, pk, cd)
    elif mode == "round_nogather":
        # Affine home-row broadcast: table3[y//8, x//32] as layout ops.
        table3 = table[: (H // 8) * (W // 32)].reshape(H // 8, W // 32, 128)

        def f(table3, texel, ptr, pk, cd):
            t = jnp.broadcast_to(
                table3[:, None, :, None, :], (H // 8, 8, W // 32, 32, 128)
            ).reshape(N, 128)
            bu = jax.lax.bitcast_convert_type(t, jnp.uint32)
            return round_body(bu, pk, ptr, texel, cd).sum()
        ledger[mode] = bench(mode, jax.jit(f), table3, texel, ptr, pk, cd)
    elif mode == "round_compact":
        cap = 1024 * 896  # ~0.44N

        def f(table, pair, texel, ptr, pk, cd, active):
            slots = jnp.cumsum(active.astype(jnp.int32)) - 1
            tgt = jnp.where(active & (slots < cap), slots, cap)
            src = jnp.zeros((cap + 1,), jnp.int32).at[tgt].set(
                jnp.arange(N, dtype=jnp.int32))[:cap]
            pairc = pair[src]
            texelc = texel[src]
            ptrc = ptr[src]
            cdc = cd[src]
            pkc = jnp.take(pk, src, axis=1)
            blocks = gather_rows(table, pairc)
            bu = jax.lax.bitcast_convert_type(blocks, jnp.uint32)
            texel_oh = jnp.arange(128, dtype=jnp.int32)
            k_iota = jnp.arange(K, dtype=jnp.int32)[:, None]
            out = jnp.zeros((cap,), jnp.float32)
            for j in range(CHAIN):
                oh_k = k_iota == (ptrc + j)[None, :]
                cdj = jnp.sum(jnp.where(oh_k, pkc, 0.0), 0)
                wsel = jnp.sum(
                    jnp.where((texelc + j)[:, None] % 128 == texel_oh[None, :],
                              bu, jnp.uint32(0)),
                    -1, dtype=jnp.uint32)
                d = jax.lax.bitcast_convert_type(wsel, jnp.float32)
                out = out + jnp.where(d > cdj, cdj, cdc)
            # Scatter one result field back to the full domain.
            full = jnp.zeros((N + 1,), jnp.float32).at[
                jnp.where(jnp.arange(cap) < slots[-1] + 1, src, N)
            ].set(out, mode="drop")[:N]
            return full.sum()
        ledger[mode] = bench(
            mode, jax.jit(f), table, pair, texel, ptr, pk, cd, active)
    elif mode == "pieces":
        def f1(pk, ptr):
            k_iota = jnp.arange(K, dtype=jnp.int32)[:, None]
            oh_k = k_iota == ptr[None, :]
            return jnp.sum(jnp.where(oh_k, pk, 0.0), 0).sum()
        ledger["extract1"] = bench("extract 1 field", jax.jit(f1), pk, ptr)

        def f2(table, pair, texel):
            blocks = gather_rows(table, pair)
            texel_oh = jnp.arange(128, dtype=jnp.int32)
            return jnp.sum(
                jnp.where(texel[:, None] == texel_oh[None, :], blocks, 0.0)
            ).sum()
        ledger["gather_onehot"] = bench(
            "gather + 1 onehot", jax.jit(f2), table, pair, texel)

        def f3(cd, active):
            cap = 1024 * 896
            slots = jnp.cumsum(active.astype(jnp.int32)) - 1
            tgt = jnp.where(active & (slots < cap), slots, cap)
            src = jnp.zeros((cap + 1,), jnp.int32).at[tgt].set(
                jnp.arange(N, dtype=jnp.int32))[:cap]
            return cd[src].sum()
        ledger["compact_1field"] = bench(
            "cumsum+compact 1 field", jax.jit(f3), cd, active)

        def f4(cd, pair):
            return jnp.zeros((N,), jnp.float32).at[pair].add(cd[: ROWS].sum() + cd).sum()
        ledger["scatter_add"] = bench(
            "scatter-add 2M into 2M", jax.jit(f4), cd, jnp.asarray(
                rng.integers(0, N, size=(N,)), jnp.int32))
    else:
        raise SystemExit(f"unknown mode {mode}")

    print(json.dumps(ledger, indent=1))
    with open(f"/tmp/probe_round_cost_{mode}.json", "w") as f:
        json.dump(ledger, f, indent=1)


if __name__ == "__main__":
    main()
