"""Round-3 probe: resolve-round texel-select formulations.

The op-level profile (probe_profile.py, dense R=4 1080p) attributes
110 ms/frame to the 64 one-hot texel selects (4 chain links x 4 rounds
x 4 bounces, 1.72 ms each): every link re-reads the full gathered
f32[2M,128] block array. This probe prices alternatives on the real
chip; each mode runs in its own process (jit-cache quirk, TODO.md).

  sep4    current: 4 independent one-hot mask-sums
  cat4    the 4 selects concatenated (forces one multi-output fusion?)
  int4    single-pass (N,4) integer one-hot mult-sum
  int4t   single-pass (4,N) variant (lane-major output)
  pallas4 Pallas kernel: read block once, 4 one-hot sums -> (8,N) out
  e2e     row_gather + winner, end to end

Usage: python scripts/probe_texsel.py <mode>
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 2073600  # 1080p lanes
P = 8160     # pair-table rows


def timeit(f, *args, reps=10):
    r = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / reps * 1000


def main():
    mode = sys.argv[1]
    rng = np.random.default_rng(7)
    table = jnp.asarray(
        rng.random((P, 128), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, P, N), jnp.int32)
    tex = jnp.asarray(rng.integers(0, 128, (4, N)), jnp.int32)
    blocks = jax.jit(
        lambda t, i: jax.lax.gather(
            t, i.reshape(-1, 1),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 128),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ))(table, idx)
    blocks_u = jax.lax.bitcast_convert_type(blocks, jnp.uint32)
    oh = jnp.arange(128, dtype=jnp.int32)

    if mode == "gather":
        def f(t, i):
            return jax.lax.gather(
                t, i.reshape(-1, 1),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                slice_sizes=(1, 128),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        dt = timeit(jax.jit(f), table, idx)
    elif mode == "sep4":
        def f(b, tx):
            outs = [
                jnp.sum(jnp.where(tx[j][:, None] == oh, b, jnp.uint32(0)),
                        -1, dtype=jnp.uint32)
                for j in range(4)
            ]
            return [o.astype(jnp.float32).sum() for o in outs]
        dt = timeit(jax.jit(f), blocks_u, tex)
    elif mode == "cat4":
        def f(b, tx):
            outs = [
                jnp.sum(jnp.where(tx[j][:, None] == oh, b, jnp.uint32(0)),
                        -1, dtype=jnp.uint32)
                for j in range(4)
            ]
            return jnp.stack(outs)
        dt = timeit(jax.jit(f), blocks_u, tex)
    elif mode == "int4":
        def f(b, tx):
            ohm = (tx.T[:, :, None] == oh[None, None]).astype(jnp.uint32)
            return jnp.sum(ohm * b[:, None, :], -1, dtype=jnp.uint32)
        dt = timeit(jax.jit(f), blocks_u, tex)
    elif mode == "int4t":
        def f(b, tx):
            ohm = (tx[:, :, None] == oh[None, None]).astype(jnp.uint32)
            return jnp.sum(ohm * b[None, :, :], -1, dtype=jnp.uint32)
        dt = timeit(jax.jit(f), blocks_u, tex)
    elif mode == "pallas4":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ROWS = 1024

        def kern(b_ref, t_ref, o_ref):
            b = b_ref[:]  # (ROWS,128) f32 bits
            sel = jnp.take_along_axis(b, t_ref[:], axis=1)  # (ROWS,128)
            o_ref[:] = sel

        texp = jnp.concatenate(
            [tex.T & 127, jnp.zeros((N, 124), jnp.int32)], axis=1)

        def f(b, tx):
            out = pl.pallas_call(
                kern,
                grid=(N // ROWS,),
                out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(b, tx)
            return out[:, :4]
        dt = timeit(jax.jit(f), blocks, texp)
    elif mode == "e2e_int4":
        def f(t, i, tx):
            b = jax.lax.gather(
                t, i.reshape(-1, 1),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                slice_sizes=(1, 128),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            bu = jax.lax.bitcast_convert_type(b, jnp.uint32)
            ohm = (tx.T[:, :, None] == oh[None, None]).astype(jnp.uint32)
            return jnp.sum(ohm * bu[:, None, :], -1, dtype=jnp.uint32)
        dt = timeit(jax.jit(f), table, idx, tex)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"{mode}: {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
