"""Round-2 gather probes (jax 0.9.0, v5e).

Facts to establish:
  A. Mosaic tpu.dynamic_gather (take_along_axis w/ idx.shape==x.shape):
     which shapes compile, and throughput (elem/s).
  B. XLA gather: cost vs slice size (1,1)/(1,128)/(8,128) and vs table
     size (does a small table change per-index price?); batched form.
  C. XLA scatter + sort throughput (compaction building blocks).

Honest timing: per-iter scalar reduction forced to host.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(name, f, n_idx, iters=10):
    try:
        o = f()
        float(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f()
        float(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:58s} OK {dt*1e3:9.3f} ms {n_idx/dt/1e9:8.3f} Gidx/s")
        return dt
    except Exception as e:
        msg = " ".join(str(e).split())[:120]
        print(f"{name:58s} FAIL {msg}")
        return None


def part_a():
    print("--- A. Mosaic dynamic_gather shapes/throughput ---")
    for (R, L), axis in [
        ((8, 128), 1), ((8, 128), 0),
        ((64, 128), 1), ((64, 128), 0),
        ((512, 128), 0), ((1024, 128), 0),
        ((8, 512), 1), ((8, 1024), 1), ((8, 2048), 1),
        ((256, 1024), 1), ((256, 1024), 0),
        ((1024, 1024), 1), ((1024, 1024), 0),
    ]:
        x = jax.random.uniform(jax.random.PRNGKey(0), (R, L), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (R, L), 0,
                                 R if axis == 0 else L, jnp.int32)

        def kern(x_ref, i_ref, o_ref, axis=axis):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

        def call(x, idx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)

        f = jax.jit(lambda x, i: jnp.sum(call(x, i)))
        # correctness check in interpret mode is implicit; check vs numpy
        try:
            got = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)
            want = jnp.take_along_axis(x, idx, axis=axis)
            ok = bool(jnp.allclose(got, want))
        except Exception as e:
            print(f"dyngather ({R},{L}) axis={axis}".ljust(58)
                  + "FAIL " + " ".join(str(e).split())[:110])
            continue
        tag = "" if ok else "  WRONG-VALUES"
        bench(f"dyngather ({R},{L}) axis={axis}{tag}",
              lambda: f(x, idx), R * L)


def part_b():
    print("--- B. XLA gather cost structure ---")
    H, W = 1080, 1920
    n = 1 << 21
    depth = jax.random.uniform(jax.random.PRNGKey(0), (H, W), jnp.float32)
    iy = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, H, jnp.int32)
    ix = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, W, jnp.int32)

    def slice_gather(sy, sx):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        idx = jnp.stack([jnp.minimum(iy, H - sy), jnp.minimum(ix, W - sx)], -1)
        f = jax.jit(lambda i: jnp.sum(jax.lax.gather(
            depth, i, dn, slice_sizes=(sy, sx),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)))
        f(idx)
        return lambda: f(idx)

    for sy, sx in [(1, 1), (1, 8), (1, 128), (4, 128), (8, 128), (8, 8)]:
        bench(f"xla slice gather ({sy},{sx}) n=2M", slice_gather(sy, sx), n)

    # table-size sweep: flat takes from tables of various sizes
    for tbits in (10, 13, 16, 21):
        T = 1 << tbits
        tab = jax.random.uniform(jax.random.PRNGKey(3), (T,), jnp.float32)
        li = jax.random.randint(jax.random.PRNGKey(4), (n,), 0, T, jnp.int32)
        f = jax.jit(lambda i: jnp.sum(jnp.take(tab, i)))
        f(li)
        bench(f"xla take table=2^{tbits} n=2M", lambda f=f, li=li: f(li), n)

    # one-hot matmul gather from small tables
    for T in (512, 2048):
        tab = jax.random.uniform(jax.random.PRNGKey(3), (T,), jnp.float32)
        li = jax.random.randint(jax.random.PRNGKey(4), (n,), 0, T, jnp.int32)

        def oh(i, tab=tab, T=T):
            i2 = i.reshape(-1, 1)
            oneh = (jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) == i2)
            return jnp.sum(jnp.dot(oneh.astype(jnp.bfloat16),
                                   tab.astype(jnp.bfloat16)[:, None],
                                   preferred_element_type=jnp.float32))

        f = jax.jit(oh)
        f(li)
        bench(f"one-hot matmul gather T={T} n=2M", lambda f=f, li=li: f(li), n)

    # scatter (compaction cost)
    vals = jax.random.uniform(jax.random.PRNGKey(5), (n,), jnp.float32)
    pidx = jax.random.permutation(jax.random.PRNGKey(6), n)[:, None]
    dnsc = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    f = jax.jit(lambda v, i: jnp.sum(jax.lax.scatter(
        jnp.zeros((n,), jnp.float32), i, v, dnsc,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)))
    f(vals, pidx)
    bench("xla scatter n=2M", lambda: f(vals, pidx), n)

    # sort by key
    keys = jax.random.randint(jax.random.PRNGKey(7), (n,), 0, 1 << 30, jnp.int32)
    f = jax.jit(lambda k, v: jnp.sum(jax.lax.sort([k, v], num_keys=1)[1]))
    f(keys, vals)
    bench("xla sort 2M (key,val)", lambda: f(keys, vals), n)

    # cumsum (for compaction index computation)
    f = jax.jit(lambda v: jnp.sum(jnp.cumsum(v)))
    f(vals)
    bench("xla cumsum 2M", lambda: f(vals), n)


if __name__ == "__main__":
    part_a()
    part_b()
