"""Round-2 gather probes, part 3: the decisive measurements.

  1. Pallas scalar-loop gather from a VMEM-resident table (cycles/idx).
  2. XLA gather with mostly-OOB indices under FILL_OR_DROP: are dropped
     indices cheaper (free lane masking)?
  3. Pallas fused one-hot MXU gather from a <=2048-entry VMEM table.
  4. XLA sort at 2M (compaction building block).
"""

import functools
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
        ns = dt / n_idx * 1e9
        print(f"{name:58s} OK {dt*1e3:9.3f} ms {ns:7.2f} ns/idx")
        return dt
    except Exception as e:
        msg = " ".join(str(e).split())[:120]
        print(f"{name:58s} FAIL {msg}")
        return None


def p1_scalar_loop():
    print("--- 1. Pallas scalar-loop gather from VMEM table ---")
    # Table in VMEM: (8192, 128) f32 = 4 MB (stand-in for f16 1080p L0).
    T_R, T_L = 8192, 128
    tab = jax.random.uniform(jax.random.PRNGKey(0), (T_R, T_L), jnp.float32)
    # Gather N indices; output (N//128, 128).
    for N in (1 << 14, 1 << 17):
        r = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T_R, jnp.int32)
        l = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, T_L, jnp.int32)
        rows, lanes = N // 128, 128
        r2 = r.reshape(rows, lanes)
        l2 = l.reshape(rows, lanes)

        def kern(tab_ref, r_ref, l_ref, o_ref):
            def body(i, _):
                def inner(j, _):
                    o_ref[i, j] = tab_ref[r_ref[i, j], l_ref[i, j]]
                    return 0
                return jax.lax.fori_loop(0, lanes, inner, 0)
            jax.lax.fori_loop(0, rows, body, 0)

        def call(tab, r2, l2):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, r2, l2)

        f = jax.jit(lambda a, b, c: jnp.sum(call(a, b, c)))
        bench(f"pallas scalar-loop gather N={N>>10}K",
              lambda: f(tab, r2, l2), N, iters=5)


def p2_oob():
    print("--- 2. XLA gather with mostly-OOB indices (FILL_OR_DROP) ---")
    n = 1 << 21
    T = 1 << 21
    tab = jax.random.uniform(jax.random.PRNGKey(0), (T,), jnp.float32)
    base = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, T, jnp.int32)
    for frac_oob in (0.0, 0.5, 0.9, 1.0):
        k = int(n * frac_oob)
        mask = jnp.arange(n) < k
        idx = jnp.where(mask, jnp.int32(T + 5), base)[:, None]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))
        f = jax.jit(lambda i: jnp.sum(jax.lax.gather(
            tab, i, dn, slice_sizes=(1,),
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP, fill_value=0.0)))
        f(idx)
        bench(f"xla gather oob_frac={frac_oob}", lambda f=f, idx=idx: f(idx), n)


def p3_onehot_pallas():
    print("--- 3. Pallas fused one-hot MXU gather, table<=2048 ---")
    n = 1 << 21
    for T, C, rows in ((1024, 128, 1024), (2048, 128, 1024),
                       (1024, 128, 2048), (8192, 128, 1024)):
        # tab (T, C) f32; gather rows of C channels? No: C=128 here means
        # the one-hot matmul output keeps 128 lanes so the MXU is fully
        # used; we gather the lane of interest afterward with a cheap
        # dynamic_gather... for now measure the pure one-hot row-fetch
        # with C=128 output channels (a full (1,128) row per index).
        tabf = jax.random.uniform(jax.random.PRNGKey(0), (T, C), jnp.float32)
        tab = tabf.astype(jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, T, jnp.int32)
        grid = n // rows
        idx3 = idx.reshape(grid, rows // 128, 128)

        def kern(tab_ref, i_ref, o_ref, T=T, C=C, rows=rows):
            ii = i_ref[:].reshape(rows, 1)
            oneh = (jax.lax.broadcasted_iota(jnp.int32, (rows, T), 1)
                    == ii).astype(jnp.bfloat16)
            o_ref[:] = jnp.dot(oneh, tab_ref[:],
                               preferred_element_type=jnp.float32
                               ).reshape(1, rows // 128, 128, C)

        def call(tab, idx3, T=T, C=C, rows=rows, grid=grid, kern=kern):
            return pl.pallas_call(
                kern,
                grid=(grid,),
                out_shape=jax.ShapeDtypeStruct(
                    (grid, rows // 128, 128, C), jnp.float32),
                in_specs=[
                    pl.BlockSpec((T, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, rows // 128, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, rows // 128, 128, C), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM),
            )(tab, idx3)

        f = jax.jit(lambda a, b: jnp.sum(call(a, b)))
        try:
            got = np.asarray(call(tab, idx3))[..., 0]
            want = np.asarray(tabf[idx, 0].reshape(grid, rows // 128, 128))
            if not np.allclose(got, want, atol=1e-2):
                print(f"onehot T={T}: WRONG VALUES")
        except Exception as e:
            print(f"pallas one-hot T={T} rows={rows} n=2M".ljust(58)
                  + "FAIL " + " ".join(str(e).split())[:110])
            continue
        bench(f"pallas one-hot T={T} rows={rows} (row of {C}) n=2M",
              lambda: f(tab, idx3), n)


def p4_sort():
    print("--- 4. XLA sort 2M ---")
    n = 1 << 21
    keys = jax.random.randint(jax.random.PRNGKey(7), (n,), 0, 1 << 30, jnp.int32)
    vals = jax.random.uniform(jax.random.PRNGKey(5), (n,), jnp.float32)
    f = jax.jit(lambda k, v: jnp.sum(jax.lax.sort([k, v], num_keys=1)[1]))
    f(keys, vals)
    bench("xla sort 2M (key,val)", lambda: f(keys, vals), n, iters=3)
    f2 = jax.jit(lambda v: jnp.sum(jnp.cumsum(v)))
    f2(vals)
    bench("xla cumsum 2M", lambda: f2(vals), n)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "1234"
    if "1" in which: p1_scalar_loop()
    if "2" in which: p2_oob()
    if "3" in which: p3_onehot_pallas()
    if "4" in which: p4_sort()
