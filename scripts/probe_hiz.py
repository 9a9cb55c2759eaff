"""Round-2 probes, part 5: price the hierarchical-march building blocks.

  A. XLA row gather for the fine depth-tile fetch:
     (32640, 64) f32 table (8x8 tiles @ 1080p) and friends.
  B. Pallas coarse-march kernel: K dependent steps, each projecting a
     world position and testing against a broadcast (1, T) min-depth
     table (T = 128 / 256). Reports marginal ms per step.
  C. Pallas in-tile multi-test kernel: per-ray (64,) f32 tile rows in
     VMEM-streamed blocks, K dependent tests per ray inside one kernel.
  D. End-to-end per-bounce cost model printout.

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

N = 1 << 21  # 1080p-ish lane count


def bench(name, f, iters=10):
    print(f"compiling {name} ...", flush=True)
    try:
        o = f()
        float(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f()
        float(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:62s} OK {dt*1e3:9.3f} ms", flush=True)
        return dt
    except Exception as e:
        msg = " ".join(str(e).split())[:120]
        print(f"{name:62s} FAIL {msg}", flush=True)
        return None


def part_a():
    print("--- A. fine tile fetch: XLA row gather prices ---")
    for rows, c, dt_ in [
        (32640, 64, jnp.float32),   # 8x8 f32 tiles @ 1080p (8.36 MB)
        (32640, 64, jnp.uint32),    # same, packed words
        (16320, 128, jnp.uint32),   # 16x8 tiles, f16x2 (8.36 MB)
        (16320, 64, jnp.uint32),    # 16x8 tiles, f16x2 but half table (4.2 MB)
        (8160, 64, jnp.uint32),     # 16x16 tiles f16x2 at half-res table
        (510, 32, jnp.uint32),      # mid narrow row (64px cell -> 32 tile mins)
    ]:
        if dt_ == jnp.float32:
            tab = jax.random.uniform(jax.random.PRNGKey(0), (rows, c), dt_)
        else:
            tab = jax.random.randint(
                jax.random.PRNGKey(0), (rows, c), 0, 1 << 30, jnp.uint32)
        bi = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, rows, jnp.int32)

        def g(bi, tab=tab, c=c):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,))
            return jnp.sum(jax.lax.gather(
                tab, bi[:, None], dn, slice_sizes=(1, c),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
            ).astype(jnp.float32))

        f = jax.jit(g)
        f(bi)
        mb = rows * c * 4 / 1e6
        bench(f"row gather ({rows},{c}) {dt_.__name__} [{mb:.1f} MB] n=2M",
              lambda f=f, bi=bi: f(bi))


def _coarse_kernel(K, T, rows):
    """March K dependent steps per lane against a (1, T) min table.
    Planar (rows, 128) per-component inputs (minor-dim-3 arrays made the
    Mosaic compile pathological)."""

    def kern(vp_ref, tab_ref, px_ref, py_ref, pz_ref,
             dx_ref, dy_ref, dz_ref, out_ref):
        vp = vp_ref[:]  # (8, 128) padded; vp[r, c<4] used
        tab = tab_ref[:]  # (T//128, 128): chunk rows, static-sliced
        px = px_ref[:]
        py = py_ref[:]
        pz = pz_ref[:]
        dx = dx_ref[:]
        dy = dy_ref[:]
        dz = dz_ref[:]
        step = jnp.full(px.shape, 0.1, jnp.float32)
        cand = jnp.zeros(px.shape, jnp.int32)
        active = jnp.ones(px.shape, jnp.bool_)

        m = [[vp[r, c] for c in range(4)] for r in range(4)]

        def body(i, st):
            px, py, pz, step, cand, active = st
            px = px + step * dx
            py = py + step * dy
            pz = pz + step * dz
            cx = m[0][0] * px + m[0][1] * py + m[0][2] * pz + m[0][3]
            cy = m[1][0] * px + m[1][1] * py + m[1][2] * pz + m[1][3]
            cz = m[2][0] * px + m[2][1] * py + m[2][2] * pz + m[2][3]
            cw = m[3][0] * px + m[3][1] * py + m[3][2] * pz + m[3][3]
            inv_w = 1.0 / cw
            u = cx * inv_w * 0.5 + 0.5
            v = cy * inv_w * 0.5 + 0.5
            hitd = 1.0 / jnp.maximum(cz * inv_w, 1e-6)  # stand-in linear depth
            gw = 16
            gh = T // 16
            cu = jnp.clip((u * gw).astype(jnp.int32), 0, gw - 1)
            cv = jnp.clip((v * gh).astype(jnp.int32), 0, gh - 1)
            cell = cv * gw + cu
            # chunked select from the table: static row slices of the
            # (T//128, 128) chunk matrix, broadcast each to lane form
            got = jnp.zeros(px.shape, jnp.float32)
            for c in range(T // 128):
                chunk = jnp.broadcast_to(tab[c:c + 1, :],
                                         (px.shape[0], 128))
                g = jnp.take_along_axis(chunk, cell & 127, axis=1)
                got = got + jnp.where((cell >> 7) == c, g, 0.0)
            is_cand = active & (hitd >= got)
            cand = jnp.where(is_cand & (cand == 0), i + 1, cand)
            active = active & ~is_cand
            step = jnp.where(active, step * 1.1, step)
            return (px, py, pz, step, cand, active)

        st = (px, py, pz, step, cand, active)
        for i in range(K):
            st = body(i, st)
        out_ref[:] = st[4]

    return kern


def part_b():
    print("--- B. Pallas coarse-march kernel (K dependent steps) ---")
    rows = 512
    grid = (N // 128) // rows
    vp = jax.random.uniform(jax.random.PRNGKey(0), (8, 128), jnp.float32)
    ks = [jax.random.uniform(jax.random.PRNGKey(10 + i), (N // 128, 128),
                             jnp.float32) for i in range(6)]
    for T in (128, 512, 1024):
        tab = jax.random.uniform(jax.random.PRNGKey(3), (T // 128, 128),
                                 jnp.float32)
        for K in (6, 18):
            kern = _coarse_kernel(K, T, rows)

            def call(vp, tab, *planes, kern=kern, T=T):
                return pl.pallas_call(
                    kern,
                    grid=(grid,),
                    out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
                    in_specs=[
                        pl.BlockSpec((8, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((T // 128, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)] * 6,
                    out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                )(vp, tab, *planes)

            f = jax.jit(lambda a, b, *p: jnp.sum(call(a, b, *p)))
            bench(f"coarse march T={T} K={K} steps n=2M",
                  lambda: f(vp, tab, *ks))


def part_c():
    """The real in-tile layout: fetched tile rows (N_rays, 128) f32,
    rays = rows; all K in-tile test positions batched into the 128
    lanes; ONE take_along_axis(axis=1) per slab resolves every test."""
    print("--- C. per-ray tile-row batched tests ---")
    rows = 512
    grid = N // rows
    blocks = jax.random.uniform(jax.random.PRNGKey(0), (N, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N, 128), 0, 128,
                             jnp.int32)

    def kern(b_ref, i_ref, o_ref):
        got = jnp.take_along_axis(b_ref[:], i_ref[:], axis=1)
        # reduce the K tests to one lane result (stand-in for the
        # first-hit reduction)
        o_ref[:] = jnp.min(got, axis=1, keepdims=True) + jnp.zeros(
            (b_ref.shape[0], 128), jnp.float32)

    def call(blocks, idx):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec((rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(blocks, idx)

    try:
        got = np.asarray(call(blocks, idx))[:3, 0]
        want = np.take_along_axis(np.asarray(blocks)[:3],
                                  np.asarray(idx)[:3], axis=1).min(axis=1)
        print("correct:", np.allclose(got, want), flush=True)
    except Exception as e:
        print("per-ray batched FAIL", " ".join(str(e).split())[:110],
              flush=True)
    f = jax.jit(lambda a, b: jnp.sum(call(a, b)))
    bench("per-ray tile-row 128-batched tests n=2M rays", lambda: f(blocks, idx))

    # smaller output (reduce inside): avoids writing 1 GB out
    def kern2(b_ref, i_ref, o_ref):
        got = jnp.take_along_axis(b_ref[:], i_ref[:], axis=1)
        o_ref[:] = jnp.min(got, axis=1, keepdims=True)

    def call2(blocks, idx):
        return pl.pallas_call(
            kern2,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec((rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(blocks, idx)

    f2 = jax.jit(lambda a, b: jnp.sum(call2(a, b)))
    bench("per-ray tile-row batched tests, narrow out n=2M", lambda: f2(blocks, idx))
    return


def part_c_old():
    print("--- C. Pallas in-tile multi-test kernel ---")
    rows = 128  # 128 x 64 x 128 f32 block = 4 MB VMEM
    grid = (N // 128) // rows
    # per-ray tile rows: (N, 64) f32 but lanes are (N//128, 128): layout
    # (N//128, 128, 64)? 64 in minor -> bad tiling. Use (N//128 * 64?, ...)
    # Real layout choice: blocks as (N, 64) -> reshape (N//128, 128*64)?
    # Simplest well-tiled form: blocks (rows*grid, 128, 64) won't tile on
    # lane dim 64. Use (N//128, 64, 128): per row-group r, texel t, lane l
    # = block[r, t, l] -> tile (sublane=64, lane=128) OK.
    blocks = jax.random.uniform(jax.random.PRNGKey(0), (N // 128, 64, 128),
                                jnp.float32)
    pos0 = jax.random.uniform(jax.random.PRNGKey(1), (N // 128, 128),
                              jnp.float32)

    for K in (1, 6, 12):
        def kern(b_ref, p_ref, o_ref, K=K):
            b = b_ref[:]  # (rows_b, 64, 128)
            p = p_ref[:]
            acc = jnp.zeros(p.shape, jnp.float32)
            t = p
            for i in range(K):
                t = t * 1.1 + 0.01
                idx = jnp.clip((t * 64).astype(jnp.int32), 0, 63)
                # select texel idx from own tile: tile axis is sublane dim
                # b[r, idx[r,l], l]: use one-hot over 64 sublanes
                oh = (jax.lax.broadcasted_iota(
                    jnp.int32, (p.shape[0], 64, 128), 1)
                    == idx[:, None, :])
                got = jnp.sum(jnp.where(oh, b, 0.0), axis=1)
                acc = acc + got
            o_ref[:] = acc

        def call(blocks, pos0, kern=kern):
            return pl.pallas_call(
                kern,
                grid=(grid,),
                out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec((rows, 64, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(blocks, pos0)

        f = jax.jit(lambda a, b: jnp.sum(call(a, b)))
        bench(f"in-tile one-hot-sublane test K={K} n=2M",
              lambda: f(blocks, pos0))

    # variant: tile along lanes (128 texels/tile as minor dim), select via
    # take_along_axis on lanes
    rows = 64  # 64 x 128 x 128 f32 block = 4 MB VMEM
    grid = (N // 128) // rows
    blocks2 = jax.random.uniform(jax.random.PRNGKey(0), (N // 128, 128, 128),
                                 jnp.float32)

    for K in (1, 6, 12):
        def kern2(b_ref, p_ref, o_ref, K=K):
            p = p_ref[:]
            acc = jnp.zeros(p.shape, jnp.float32)
            t = p
            for i in range(K):
                t = t * 1.1 + 0.01
                idx = jnp.clip((t * 128).astype(jnp.int32), 0, 127)
                # b[r, l, idx[r, l]] -- per (r,l) select along last axis.
                # take_along_axis needs matching dims: (rows,128,128) with
                # idx (rows,128,1)
                got = jnp.take_along_axis(
                    b_ref[:], idx[:, :, None], axis=2)[..., 0]
                acc = acc + got
            o_ref[:] = acc

        def call2(blocks2, pos0, kern2=kern2):
            return pl.pallas_call(
                kern2,
                grid=(grid,),
                out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec((rows, 128, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(blocks2, pos0)

        f = jax.jit(lambda a, b: jnp.sum(call2(a, b)))
        bench(f"in-tile take_along minor-axis K={K} (128-texel tiles) n=2M",
              lambda: f(blocks2, pos0))


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "abc"
    if "a" in which: part_a()
    if "b" in which: part_b()
    if "c" in which: part_c()
