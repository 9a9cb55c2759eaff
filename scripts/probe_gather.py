"""Empirical probe: which gather strategies work/are fast in Pallas on TPU.

The fused path-trace kernel needs per-lane random access into the depth
buffer (depth[iy, ix] with per-pixel computed indices). This probe
measures the candidates on real hardware before committing to a design:
  A. XLA-level jnp.take (the oracle's current approach, baseline)
  B. Pallas kernel with whole-depth in VMEM + jnp.take inside
  C. Pallas kernel with take_along_axis inside
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1080, 1920
N = H * W


def bench(fn, *args, iters=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    gels = N / dt / 1e9
    print(f"{name:40s} {dt*1e3:8.3f} ms  {gels:8.3f} Gelem/s")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    depth = jax.random.uniform(key, (H, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, N, jnp.int32)

    # A: XLA take
    @jax.jit
    def xla_take(depth, idx):
        return jnp.take(depth.reshape(-1), idx, axis=0)

    bench(xla_take, depth, idx, name="A: XLA jnp.take full-screen")

    # B: Pallas, depth fully in VMEM, gather via jnp.take inside kernel
    def kernel_take(depth_ref, idx_ref, out_ref):
        flat = depth_ref[:].reshape(-1)
        out_ref[:] = jnp.take(flat, idx_ref[:], axis=0)

    TILE = 256  # rows per grid step for the index/out tiles

    @jax.jit
    def pallas_take(depth, idx):
        return pl.pallas_call(
            kernel_take,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            grid=(H // TILE,),
            in_specs=[
                pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(depth, idx)

    try:
        bench(pallas_take, depth, idx, name="B: Pallas VMEM-resident take")
    except Exception as e:
        print("B failed:", str(e)[:300])

    # C: Pallas 2D take_along_axis per row-block
    def kernel_taa(depth_ref, iy_ref, ix_ref, out_ref):
        d = depth_ref[:]
        iy = iy_ref[:]
        ix = ix_ref[:]
        flat = d.reshape(1, -1)
        lin = iy * W + ix
        out_ref[:] = jnp.take_along_axis(
            jnp.broadcast_to(flat, (TILE, H * W)), lin, axis=1
        )[..., :W]

    # (C is likely memory-infeasible; skip unless B fails.)

    # D: XLA take with sorted indices (measures locality sensitivity)
    idx_sorted = jnp.sort(idx, axis=None).reshape(H, W)
    bench(xla_take, depth, idx_sorted, name="D: XLA take, sorted indices")

    # E: smaller tile of gathers (VMEM-local source 256x256)
    depth_small = depth[:256, :256]
    idx_small = jax.random.randint(jax.random.PRNGKey(2), (H, W), 0, 256 * 256, jnp.int32)

    @jax.jit
    def xla_take_small(depth, idx):
        return jnp.take(depth.reshape(-1), idx, axis=0)

    bench(xla_take_small, depth_small, idx_small, name="E: XLA take from 256x256 source")

    def kernel_take_small(depth_ref, idx_ref, out_ref):
        flat = depth_ref[:].reshape(-1)
        out_ref[:] = jnp.take(flat, idx_ref[:], axis=0)

    @jax.jit
    def pallas_take_small(depth, idx):
        return pl.pallas_call(
            kernel_take_small,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            grid=(H // TILE,),
            in_specs=[
                pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(depth, idx)

    try:
        bench(pallas_take_small, depth_small, idx_small, name="F: Pallas take from 256x256 VMEM")
    except Exception as e:
        print("F failed:", str(e)[:300])


if __name__ == "__main__":
    main()
