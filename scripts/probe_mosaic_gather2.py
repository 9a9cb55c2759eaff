"""Second Mosaic gather probe: shape sweep for take_along_axis /
dynamic_gather forms inside Pallas TPU kernels, with honest timing."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kernel, inputs, out_shape, iters=10):
    try:
        f = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )
        o = f(*inputs)
        np.asarray(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*inputs)
        r = np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
        n = int(np.prod(out_shape.shape))
        print(f"{name:52s} OK {dt*1e3:8.3f} ms {n/dt/1e9:7.2f} Gelem/s")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:90]
        print(f"{name:52s} FAIL {msg}")
        return False


def main():
    # Small tile forms first.
    for (s, l) in ((8, 128), (256, 128), (8, 512), (512, 1024)):
        x = jax.random.uniform(jax.random.PRNGKey(0), (s, l), jnp.float32)
        iy = jax.random.randint(jax.random.PRNGKey(1), (s, l), 0, s, jnp.int32)
        ix = jax.random.randint(jax.random.PRNGKey(2), (s, l), 0, l, jnp.int32)
        out = jax.ShapeDtypeStruct((s, l), jnp.float32)

        def k_taa0(x_ref, iy_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(x_ref[:], iy_ref[:], axis=0)

        def k_taa1(x_ref, ix_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(x_ref[:], ix_ref[:], axis=1)

        try_kernel(f"taa axis=0 (sublane) {s}x{l}", k_taa0, (x, iy), out)
        try_kernel(f"taa axis=1 (lane)    {s}x{l}", k_taa1, (x, ix), out)

    # Big flat-ish: gather 2M from (16, 129600)? lane-dim gather across
    # a wide array, idx full width.
    H, W = 1080, 1920
    s, l = 1080, 1920
    x = jax.random.uniform(jax.random.PRNGKey(0), (s, l), jnp.float32)
    iy = jax.random.randint(jax.random.PRNGKey(1), (s, l), 0, s, jnp.int32)
    ix = jax.random.randint(jax.random.PRNGKey(2), (s, l), 0, l, jnp.int32)
    out = jax.ShapeDtypeStruct((s, l), jnp.float32)

    def k_taa0(x_ref, iy_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], iy_ref[:], axis=0)

    def k_taa1(x_ref, ix_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(x_ref[:], ix_ref[:], axis=1)

    a0 = try_kernel("taa axis=0 1080x1920", k_taa0, (x, iy), out)
    a1 = try_kernel("taa axis=1 1080x1920", k_taa1, (x, ix), out)

    if a0 and a1:
        # Full 2D texture fetch via two passes + transpose:
        # step 1 (axis=0): rows[r,c] = x[iy[r,c], c]  -- wrong columns
        # This is NOT the composition; just measure combined cost scale.
        def k_two(x_ref, iy_ref, ix_ref, out_ref):
            g0 = jnp.take_along_axis(x_ref[:], iy_ref[:], axis=0)
            out_ref[:] = jnp.take_along_axis(g0, ix_ref[:], axis=1)

        try_kernel(
            "taa both axes chained 1080x1920",
            k_two,
            (x, iy, ix),
            out,
        )


if __name__ == "__main__":
    main()
