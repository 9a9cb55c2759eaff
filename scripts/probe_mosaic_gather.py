"""Probe which 2D gather forms Mosaic supports inside a Pallas TPU kernel."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1024, 1024  # depth buffer resident in VMEM (4 MB)
TH, TW = 256, 1024  # lane tile


def run(name, kernel, *inputs, out_shape=None):
    try:
        f = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=out_shape or jax.ShapeDtypeStruct((TH, TW), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )
        o = f(*inputs)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(*inputs)
        jax.block_until_ready(o)
        n = TH * TW
        dt = (time.perf_counter() - t0) / 20
        print(f"{name:44s} OK {dt*1e3:7.3f} ms  {n/dt/1e9:6.2f} Gelem/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:44s} FAIL {msg}")


def main():
    depth = jax.random.uniform(jax.random.PRNGKey(0), (H, W), jnp.float32)
    iy = jax.random.randint(jax.random.PRNGKey(1), (TH, TW), 0, H, jnp.int32)
    ix = jax.random.randint(jax.random.PRNGKey(2), (TH, TW), 0, W, jnp.int32)

    def k_fancy(d_ref, iy_ref, ix_ref, out_ref):
        out_ref[:] = d_ref[:][iy_ref[:], ix_ref[:]]

    run("fancy d[iy,ix]", k_fancy, depth, iy, ix)

    def k_taa0(d_ref, iy_ref, ix_ref, out_ref):
        # take_along_axis over rows: out[t,w] = d[iy[t,w], w]
        d = d_ref[:]
        out_ref[:] = jnp.take_along_axis(d[:TH, :], iy_ref[:] % TH, axis=0)

    run("take_along_axis axis=0 (row sel)", k_taa0, depth, iy, ix)

    def k_taa1(d_ref, iy_ref, ix_ref, out_ref):
        # take_along_axis over lanes: out[t,w] = d[t, ix[t,w]]
        d = d_ref[:]
        out_ref[:] = jnp.take_along_axis(d[:TH, :], ix_ref[:], axis=1)

    run("take_along_axis axis=1 (lane sel)", k_taa1, depth, iy, ix)

    def k_two_stage(d_ref, iy_ref, ix_ref, out_ref):
        # full 2D gather = row-gather along axis 0 at each lane's own
        # column... then lane shuffle along axis 1: d[iy[t,w], ix[t,w]]
        # = take_along_axis(take_along_axis(d, iy, 0)?? not composable;
        # try: rows = d[iy[t,w], w'] impossible. Instead gather linear on
        # reshaped (1, H*W) along lanes:
        d = d_ref[:].reshape(1, H * W)
        lin = (iy_ref[:] * W + ix_ref[:]).reshape(1, TH * TW)
        g = jnp.take_along_axis(
            jnp.broadcast_to(d, (1, H * W)), lin, axis=1
        )
        out_ref[:] = g.reshape(TH, TW)

    run("take_along_axis lanes on (1,H*W)", k_two_stage, depth, iy, ix)

    def k_dyn_slice_loop(d_ref, iy_ref, ix_ref, out_ref):
        # per-row dynamic slice: only scalar indices; gather row iy[t,0]
        out_ref[:] = jax.lax.fori_loop(
            0,
            TH,
            lambda t, _: None
            or (out_ref.at[t, :].set(d_ref[iy_ref[t, 0], :]), None)[1]
            or None,
            None,
        ) or out_ref[:]

    # skip k_dyn_slice_loop (awkward); try lax.gather directly
    def k_lax_gather(d_ref, iy_ref, ix_ref, out_ref):
        d = d_ref[:]
        idx = jnp.stack([iy_ref[:], ix_ref[:]], axis=-1).reshape(-1, 2)
        g = jax.lax.gather(
            d,
            idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(),
                collapsed_slice_dims=(0, 1),
                start_index_map=(0, 1),
            ),
            slice_sizes=(1, 1),
        )
        out_ref[:] = g.reshape(TH, TW)

    run("lax.gather point 2D", k_lax_gather, depth, iy, ix)


if __name__ == "__main__":
    main()
