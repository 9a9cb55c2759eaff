"""Round-3 probe: per-phase cost + occupancy ledger for the hiz frame.

Measures, at the headline config (BoxScene 1080p, 4 bounces, 24 steps,
spp 1, hiz kernel):

  A. Occupancy stats that price the compaction levers (TODO.md 1):
     - alive lane fraction entering each bounce (between-bounce
       compaction capacity design)
     - unresolved lane fraction entering each resolve round
       (intra-march round compaction design)
     - candidate-count distribution (K-cap + chain design)
  B. Phase timings by n_rounds ablation: t(R=0) = schedule+filter+pack
     + decode + brdf, marginal per-round cost from t(R=1), t(R=4).
  C. Standalone kernel prices at frame shapes: build_depth_tiles,
     broadcast_table_select, pack_by_slot, row_gather.

Honest timing per TODO.md quirks: scalar reduction forced to host each
iter; one process owns the TPU.
"""

import json
import os
import sys
import time

# In-process path bootstrap (NOT PYTHONPATH: the env var propagates to
# the axon TPU plugin's helper subprocess and breaks its backend
# registration on this stack).
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from unitysspathtracingurp_tpu.config import PTConfig, PTSettings  # noqa: E402
from unitysspathtracingurp_tpu.models import fixtures, scene  # noqa: E402
from unitysspathtracingurp_tpu.ops.envprobe import ProbeSet, constant_probe  # noqa: E402
from unitysspathtracingurp_tpu.ops.depth_tiles import build_depth_tiles  # noqa: E402
from unitysspathtracingurp_tpu.ops.pathtrace_hiz import trace_frame_hiz  # noqa: E402
from unitysspathtracingurp_tpu.ops.pallas_gather import (  # noqa: E402
    broadcast_table_select,
    pack_by_slot,
    row_gather,
)

H, W = 1080, 1920
BOUNCES, STEPS, SPP = 4, 24, 1
N = H * W


def bench(name, f, *args, iters=8):
    print(f"compile {name} ...", flush=True)
    t0 = time.perf_counter()
    float(f(*args))
    print(f"  compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = float(f(*args))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"  {name}: {dt:.2f} ms", flush=True)
    return dt, r


def main():
    # One TPU program per process (TODO.md quirk: a second large program
    # in one process can die with INVALID_ARGUMENT) — select a section.
    mode = sys.argv[1] if len(sys.argv) > 1 else "stats"
    sc = scene.build_box_scene()
    cam = fixtures.box_scene_camera(H, W)
    gb = fixtures.rasterize_gbuffers(sc, cam, H, W)
    probes = ProbeSet(probe0=constant_probe([0.05, 0.06, 0.08]))
    settings = PTSettings(
        maximum_depth=BOUNCES, samples_per_pixel=SPP,
        maximum_steps=STEPS, dithering=False,
    )
    cfg = PTConfig()
    variants = settings.variants()
    tiles = jax.jit(build_depth_tiles)(gb.layer1_depth(), cam.near, cam.far)
    fi = jnp.uint32(33)
    ledger = {}

    if mode != "stats":
        run_timing(mode, gb, cam, probes, settings, cfg, variants, tiles, fi,
                   ledger)
        return

    # ---- A. occupancy stats -------------------------------------------
    def stats_fn(gb, cam, probes, fi):
        dbg = {}
        img = trace_frame_hiz(
            gb, cam, probes, settings, cfg, variants, fi,
            tiles=tiles, _debug_out=dbg,
        )
        dbg.pop("_calls", None)
        dbg = {k: v for k, v in dbg.items() if not k.startswith("_")}
        return img.sum(), dbg

    print("compile stats pass ...", flush=True)
    _, dbg = jax.jit(stats_fn)(gb, cam, probes, fi)
    dbg = {k: np.asarray(v) for k, v in dbg.items()}
    print("\n-- occupancy --", flush=True)
    for b in range(BOUNCES):
        a = int(dbg[f"alive_in_b{b}"])
        ledger[f"alive_frac_b{b}"] = round(a / N, 4)
        print(f"alive entering bounce {b}: {a} ({a / N:.1%})")
    for c in range(BOUNCES):
        fracs = []
        for r in range(10):
            k = f"c{c}_active_r{r}"
            if k in dbg:
                fracs.append(round(int(dbg[k]) / N, 4))
        ledger[f"round_active_b{c}"] = fracs
        print(f"bounce {c} rounds active frac: {fracs}")
        nc = dbg[f"c{c}_n_cand"].ravel()
        nct = dbg[f"c{c}_n_cand_true"].ravel()
        ledger[f"n_cand_b{c}"] = dict(
            mean=float(nc.mean()), p99=int(np.percentile(nc, 99)),
            max=int(nc.max()), sat_frac=float((nct > nc.max()).mean()),
            true_max=int(nct.max()),
        )
        print(f"bounce {c} n_cand: {ledger[f'n_cand_b{c}']}")
        lanes_with = (nc > 0).sum()
        ledger[f"home_b{c}"] = dict(
            cand_in_home=round(
                int(dbg[f"c{c}_cand_in_home"]) / max(int(dbg[f"c{c}_cand_total"]), 1), 3
            ),
            first_in_home=round(
                int(dbg[f"c{c}_first_in_home"]) / max(int(lanes_with), 1), 3
            ),
        )
        print(f"bounce {c} home-window: {ledger[f'home_b{c}']}")
        tot = max(int(dbg[f"c{c}_cand_total"]), 1)
        ledger[f"spread_b{c}"] = {
            f"within_{lim}": round(int(dbg[f"c{c}_cand_within_{lim}"]) / tot, 3)
            for lim in (1, 2, 4, 8, 16)
        }
        print(f"bounce {c} cand spread: {ledger[f'spread_b{c}']}")

    print("\n" + json.dumps(ledger, indent=1), flush=True)
    with open("/tmp/probe_r3_stats.json", "w") as f:
        json.dump(ledger, f, indent=1)


def run_timing(mode, gb, cam, probes, settings, cfg, variants, tiles, fi, ledger):
    if mode == "R0dbg":
        # R=0 alone lets XLA dead-code-eliminate phases 1-3 entirely
        # (nothing consumes the candidates); forcing the n_cand debug
        # output keeps schedule+filter+pack alive, so
        # (t_R0dbg - t_R0) / bounces = per-bounce phase 1-3 cost.
        def f(gb, cam, probes, fi):
            dbg = {}
            img = trace_frame_hiz(
                gb, cam, probes, settings, cfg, variants, fi,
                tiles=tiles, n_rounds=0, _debug_out=dbg,
            )
            return img.sum() + sum(
                v.sum() for k, v in dbg.items() if k.endswith("n_cand")
            )

        dt, _ = bench("frame R=0 + pack kept", jax.jit(f), gb, cam, probes, fi)
        ledger["frame_ms_R0dbg"] = round(dt, 2)
    elif mode == "comp":
        # Candidate production config: between-bounce + round compaction.
        ccfg = PTConfig(
            compaction_caps=(1.0, 0.5, 0.3125, 0.25), hiz_round_cap=0.5
        )

        def f(gb, cam, probes, fi):
            return trace_frame_hiz(
                gb, cam, probes, settings, ccfg, variants, fi, tiles=tiles
            ).sum()

        dt, _ = bench("frame R=4 compacted", jax.jit(f), gb, cam, probes, fi)
        ledger["frame_ms_comp"] = round(dt, 2)
    elif mode == "compb":
        # Bounce compaction only (isolates the two levers).
        ccfg = PTConfig(compaction_caps=(1.0, 0.5, 0.3125, 0.25))

        def f(gb, cam, probes, fi):
            return trace_frame_hiz(
                gb, cam, probes, settings, ccfg, variants, fi, tiles=tiles
            ).sum()

        dt, _ = bench("frame R=4 bounce-compacted", jax.jit(f), gb, cam, probes, fi)
        ledger["frame_ms_compb"] = round(dt, 2)
    elif mode.startswith("R"):
        n_rounds = int(mode[1:])

        def f(gb, cam, probes, fi):
            return trace_frame_hiz(
                gb, cam, probes, settings, cfg, variants, fi,
                tiles=tiles, n_rounds=n_rounds,
            ).sum()

        dt, _ = bench(f"frame R={n_rounds}", jax.jit(f), gb, cam, probes, fi)
        ledger[f"frame_ms_{mode}"] = round(dt, 2)
    elif mode == "kernels":
        dt, _ = bench(
            "build_depth_tiles",
            jax.jit(
                lambda d: build_depth_tiles(d, cam.near, cam.far).pair_table.sum()
            ),
            gb.layer1_depth(),
        )
        ledger["build_tiles_ms"] = round(dt, 2)

        n_mini = tiles.n_mini_chunks
        idx = jnp.asarray(
            np.random.randint(0, n_mini * 128, size=(STEPS, N)), jnp.int32
        )
        dt, _ = bench(
            f"minitile select (S={STEPS}, chunks={n_mini})",
            jax.jit(lambda t, i: broadcast_table_select(t, i, n_mini).sum()),
            tiles.mini_table, idx,
        )
        ledger["mini_select_ms"] = round(dt, 2)

        cand = jnp.asarray(np.random.rand(STEPS, N) < 0.12)
        fields = [
            jnp.asarray(np.random.rand(STEPS, N), jnp.float32) for _ in range(3)
        ]

        def packf(cand, *fs):
            packed, n = pack_by_slot(cand, list(fs), 16)
            return sum(p.sum() for p in packed) + n.sum()

        dt, _ = bench("pack_by_slot K=16", jax.jit(packf), cand, *fields)
        ledger["pack_ms"] = round(dt, 2)

        rows = jnp.asarray(
            np.random.randint(0, tiles.pair_table.shape[0], size=(N,)), jnp.int32
        )
        dt, _ = bench(
            "row_gather 2M x 128",
            jax.jit(lambda t, r: row_gather(t, r).sum()),
            tiles.pair_table, rows,
        )
        ledger["row_gather_ms"] = round(dt, 2)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print("\n" + json.dumps(ledger, indent=1), flush=True)
    with open(f"/tmp/probe_r3_{mode}.json", "w") as f:
        json.dump(ledger, f, indent=1)


if __name__ == "__main__":
    main()
