#!/bin/bash
# Round-5 TPU work queue, run after run_quality_chain_r5.sh finishes.
# Order: fast perf probes (gate the round-5 resolve work), then the
# dual 1080p quality artifact, then the suite + renderer-path bench.
set -x
cd "$(dirname "$0")/.."

# Wait for the quality chain to release the TPU.
while kill -0 "$(cat /tmp/quality_chain.pid)" 2>/dev/null; do sleep 20; done

# D. Op-level profile of the exact headline config.
timeout 1200 python -u scripts/probe_profile.py headline 2>&1 | grep -v "WARNING\|^E08" | tail -6

# E. Occupancy/home-window stats (sizes the resolve levers).
timeout 1800 python -u scripts/probe_r3_phases.py stats 2>&1 | grep -v WARNING | tail -40

# C. Dual 1080p converged deviation artifact (256 frames both kernels).
timeout 3600 python -u scripts/quality_headline.py --dual --frames 256 2>&1 | tail -3

# A. Five+1-config suite at current speed.
timeout 3600 python -u scripts/bench_suite.py 2>&1 | tail -8

# B. Product-path headline (Renderer.render_frame).
BENCH_VIA=renderer timeout 1200 python -u bench.py 2>&1 | tail -2

echo QUEUE_DONE
