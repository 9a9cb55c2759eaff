#!/bin/bash
# Round-5 quality-evidence chain (VERDICT r4 items 3+4): regenerate the
# TPU golden post-precision-fix, quantify the stale-golden offset,
# rerun convergence for all three noise modes against the fresh golden,
# and re-measure the headline hiz-vs-parity deviation. One TPU process
# at a time (TODO.md quirks).
set -x
cd "$(dirname "$0")/.."

# 1. Stash the pre-precision-fix golden (commit 989076e) for the diff.
if [ -f fixtures/box256_golden.npz ] && [ ! -f /tmp/box256_golden_prefix.npz ]; then
  cp fixtures/box256_golden.npz /tmp/box256_golden_prefix.npz
fi
rm -f fixtures/box256_golden.npz

# 2. Regenerate golden (16384 frames, parity tracer, current code) +
#    frames-to-converge + oracle RMSE.
python -u scripts/quality_report.py 2>&1 | tail -5

# 3. Quantify the stale-golden offset (explains/refutes the sobol 2.9%
#    convergence floor, VERDICT r4 missing 5).
python - <<'EOF'
import numpy as np, json
old = np.load('/tmp/box256_golden_prefix.npz')['image']
new = np.load('fixtures/box256_golden.npz')['image']
H = W = 256
pool = lambda x: x.reshape(H//4,4,W//4,4,3).mean((1,3))
d = np.linalg.norm(pool(old)-pool(new), axis=-1)
r = np.linalg.norm(pool(new), axis=-1) + 1e-6
mask = r > 1e-3
rel = float(np.sqrt((np.where(mask, d/r, 0.0)**2).sum()/mask.sum()))
bias = float((old.mean()-new.mean())/new.mean())
out = {"pooled_rel_rmse_old_vs_new_golden": round(rel,4), "mean_bias": round(bias,5)}
print("GOLDEN_DIFF", json.dumps(out))
json.dump(out, open('/tmp/golden_diff_r5.json','w'))
EOF

# 4. Convergence curves vs the fresh golden, one mode per process.
rm -f fixtures/convergence_r5.json
for mode in hashed_random blue_noise sobol_owen; do
  python -u scripts/convergence_study.py --max 4096 --mode $mode 2>&1 | tail -3
done

# 5. Headline hiz-vs-parity deviation artifact (512 frames, both kernels).
rm -f /tmp/quality_headline_hiz.npz /tmp/quality_headline_xla.npz
python -u scripts/quality_headline.py --frames 512 2>&1 | tail -3

echo CHAIN_DONE
