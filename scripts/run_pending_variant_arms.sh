#!/bin/bash
# Network-variant quality arms (VAE, BatchNorm) + the fresh PLAIN baseline.
# Protocol matches the round-3 AUXILIARY_MASK study recorded in PERF.md:
#
#   1. fresh workspace per arm: full CLI train (30k) + embed (92k) + eval on
#      the arm's own freshly rendered 3-instance scenes (+ICP),
#   2. `_cmp` re-eval with --skip_train after swapping in the SHARED scene
#      set /tmp/aae_vsd_ws2/bopdata_inst3, so arms are compared on identical
#      test images (removes scene-sampling noise).
#
# Round-4 note: /tmp was wiped between sessions and scene lighting draws
# from the global RNG (renderer/facade.py:_sample_light), so the shared
# scene set is NEW — the round-3 baselines (plain 12.26/0.58/0.380, clutter
# 7.03/0.847/0.513) are directional context only. This script therefore
# re-measures the PLAIN baseline on the new shared set; the clutter
# baseline comes from the ws2 regen itself
# (scripts/quality_vsd_asym_clutter_inst3_icp_r4seed.json — scene gen is
# now seeded, so this set is reproducible across /tmp wipes).
#
# Reference variants being measured: VARIATIONAL (encoder.py:70-94 KL head)
# and BATCH_NORMALIZATION (encoder.py:45-56) — both OFF in the reference's
# shipped exp_group/cfg defaults, so the hypothesis is parity-or-worse.
#
# ONE process may use the TPU at a time: run this alone, never concurrently
# with bench.py / other training (see PERF.md measurement discipline).
set -euo pipefail
cd "$(dirname "$0")/.."

SHARED=/tmp/aae_vsd_ws2/bopdata_inst3

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; \
print('TPU OK:', np.asarray(jnp.arange(8.)*2).sum())" 2>&1 | tail -1
}

echo "[probe] $(date -u +%H:%M:%S)"
if ! probe | grep -q "TPU OK"; then
  echo "TPU tunnel wedged — aborting (re-run when the probe passes)."
  exit 1
fi
test -f "${SHARED}/test/000001/scene_gt.json" || {
  echo "shared scene set missing — regen ws2 first (quality_eval_vsd.py --clutter 0.5 --instances 3 --icp --workspace /tmp/aae_vsd_ws2)"
  exit 1
}

run_arm() {
  local name="$1" ws="$2"; shift 2
  echo "=== arm: ${name} (fresh train) ==="
  # drop any half-written checkpoints so ae_train cannot auto-resume a
  # stale run; the md5-keyed dataset cache (if present) is reused
  rm -rf "${ws}/experiments"
  python scripts/quality_eval_vsd.py "$@" --instances 3 --icp \
    --workspace "${ws}" \
    --out "scripts/quality_vsd_asym_${name}_inst3_icp.json"
  echo "=== arm: ${name} (_cmp re-eval on shared scene set) ==="
  rm -rf "${ws}/bopdata_inst3"
  cp -r "${SHARED}" "${ws}/bopdata_inst3"
  python scripts/quality_eval_vsd.py --skip_train --instances 3 --icp \
    --workspace "${ws}" \
    --out "scripts/quality_vsd_asym_${name}_inst3_icp_cmp.json"
}

run_arm plain_r4 /tmp/aae_vsd_plain
run_arm vae /tmp/aae_vsd_vae --variational 1e-4
run_arm bn  /tmp/aae_vsd_bn  --batch_norm

# while the tunnel is demonstrably healthy, also record an in-session
# headline bench figure (min-of-5 + spread)
python bench.py | tee /tmp/bench_after_arms.json

echo "done — record all arms in PERF.md next to the AUXILIARY_MASK study"
