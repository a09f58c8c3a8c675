#!/bin/bash
# Round-3 pending network-variant quality arms (VAE, BatchNorm), blocked at
# the end of the last session on a wedged TPU tunnel. Protocol matches the
# AUXILIARY_MASK study recorded in PERF.md ("Round 3: AUXILIARY_MASK study"):
#
#   1. fresh workspace per arm: full CLI train (30k) + embed (92k) + eval on
#      the arm's own freshly rendered 3-instance scenes (+ICP),
#   2. `_cmp` re-eval with --skip_train after swapping in the SHARED scene
#      set /tmp/aae_vsd_ws2/bopdata_inst3, so arms are compared on identical
#      test images (removes scene-sampling noise).
#
# Baselines to compare against (PERF.md table):
#   plain   12.26 deg / re recall 0.58  / vsd recall 0.380
#   clutter  7.03 deg / re recall 0.847 / vsd recall 0.513
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
  echo "TPU tunnel still wedged — aborting (re-run when the probe passes)."
  exit 1
fi

run_arm() {
  local name="$1" ws="$2"; shift 2
  echo "=== arm: ${name} (fresh train) ==="
  # both workspaces were PRE-STAGED on CPU while the tunnel was wedged
  # (cfg + rendered tmp_datasets cache + own bopdata_inst3 scenes), so do
  # NOT wipe them — the harness re-inits deterministically and reuses the
  # md5-keyed dataset cache; only train/embed/eval hit the TPU. Drop any
  # half-written checkpoints so ae_train cannot auto-resume a stale run.
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

run_arm vae /tmp/aae_vsd_vae --variational 1e-4
run_arm bn  /tmp/aae_vsd_bn  --batch_norm

# while the tunnel is demonstrably healthy, also record an in-session
# headline bench figure (min-of-5 + spread)
python bench.py | tee /tmp/bench_after_arms.json

echo "done — record both arms in PERF.md next to the AUXILIARY_MASK study"
