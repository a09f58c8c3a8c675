#!/bin/bash
# Round-4 frame-accurate-ICP study: does fixing the reference's centered
# synthetic-render geometry (pose/icp.py crop_offset path) recover the VSD
# recall that ICP loses on off-center instances? Arms are --skip_train
# re-evals of the seeded ws2 checkpoint on the seeded shared scene set;
# baselines: icp (quality_vsd_asym_clutter_inst3_icp_r4seed.json) and the
# rgb / agg8 / rs arms from run_tta_study.sh / run_rescore_study.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

WS=/tmp/aae_vsd_ws2

probe() {
  timeout 180 python -c "import jax, jax.numpy as jnp, numpy as np; \
print('TPU OK:', np.asarray(jnp.arange(8.)*2).sum())" 2>&1 | tail -1
}
echo "[probe] $(date -u +%H:%M:%S)"
probe | grep -q "TPU OK" || { echo "TPU wedged — abort"; exit 1; }

run() {
  local name="$1"; shift
  echo "=== icpframe-study arm: ${name} ==="
  python scripts/quality_eval_vsd.py --skip_train --instances 3 \
    --workspace "${WS}" "$@" \
    --out "scripts/quality_vsd_asym_clutter_inst3_${name}_r4.json"
}

run icp_frame          --icp --icp_frame
run icp_frame_agg8     --icp --icp_frame --topk_aggregate 8
run icp_frame_rs8      --icp --icp_frame --topk_rescore 8

echo "done — record in PERF.md next to the TTA and rescore studies"
