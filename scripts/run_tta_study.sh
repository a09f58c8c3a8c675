#!/bin/bash
# Round-4 test-time-aggregation study (VERDICT round-3 "Next #1"): spend the
# TPU serving headroom (~35k crops/s vs ~10 needed per frame) on crowded-
# scene accuracy. All arms are --skip_train re-evals of the SAME clutter-
# trained checkpoint (ws2) on the SAME 3-instance 50-image scene set, so
# every delta is attributable to the estimation-time knob alone:
#
#   topk_aggregate k : blend the top-k codebook matches (quaternion +
#                      rendered-bbox averaging within 20 deg of top-1)
#   tta_crops n      : average cosine votes over n offset-jittered crops
#
# Baseline = the ws2 regen run itself (quality_vsd_asym_clutter_inst3_icp_r4seed
# for ICP; the rgb arm below re-evals RGB-only on the same scenes). Scene
# generation is now np.random-seeded end to end, so the shared set is
# reproducible even if /tmp is wiped again.
#
# ONE process may use the TPU at a time (PERF.md measurement discipline).
set -euo pipefail
cd "$(dirname "$0")/.."

WS=/tmp/aae_vsd_ws2

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; \
print('TPU OK:', np.asarray(jnp.arange(8.)*2).sum())" 2>&1 | tail -1
}
echo "[probe] $(date -u +%H:%M:%S)"
probe | grep -q "TPU OK" || { echo "TPU wedged — abort"; exit 1; }

run() {
  local name="$1"; shift
  echo "=== tta-study arm: ${name} ==="
  python scripts/quality_eval_vsd.py --skip_train --instances 3 \
    --workspace "${WS}" "$@" \
    --out "scripts/quality_vsd_asym_clutter_inst3_${name}_r4.json"
}

# RGB-only triplet (no ICP: the raw codebook-estimate effect)
run rgb
run rgb_agg8   --topk_aggregate 8
run rgb_tta5   --tta_crops 5

# ICP triplet + combinations (the headline regime)
run icp_agg4       --icp --topk_aggregate 4
run icp_agg8       --icp --topk_aggregate 8
run icp_agg32      --icp --topk_aggregate 32
run icp_tta5       --icp --tta_crops 5
run icp_tta9       --icp --tta_crops 9
run icp_agg8_tta5  --icp --topk_aggregate 8 --tta_crops 5

echo "done — record in PERF.md (baseline: quality_vsd_asym_clutter_inst3_icp_r4seed.json)"
