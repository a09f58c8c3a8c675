#!/bin/bash
# Round-4 depth-rescoring study — the second half of VERDICT round-3
# "Next #1": instead of BLENDING the top-k codebook matches
# (run_tta_study.sh), EXPAND them into full 6D hypotheses and keep the one
# whose rendered depth best matches the observed depth
# (pose/rescore.py; tau = VSD_TAU = 20 mm). Unlike ICP this can jump out of
# a wrong cosine-argmax basin caused by clutter/occlusion.
#
# All arms are --skip_train re-evals of the SAME seeded clutter checkpoint
# (ws2) on the SAME seeded 3-instance 50-image scene set; baseline =
# scripts/quality_vsd_asym_clutter_inst3_icp_r4seed.json.
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
  echo "=== rescore-study arm: ${name} ==="
  python scripts/quality_eval_vsd.py --skip_train --instances 3 \
    --workspace "${WS}" "$@" \
    --out "scripts/quality_vsd_asym_clutter_inst3_${name}_r4.json"
}

# rescoring uses depth at test time, so ICP arms are the fair comparison
# (same input data); rs without ICP isolates the selection effect alone
run rs8_noicp       --topk_rescore 8
run icp_rs4    --icp --topk_rescore 4
run icp_rs8    --icp --topk_rescore 8
run icp_rs16   --icp --topk_rescore 16
run icp_rs8_tta5 --icp --topk_rescore 8 --tta_crops 5

echo "done — record in PERF.md (baseline: quality_vsd_asym_clutter_inst3_icp_r4seed.json)"
