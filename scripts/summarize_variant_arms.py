"""Format the network-variant quality-arm comparison table for PERF.md.

Reads the `_cmp` artifacts (shared 3-instance scene set, f32, ICP) produced
by scripts/run_pending_variant_arms.sh next to the recorded plain/clutter
baselines, and prints the markdown table + verdict scaffold.

Usage: python scripts/summarize_variant_arms.py
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

# round-4 baselines, measured on the SAME seeded shared scene set the _cmp
# arms re-eval on (the round-3 numbers lived on a scene set /tmp wipes
# destroyed; scene gen is seeded now, so these stay valid across sessions)
BASELINES = [
    ("plain (default chain)", "quality_vsd_asym_plain_r4_inst3_icp_cmp.json"),
    ("clutter p=0.5 (recipe)", "quality_vsd_asym_clutter_inst3_icp_r4seed.json"),
]

ARMS = [
    ("plain + VARIATIONAL 1e-4", "quality_vsd_asym_vae_inst3_icp_cmp.json"),
    ("plain + BATCH_NORMALIZATION", "quality_vsd_asym_bn_inst3_icp_cmp.json"),
]


def main() -> None:
    rows = []
    for label, fname in BASELINES + ARMS:
        path = os.path.join(HERE, fname)
        if not os.path.exists(path):
            print(f"(missing: {fname} — run scripts/run_pending_variant_arms.sh)")
            continue
        with open(path) as fh:
            rows.append((label, json.load(fh)))
    print("| train recipe | 3-inst median re (ICP) | re recall@15 | vsd recall@0.3 |")
    print("|---|---|---|---|")
    for label, r in rows:
        print(
            f"| {label} | {r['median_re_deg']:.2f} deg "
            f"| {r['re_recall@15deg']:.3g} | {r['vsd_recall@0.3']:.3g} |"
        )


if __name__ == "__main__":
    main()
