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

# recorded round-3 baselines on the SAME scene set (PERF.md AUXILIARY_MASK study)
BASELINES = [
    ("plain (default chain)", {"median_re_deg": 12.26, "re_recall@15deg": 0.58,
                               "vsd_recall@0.3": 0.380}),
    ("clutter p=0.5 (recipe)", {"median_re_deg": 7.03, "re_recall@15deg": 0.847,
                                "vsd_recall@0.3": 0.513}),
]

ARMS = [
    ("plain + VARIATIONAL 1e-4", "quality_vsd_asym_vae_inst3_icp_cmp.json"),
    ("plain + BATCH_NORMALIZATION", "quality_vsd_asym_bn_inst3_icp_cmp.json"),
]


def main() -> None:
    rows = list(BASELINES)
    for label, fname in ARMS:
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
