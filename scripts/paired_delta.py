"""Paired per-instance comparison of two eval runs on the SAME scene set.

The round-4 studies (PERF.md) compare `--skip_train` re-evals of one
checkpoint on one seeded scene set, so every estimate in arm A has an
exact counterpart in arm B (same image, same GT enumeration order). This
pairs them by (scene_id, im_id, position) from each run's `results.json`
and reports, per error metric: each arm's median, the median paired delta,
the win/loss count, and a two-sided sign-test p-value (exact binomial) —
the statistic that shows whether a median shift is a consistent
per-instance effect or a few outliers moving.

Usage: python scripts/paired_delta.py <baseline results.json> <arm results.json> [metric ...]
"""

from __future__ import annotations

import json
import math
import sys
from collections import defaultdict


def load(path: str) -> dict:
    by_key = defaultdict(list)
    for r in json.load(open(path)):
        by_key[(r["scene_id"], r["im_id"])].append(r["errors"])
    return by_key


def sign_test_p(wins: int, losses: int) -> float:
    """Exact two-sided binomial sign test (ties dropped)."""
    n = wins + losses
    if n == 0:
        return 1.0
    k = max(wins, losses)
    tail = sum(math.comb(n, i) for i in range(k, n + 1)) * 0.5**n
    return min(1.0, 2.0 * tail)


def main() -> None:
    base_p, arm_p = sys.argv[1], sys.argv[2]
    metrics = sys.argv[3:] or ["re", "vsd", "te", "add"]
    base, arm = load(base_p), load(arm_p)
    keys = sorted(set(base) & set(arm))
    if not keys:
        raise SystemExit("no common (scene, image) keys")
    out = {"baseline": base_p, "arm": arm_p, "n_images": len(keys), "metrics": {}}
    for m in metrics:
        deltas = []
        for k in keys:
            for eb, ea in zip(base[k], arm[k]):
                if m in eb and m in ea:
                    deltas.append(ea[m] - eb[m])
        if not deltas:
            continue
        deltas.sort()
        n = len(deltas)
        med = (deltas[n // 2] + deltas[(n - 1) // 2]) / 2.0
        wins = sum(d < 0 for d in deltas)  # arm strictly better (lower err)
        losses = sum(d > 0 for d in deltas)
        out["metrics"][m] = {
            "n_pairs": n,
            "median_delta": round(med, 4),
            "wins": wins,
            "losses": losses,
            "ties": n - wins - losses,
            "sign_test_p": round(sign_test_p(wins, losses), 6),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
