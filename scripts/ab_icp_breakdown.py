"""Interleaved A/B: round-4 vs round-5 ICP serving cost, one machine, one run.

VERDICT round-4 item 1's done-condition: a RECORDED interleaved A/B showing
the round-5 ICP fixes (f32 conditioning + real convergence rule,
`pose/icp.py`; PERF.md round-5 ICP sections) cut `bench_serving_breakdown
--icp frame` at 24 detections by >=2x, with quality separately reproduced
(`scripts/quality_vsd_asym_clutter_inst3_icp_frame_agg8_r5seed.json`).

Arms alternate A,B,A,B,... as subprocesses against the SAME trained
workspace and compile cache, so VM drift hits both equally:
  A = this checkout (round 5)
  B = a git worktree pinned at the round-4 snapshot (56fb4c9)

    python scripts/ab_icp_breakdown.py --workspace /tmp/aae_vsd_r5
        [--r4tree /tmp/aae_r4tree] [--rounds 3] [--icp frame]
        [--out scripts/bench_serving_breakdown_icp_frame_r5ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(tree: str, workspace: str, icp: str, out: str) -> dict:
    script = os.path.join(tree, "scripts", "bench_serving_breakdown.py")
    cmd = [
        sys.executable, script,
        "--workspace", workspace, "--icp", icp, "--out", out,
    ]
    subprocess.run(cmd, check=True, cwd=tree)
    with open(out) as fh:
        return json.load(fh)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workspace", default="/tmp/aae_vsd_r5")
    parser.add_argument("--r4tree", default="/tmp/aae_r4tree",
                        help="git worktree checked out at the round-4 "
                             "snapshot (git worktree add <dir> 56fb4c9)")
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--icp", default="frame", choices=["legacy", "frame"])
    parser.add_argument(
        "--out",
        default="scripts/bench_serving_breakdown_icp_frame_r5ab.json",
    )
    args = parser.parse_args()

    arms = {"r5": [], "r4": []}
    for rnd in range(args.rounds):
        for name, tree in (("r5", REPO), ("r4", args.r4tree)):
            res = run_arm(
                tree, args.workspace, args.icp,
                f"/tmp/ab_{name}_{rnd}.json",
            )
            arms[name].append(res)
            print(
                f"[round {rnd}] {name}: sync {res['sync_ms_per_frame']} ms, "
                f"icp stage {res['stage_ms_per_frame'].get('icp')} ms",
                flush=True,
            )

    def summarize(runs):
        return {
            "sync_ms_per_frame": [r["sync_ms_per_frame"] for r in runs],
            "pipelined_ms_per_frame": [
                r["pipelined_ms_per_frame"] for r in runs
            ],
            "icp_stage_ms": [
                r["stage_ms_per_frame"].get("icp") for r in runs
            ],
            "min_sync_ms": min(r["sync_ms_per_frame"] for r in runs),
            "min_pipelined_ms": min(
                r["pipelined_ms_per_frame"] for r in runs
            ),
        }

    s5, s4 = summarize(arms["r5"]), summarize(arms["r4"])
    out = {
        "protocol": (
            "interleaved subprocess arms (r5, r4) x rounds, same workspace/"
            "compile cache; each arm = bench_serving_breakdown.py --icp "
            f"{args.icp} (12 sync frames + pipelined min-of-3)"
        ),
        "r4_commit": "56fb4c9",
        "n_dets": arms["r5"][0]["dets_per_frame"],
        "icp_mode": args.icp,
        "r5": s5,
        "r4": s4,
        "speedup_sync": round(s4["min_sync_ms"] / s5["min_sync_ms"], 2),
        "speedup_pipelined": round(
            s4["min_pipelined_ms"] / s5["min_pipelined_ms"], 2
        ),
        "r5_full": arms["r5"],
        "r4_full": arms["r4"],
    }
    with open(os.path.join(REPO, args.out) if not os.path.isabs(args.out)
              else args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("speedup_sync", "speedup_pipelined")}, indent=1))


if __name__ == "__main__":
    main()
