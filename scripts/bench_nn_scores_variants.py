"""On-chip A/B of the Pallas NN kernel's score formulations (vpu vs mxu).

The batched-ICP loop body is one NN correspondence search per iteration
(ops/icp_nn.batched_nn_pallas). Round 5 reformulated the in-kernel score
computation from a K=4 dot_general (MXU pads K to 128 lanes and HIGHEST
costs ~6 passes — ~190x MAC overcommit) to 3 broadcasted multiply-adds on
the VPU in native f32. Honest protocol (PERF.md): device-resident inputs,
result VALUES materialized on host, interleaved arms, min of rounds.

    python scripts/bench_nn_scores_variants.py [--lanes 24] [--n 3000]
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=24)
    p.add_argument("--n", type=int, default=3000)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from augmentedautoencoder_tpu.ops.icp_nn import (
        batched_nn_pallas,
        batched_nn_xla,
    )

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(args.lanes, args.n, 3).astype(np.float32) * 60)
    dst = jnp.asarray(rng.randn(args.lanes, args.n, 3).astype(np.float32) * 60)

    arms = {
        "sweep": lambda: batched_nn_pallas(src, dst, scores="sweep"),
        "vpu": lambda: batched_nn_pallas(src, dst, scores="vpu"),
        "mxu": lambda: batched_nn_pallas(src, dst, scores="mxu"),
        "xla": lambda: batched_nn_xla(src, dst),
    }
    # correctness first: all arms must agree on indices
    ref = np.asarray(arms["xla"]()[1])
    for name in ("sweep", "vpu", "mxu"):
        got = np.asarray(arms[name]()[1])
        assert np.array_equal(got, ref), f"{name} indices diverge from xla"

    res = {}
    for _ in range(args.rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                d, i = fn()
            _ = np.asarray(d), np.asarray(i)  # materialize VALUES
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            res[name] = min(res.get(name, 1e18), dt)

    out = {
        "shape": [args.lanes, args.n, 3],
        "iters_per_arm": args.iters,
        "ms_per_call": {k: round(v, 3) for k, v in res.items()},
        "sweep_speedup_vs_mxu": round(res["mxu"] / res["sweep"], 2),
        "platform": jax.default_backend(),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        path = args.out if os.path.isabs(args.out) else os.path.join(REPO, args.out)
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
