"""Headline benchmark: crops/sec/chip for encode + codebook nearest-neighbor.

The BASELINE.json north-star metric: 128x128x3 crops through the full-size
AAE encoder (filters [128,256,512,512]) into the fused l2-normalize ->
92,232x128 codebook matmul -> argmax (Pallas kernel on TPU), per chip.

Methodology (kept honest against async-dispatch illusions):
  * distinct device-resident input batches (no host->device transfer in the
    timed loop, matching HBM-resident serving)
  * every result is materialized on the host; host copies are enqueued
    asynchronously and drained at the end (the production pipelining
    pattern), so device compute and result readback overlap
  * the reference executes one TF session.run per crop
    (auto_pose/ae/codebook.py:55-75)

`vs_baseline` compares against an estimated 500 crops/s for the reference
TF1-GPU path (no figure is committed in the repo — BASELINE.md); the rebuild
target is >= 10x on one v5e chip.

Measurement discipline (PERF.md): this VM's wall clock drifts up to ~15%
between runs, so a single timed loop is noise at the round-over-round
comparison scale. The loop therefore runs N_ROUNDS times and reports the
BEST round as `value` (min-of-N timing — the round least disturbed by
clock drift / tunnel stalls) plus `spread` = (max-min)/max across rounds.
Compare BENCH_r* files only through `value`, and treat deltas smaller than
`spread` as noise (BASELINE.md "How to read bench numbers").

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import re
import time

import numpy as np

BASELINE_CROPS_PER_SEC = 500.0  # estimated TF1-GPU reference throughput
BATCH = 256
N_BATCHES = 30
N_ROUNDS = 5  # min-of-N: report the best round, spread across rounds
N_VIEWS = 92232
LATENT = 128


def _backend_usable(timeout_s: float = 180.0) -> bool:
    """Probe the session's default jax backend in a DISPOSABLE subprocess.

    A wedged TPU tunnel makes backend init HANG (not raise) — the recorded
    MULTICHIP_r01/r02 failure mode. Probing in a child bounded by a timeout
    keeps this process from ever binding a dead tunnel, so the bench can
    fail loud with one honest JSON line instead of hanging the driver."""
    import subprocess
    import sys

    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "print('probe:', float(np.asarray((jnp.arange(8.0) * 2).sum())))"
    )
    try:
        p = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return p.returncode == 0 and "probe: 56.0" in p.stdout
    except Exception:
        return False


def _last_recorded(here: str | None = None) -> dict:
    """Newest committed BENCH_r*.json with a real figure, for the error line."""
    import glob
    import os

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))

    def round_no(p: str) -> int:
        # numeric round suffix, NOT lexicographic: "BENCH_r9.json" must not
        # beat "BENCH_r10.json" (and r99 must not beat r100)
        m = re.search(r"BENCH_r0*(\d+)\.json$", os.path.basename(p))
        return int(m.group(1)) if m else -1

    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), key=round_no)
    for path in reversed(paths):
        try:
            with open(path) as fh:
                rec = json.load(fh)
            # driver schema: the bench's own JSON line sits under "parsed"
            rec = rec.get("parsed", rec)
            if float(rec.get("value", 0.0)) > 0.0:
                return {"round": os.path.basename(path), "value": rec["value"]}
        except Exception:
            continue
    return {}


def main() -> None:
    if not _backend_usable():
        err = {
            "metric": "encode+codebook-NN crops/sec/chip",
            "value": 0.0,
            "unit": "crops/s",
            "vs_baseline": 0.0,
            "error": "backend unreachable (device probe timed out - "
                     "wedged TPU tunnel?); not a perf regression, "
                     "see PERF.md for the recorded figure",
        }
        last = _last_recorded()
        if last:
            err["last_good"] = last
        print(json.dumps(err))
        return

    import jax
    import jax.numpy as jnp

    from augmentedautoencoder_tpu.config import TrainConfig
    from augmentedautoencoder_tpu.models import AAE
    from augmentedautoencoder_tpu.ops import cosine_top1_pallas
    from augmentedautoencoder_tpu.ops.nn_query import cosine_similarity_topk

    cfg = TrainConfig()
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # recommended production serving recipe (PERF.md): bf16 convs +
        # bf16 codebook, f32 latent head and f32 cosine accumulation.
        # Interleaved A/B vs f32: +5% at 100% top-1 agreement
        # (scripts/bench_serving_bf16.py).
        cfg.precision = "bfloat16"
    model = AAE.from_config(cfg)

    rng = jax.random.PRNGKey(0)
    n_batches = N_BATCHES if on_tpu else 3

    keys = jax.random.split(rng, n_batches)
    xs = [jax.random.uniform(k, (BATCH, 128, 128, 3), jnp.float32) for k in keys]
    jax.block_until_ready(xs)

    variables = jax.jit(model.init)(rng, xs[0], xs[0])
    params = variables["params"]

    codebook = jax.random.normal(rng, (N_VIEWS, LATENT), jnp.float32)
    codebook = codebook / jnp.linalg.norm(codebook, axis=1, keepdims=True)
    if on_tpu:
        codebook = codebook.astype(jnp.bfloat16)
    jax.block_until_ready((codebook,))

    @jax.jit
    def encode_and_query(params, x, codebook):
        z = model.apply({"params": params}, x, method=model.encode)
        if on_tpu:
            return cosine_top1_pallas(z, codebook)
        vals, idcs = cosine_similarity_topk(z, codebook, 1)
        return vals[:, 0], idcs[:, 0]

    # warmup / compile, with a real value fetch
    _ = np.asarray(encode_and_query(params, xs[0], codebook)[1])

    def timed_round() -> float:
        t0 = time.perf_counter()
        pending = []
        for x in xs:
            _, idcs = encode_and_query(params, x, codebook)
            try:
                idcs.copy_to_host_async()
            except Exception:
                pass
            pending.append(idcs)
        results = [np.asarray(i) for i in pending]  # materialize every result
        dt = time.perf_counter() - t0
        assert len(results) == n_batches and results[0].shape == (BATCH,)
        return BATCH * n_batches / dt

    n_rounds = N_ROUNDS if on_tpu else 2
    rates = [timed_round() for _ in range(n_rounds)]
    best = max(rates)
    spread = (best - min(rates)) / best
    print(
        json.dumps(
            {
                "metric": "encode+codebook-NN crops/sec/chip",
                "value": round(best, 1),
                "unit": "crops/s",
                "vs_baseline": round(best / BASELINE_CROPS_PER_SEC, 2),
                "spread": round(spread, 4),
                "rounds": n_rounds,
            }
        )
    )


if __name__ == "__main__":
    main()
