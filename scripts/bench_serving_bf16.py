"""Interleaved A/B: f32 vs bf16 serving (encode + fused codebook top-1).

Protocol (PERF.md measurement discipline): the two variants alternate
round-robin in ONE process and each reports its best round (min-of-N
timing), so the ±15% VM clock drift and tunnel stalls hit both equally.
Every timed round materializes result VALUES on the host.

bf16 variant = encoder convs in bf16 (f32 latent head, the validated
training recipe) + bf16 codebook through the dtype-generic Pallas top-1
(f32 accumulation). Also reports the retrieval agreement between the two
variants on identical inputs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
N_BATCHES = 30
N_ROUNDS = 4
N_VIEWS = 92232
LATENT = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    from augmentedautoencoder_tpu.config import TrainConfig
    from augmentedautoencoder_tpu.models import AAE
    from augmentedautoencoder_tpu.ops import cosine_top1_pallas

    assert jax.default_backend() == "tpu", "A/B is only meaningful on the chip"

    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, N_BATCHES)
    xs = [jax.random.uniform(k, (BATCH, 128, 128, 3), jnp.float32) for k in keys]
    jax.block_until_ready(xs)

    cb32 = jax.random.normal(rng, (N_VIEWS, LATENT), jnp.float32)
    cb32 = cb32 / jnp.linalg.norm(cb32, axis=1, keepdims=True)
    cb16 = cb32.astype(jnp.bfloat16)
    jax.block_until_ready((cb32, cb16))

    def build(precision: str, codebook):
        cfg = TrainConfig()
        cfg.precision = precision
        model = AAE.from_config(cfg)
        variables = jax.jit(model.init)(rng, xs[0], xs[0])
        params = variables["params"]

        @jax.jit
        def step(params, x, codebook):
            z = model.apply({"params": params}, x, method=model.encode)
            return cosine_top1_pallas(z, codebook)

        _ = np.asarray(step(params, xs[0], codebook)[1])  # compile + fetch
        return params, step

    p32, step32 = build("float32", cb32)
    p16, step16 = build("bfloat16", cb16)

    def timed_round(params, step, codebook) -> float:
        t0 = time.perf_counter()
        pending = []
        for x in xs:
            _, idcs = step(params, x, codebook)
            idcs.copy_to_host_async()
            pending.append(idcs)
        out = [np.asarray(i) for i in pending]
        dt = time.perf_counter() - t0
        assert out[0].shape == (BATCH,)
        return BATCH * N_BATCHES / dt

    rates = {"f32": [], "bf16": []}
    for _ in range(N_ROUNDS):  # interleaved: drift hits both variants
        rates["f32"].append(timed_round(p32, step32, cb32))
        rates["bf16"].append(timed_round(p16, step16, cb16))

    # retrieval agreement on identical inputs (params differ per-variant
    # init; to isolate ranking, query the SAME z through both codebooks)
    z = jnp.asarray(np.random.RandomState(0).randn(BATCH, LATENT), jnp.float32)
    i32 = np.asarray(cosine_top1_pallas(z, cb32)[1])
    i16 = np.asarray(cosine_top1_pallas(z, cb16)[1])
    agree = float((i32 == i16).mean())

    out = {
        "f32_best": round(max(rates["f32"]), 1),
        "bf16_best": round(max(rates["bf16"]), 1),
        "speedup": round(max(rates["bf16"]) / max(rates["f32"]), 3),
        "f32_spread": round(1 - min(rates["f32"]) / max(rates["f32"]), 4),
        "bf16_spread": round(1 - min(rates["bf16"]) / max(rates["bf16"]), 4),
        "top1_agreement_same_z": agree,
        "unit": "crops/s",
        "rounds": N_ROUNDS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
