"""Measure the reference TF graph's encode+codebook-NN throughput on this
host's CPU — one ANCHORED baseline point to replace the estimated 500
crops/s GPU figure in BASELINE.md (VERDICT round-1 weak #5).

Reproduces the reference serving pattern exactly (auto_pose/ae/codebook.py:
50-75): cos_similarity = l2_normalize(encoder.z) @ embedding^T evaluated by
one session.run PER CROP (batch 1) at full dims (128x128x3, filters
[128,256,512,512], latent 128) against the 92,232-row codebook, plus a
batch-64 variant for the throughput ceiling. Weights are random — conv
timing is weight-independent.

Writes reference_cpu_baseline.json next to this script.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from _tf_refgraph import build_reference_graph, tf  # noqa: E402

H = W = 128
FILTERS = [128, 256, 512, 512]
STRIDES = [2, 2, 2, 2]
LATENT = 128
N_EMB = 92232


def main():
    tf.disable_eager_execution()
    rng = np.random.RandomState(0)

    graph = tf.Graph()
    with graph.as_default():
        x = tf.placeholder(tf.float32, [None, H, W, 3])
        z, _ = build_reference_graph(x, FILTERS, STRIDES, LATENT, H, W)
        emb = tf.constant(
            rng.randn(N_EMB, LATENT).astype(np.float32), dtype=tf.float32
        )
        q = tf.nn.l2_normalize(z, 1)
        cos = tf.matmul(q, emb, transpose_b=True)  # codebook.py:50

        sess = tf.Session(graph=graph)
        sess.run(tf.global_variables_initializer())

        crop1 = rng.rand(1, H, W, 3).astype(np.float32)
        crop64 = rng.rand(64, H, W, 3).astype(np.float32)

        # warmup
        for _ in range(3):
            sess.run(cos, {x: crop1})

        n1 = 30
        t0 = time.perf_counter()
        for _ in range(n1):
            out = sess.run(cos, {x: crop1})
            int(np.argmax(out, axis=1)[0])  # host argmax, codebook.py:64
        t_per_crop = (time.perf_counter() - t0) / n1

        sess.run(cos, {x: crop64})  # warmup batched
        nb = 5
        t0 = time.perf_counter()
        for _ in range(nb):
            out = sess.run(cos, {x: crop64})
            np.argmax(out, axis=1)
        t_per_batch = (time.perf_counter() - t0) / nb

        sess.close()

    result = {
        "host": "single-core CPU (TPU-host VM), TF " + tf.__version__,
        "graph": "reference encode + 92,232x128 cosine matmul + host argmax",
        "per_crop_serving": {
            "pattern": "one session.run per crop (reference codebook.py:55-75)",
            "ms_per_crop": round(t_per_crop * 1e3, 2),
            "crops_per_sec": round(1.0 / t_per_crop, 2),
        },
        "batch64_ceiling": {
            "ms_per_batch": round(t_per_batch * 1e3, 2),
            "crops_per_sec": round(64.0 / t_per_batch, 2),
        },
    }
    out_path = os.path.join(os.path.dirname(__file__), "reference_cpu_baseline.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
