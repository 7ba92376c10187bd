#!/usr/bin/env python
"""Headline benchmark: batch_knn_dot distance evals/s/chip.

Measures the fused Pallas streaming score+top-k scan (the flagship kernel)
over a large f32 corpus at d=128 — the BASELINE.json primary config — and
prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's published dot throughput on its bench hardware is
~17.3 Gelem/s at d=128 (Apple Silicon NEON, cache-resident, single core;
BASELINE.md), i.e. ~135.2M distance evals/s at d=128. ``vs_baseline`` is
our evals/s divided by that.

Run ``python bench.py --full`` for the complete suite (all BASELINE.json
configs); the default prints only the headline line for the driver.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Reference baseline: dot @ 128d = 7.92 ns/eval => 126.3M evals/s; the
# throughput plateau at large dims is 17.3 Gelem/s => 135.2M evals/s at 128d.
# Use the measured 128d point (BASELINE.md: dot, 128d = 7.92 ns).
BASELINE_EVALS_PER_S = 1.0 / 7.92e-9 / 1.0  # 126.26M evals/s at d=128


def _sync(x):
    import jax

    jax.block_until_ready(x)
    return x


def bench_knn_dot(n=1_000_000, d=128, k=10, queries=32, repeats=5):
    """Fused multi-query kNN-dot scan over an (n, d) corpus.

    One kernel launch scores all ``queries`` queries against the corpus
    (one corpus HBM read shared by the batch), so per-dispatch latency is
    amortized. Timing forces a host fetch of the results each repeat, so
    asynchronous dispatch cannot flatter the number. Returns evals/s/chip.
    """
    import jax.numpy as jnp

    from innr_tpu.kernels import knn as kknn

    rng = np.random.default_rng(42)
    rows = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    qs = jnp.asarray(rng.standard_normal((queries, d)).astype(np.float32))
    _sync(rows)

    # Warmup / compile (+ result fetch).
    np.asarray(kknn.fused_knn_dot_batch(qs, rows, k)[0])

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        vals, idx = kknn.fused_knn_dot_batch(qs, rows, k)
        np.asarray(vals)  # force real bytes to the host
        dt = (time.perf_counter() - t0) / queries
        best = min(best, dt)
    return n / best, best


def bench_full():
    """All BASELINE.json configs; prints one human line each."""
    import jax.numpy as jnp

    import innr_tpu as it

    rng = np.random.default_rng(0)
    out = {}

    # batch_demo: 10K x 128d, 100 queries, top-2 (examples/batch_demo.rs)
    rows = rng.standard_normal((10_000, 128)).astype(np.float32)
    vb = it.VerticalBatch.from_rows(rows)
    queries = rng.standard_normal((100, 128)).astype(np.float32)
    it.batch_knn_dot(queries[0], vb, 2)  # warmup
    t0 = time.perf_counter()
    for q in queries:
        r = it.batch_knn_dot(q, vb, 2)
    dt = time.perf_counter() - t0
    out["batch_demo_qps"] = 100 / dt

    # MaxSim ColBERT 32x128 tokens at d=128
    q_toks = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    d_toks = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    _sync(it.maxsim(q_toks, d_toks))
    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        s = it.maxsim(q_toks, d_toks)
    _sync(s)
    out["maxsim_qps"] = iters / (time.perf_counter() - t0)

    # u8 asymmetric over 1M x 768d with precomputed query context
    n_u8 = 1_000_000
    codes = rng.integers(0, 256, (n_u8, 768), dtype=np.uint8)
    params = it.QuantizationParams.from_range(-1.0, 1.0)
    batch = it.QuantizedU8Batch(codes)
    qv = rng.standard_normal(768).astype(np.float32)
    it.batch_knn_u8(qv, batch, params, 10)  # warmup
    t0 = time.perf_counter()
    it.batch_knn_u8(qv, batch, params, 10)
    out["u8_1M_768d_evals_per_s"] = n_u8 / (time.perf_counter() - t0)

    # binary hamming scan 1M x 768 bits
    words = rng.integers(0, 2**32, (n_u8, 24), dtype=np.uint32)
    qw = jnp.asarray(words[0])
    wj = jnp.asarray(words)
    _sync(it.batch_binary_hamming(qw, wj))
    t0 = time.perf_counter()
    _sync(it.batch_binary_hamming(qw, wj))
    out["binary_1M_768d_evals_per_s"] = n_u8 / (time.perf_counter() - t0)

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    evals_per_s, latency = bench_knn_dot(n=args.n)
    if args.full:
        extra = bench_full()
        for k, v in sorted(extra.items()):
            print(f"# {k}: {v:,.1f}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "batch_knn_dot_evals_per_s_d128",
                "value": round(evals_per_s),
                "unit": "distance evals/s/chip (1M x 128d f32 corpus, k=10)",
                "vs_baseline": round(evals_per_s / BASELINE_EVALS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
