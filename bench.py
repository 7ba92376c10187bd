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


def _best_of(fn, reps=3):
    """Min wall-time over reps; fn must force a host fetch itself."""
    fn()  # warmup / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_full():
    """All BASELINE.json north-star configs; prints one line each to
    stderr. Every timing forces a host fetch (relay-safe methodology,
    see PERF.md)."""
    import jax.numpy as jnp

    import innr_tpu as it
    from innr_tpu.kernels import knn as kknn, packed_knn as kpacked

    rng = np.random.default_rng(0)
    out = {}

    # 1. batch_demo: 10K x 128d, 100 queries, top-2 (examples/batch_demo.rs)
    rows = jnp.asarray(rng.standard_normal((10_000, 128)).astype(np.float32))
    queries = jnp.asarray(rng.standard_normal((100, 128)).astype(np.float32))
    dt = _best_of(lambda: np.asarray(kknn.fused_knn_dot_batch(queries, rows, 2)[0]))
    out["batch_demo_10k_qps"] = 100 / dt

    # 2. MaxSim ColBERT: 32-token queries x 128-token docs at d=128,
    #    batched over 256 docs per launch.
    q_toks = jnp.asarray(rng.standard_normal((1, 32, 128)).astype(np.float32))
    docs = jnp.asarray(rng.standard_normal((256, 128, 128)).astype(np.float32))
    dt = _best_of(lambda: np.asarray(it.batch_maxsim(q_toks, docs)))
    out["maxsim_scored_docs_per_s"] = 256 / dt

    # 3. u8 asymmetric: 1M x 768d with precomputed query context.
    n_u8 = 1_000_000
    codes = jnp.asarray(rng.integers(0, 256, (n_u8, 768), dtype=np.uint8))
    params = it.QuantizationParams.from_range(-1.0, 1.0)
    qv = jnp.asarray(rng.standard_normal((1, 768)).astype(np.float32))
    dt = _best_of(lambda: np.asarray(kknn.fused_knn_u8_batch(qv, codes, 10)[0]))
    out["u8_1M_768d_evals_per_s"] = n_u8 / dt
    del codes  # free HBM before the next corpus

    # 4. binary + ternary coarse-then-rerank over 1M x 768d.
    n_b = 1_000_000
    corpus_f = rng.standard_normal((100, 768)).astype(np.float32)  # encode sample
    words_t = jnp.asarray(rng.integers(0, 2**32, (24, n_b), dtype=np.uint32))
    q_words = jnp.asarray(rng.integers(0, 2**32, 24, dtype=np.uint32))
    dt = _best_of(lambda: np.asarray(kpacked.fused_binary_knn(q_words, words_t, 40)[0]))
    out["binary_1M_768d_evals_per_s"] = n_b / dt

    pos_t = jnp.asarray(rng.integers(0, 2**32, (24, n_b), dtype=np.uint32))
    neg_t = jnp.asarray(np.zeros((24, n_b), dtype=np.uint32))
    qt = it.encode_ternary(corpus_f[0], 0.5)
    dt = _best_of(
        lambda: np.asarray(kpacked.fused_ternary_knn(qt.pos, qt.neg, pos_t, neg_t, 40)[0])
    )
    out["ternary_1M_768d_evals_per_s"] = n_b / dt
    del words_t, pos_t, neg_t

    # 5. slot-Hamming / MinHash over 10M 128-slot sketches (batched compare-
    #    reduce; 5 GB read as uint32).
    n_s = 10_000_000
    sketches = jnp.asarray(rng.integers(0, 2**31, (n_s, 128), dtype=np.uint32))
    q_sketch = jnp.asarray(rng.integers(0, 2**31, 128, dtype=np.uint32))
    import jax

    @jax.jit
    def slot_scan(q, s):
        return jnp.sum((s != q[None, :]).astype(jnp.int32), axis=1)

    dt = _best_of(lambda: np.asarray(slot_scan(q_sketch, sketches)[:8]))
    out["slot_hamming_10M_128slot_evals_per_s"] = n_s / dt
    del sketches

    # 6. matryoshka prefix kNN: 128d coarse over 1M x 768d corpus + 768d
    #    rerank of top-100.
    rows768 = jnp.asarray(rng.standard_normal((n_b, 768)).astype(np.float32) * 0.05)
    prefix = rows768[:, :128] * 1.0
    q768 = jnp.asarray(rng.standard_normal((1, 768)).astype(np.float32))

    def matryoshka():
        _, cand = kknn.fused_knn_dot_batch(q768[:, :128], prefix, 100)
        shortlist = rows768[cand[0]]
        fine = jnp.matmul(shortlist, q768[0], preferred_element_type=jnp.float32)
        return np.asarray(jax.lax.top_k(fine, 10)[1])

    dt = _best_of(matryoshka)
    out["matryoshka_coarse128_fine768_qps"] = 1 / dt

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
