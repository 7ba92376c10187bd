"""Ternary quantization: compression, batch scan speed, and ranking accuracy
vs f32 (reference examples/ternary_demo.rs:290+).

Run: python examples/ternary_demo.py
"""

import time

import numpy as np

import innr_tpu as it


def main():
    rng = np.random.default_rng(5)
    n, d, k = 5_000, 256, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal(d).astype(np.float32)

    threshold = 0.4
    pos, neg = it.encode_ternary_batch(corpus, threshold)
    packed_bytes = np.asarray(pos).nbytes + np.asarray(neg).nbytes
    print(f"f32 corpus:    {corpus.nbytes / 1e6:.1f} MB")
    print(f"ternary packed: {packed_bytes / 1e6:.2f} MB "
          f"({corpus.nbytes / packed_bytes:.0f}x compression)")

    one = it.encode_ternary(corpus[0], threshold)
    print(f"sparsity at t={threshold}: {it.sparsity(one):.1%} zeros")

    # Symmetric ternary scan (coarse).
    tq = it.encode_ternary(q, threshold)
    t0 = time.perf_counter()
    coarse_scores = np.asarray(it.batch_ternary_dot(tq, pos, neg))
    t_tern = time.perf_counter() - t0

    # Asymmetric rerank: f32 query x ternary docs, top coarse candidates.
    coarse = np.argsort(-coarse_scores, kind="stable")[: k * 4]
    asym = np.asarray(it.batch_asymmetric_dot(q, pos, neg, d))
    reranked = coarse[np.argsort(-asym[coarse], kind="stable")][:k]

    # Exact f32 ranking for recall measurement.
    vb = it.VerticalBatch.from_rows(corpus)
    exact = set(it.batch_knn_dot(q, vb, k).indices.tolist())
    r_coarse = len(exact & set(coarse[:k].tolist())) / k
    r_rerank = len(exact & set(reranked.tolist())) / k
    print(f"recall@{k}: coarse={r_coarse:.0%}, asymmetric rerank={r_rerank:.0%}")
    print(f"ternary scan: {n / t_tern / 1e6:.1f}M evals/s (first call incl. compile)")

    # Dedup property: identical vectors have maximal ternary dot.
    same = int(it.ternary_dot(one, one))
    other = int(it.ternary_dot(one, it.encode_ternary(corpus[1], threshold)))
    assert same > other, "self-similarity must dominate"
    print("OK")


if __name__ == "__main__":
    main()
