"""Matryoshka two-stage search: coarse 128d prefix scan -> fine 768d rerank
(reference examples/matryoshka_search.rs:14-18).

Run: python examples/matryoshka_search.py
"""

import numpy as np

import innr_tpu as it


def main():
    rng = np.random.default_rng(11)
    n, d_full, d_prefix, k = 5_000, 768, 128, 10

    # Synthesize MRL-style embeddings: early dims carry more signal.
    decay = np.exp(-np.arange(d_full) / 200.0).astype(np.float32)
    corpus = (rng.standard_normal((n, d_full)) * decay).astype(np.float32)
    q = (rng.standard_normal(d_full) * decay).astype(np.float32)

    vb_full = it.VerticalBatch.from_rows(corpus)
    exact = it.batch_knn_dot(q, vb_full, k)

    # Stage 1: coarse scan over the 128d prefix (6x less compute/bandwidth).
    vb_coarse = it.VerticalBatch.from_rows(corpus[:, :d_prefix])
    coarse = it.batch_knn_dot(q[:d_prefix], vb_coarse, k * 4)

    # Stage 2: exact rerank of the shortlist at full dimension.
    shortlist = coarse.indices
    dots = corpus[shortlist].astype(np.float64) @ q.astype(np.float64)
    reranked = shortlist[np.argsort(-dots, kind="stable")][:k]

    recall = len(set(exact.indices.tolist()) & set(reranked.tolist())) / k
    print(f"two-stage recall@{k} (128d coarse -> 768d rerank): {recall:.0%}")

    # Single-pair prefix ops agree with slicing.
    a, b = corpus[0], corpus[1]
    assert abs(
        float(it.matryoshka_dot(a, b, d_prefix)) -
        float(it.dot(a[:d_prefix], b[:d_prefix]))
    ) < 1e-3
    assert recall >= 0.8, "MRL-decay embeddings should rerank well"
    print("OK")


if __name__ == "__main__":
    main()
