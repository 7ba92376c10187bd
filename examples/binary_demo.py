"""Binary quantization pipeline: encode -> coarse Hamming scan -> f32 rerank,
measuring recall@10 vs exact search (reference examples/binary_demo.rs:139+).

Run: python examples/binary_demo.py
"""

import numpy as np

import innr_tpu as it


def main():
    rng = np.random.default_rng(3)
    n, d, k, n_queries = 5_000, 256, 10, 20
    # Unit-normalized vectors (as real embedding models emit): binary sign
    # codes preserve angle, not magnitude, so normalization is what makes
    # the Hamming <-> cosine correspondence hold.
    # Clustered unit vectors (the regime real embeddings live in): true
    # neighbors are angularly close, which is what sign-bit codes preserve.
    # Pure-random corpora have near-uniform neighbor gaps that sign bits
    # cannot resolve — any binary quantizer scores near chance there.
    n_clusters = 250
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    corpus = centers[assign] + 0.4 * rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q_centers = centers[rng.choice(n_clusters, n_queries, replace=False)]
    queries = q_centers + 0.4 * rng.standard_normal((n_queries, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    packed = it.encode_binary_batch(corpus, 0.0)
    print(f"corpus: {n} x {d} f32 = {corpus.nbytes / 1e6:.1f} MB")
    print(f"packed: {n} x {d} bits = {np.asarray(packed).nbytes / 1e6:.2f} MB "
          f"({corpus.nbytes / np.asarray(packed).nbytes:.0f}x compression)")

    vb = it.VerticalBatch.from_rows(corpus)
    recall_coarse, recall_rerank = 0, 0
    rerank_factor = 4

    for q in queries:
        exact = set(it.batch_knn_dot(q, vb, k).indices.tolist())

        # Coarse: Hamming over packed bits.
        qp = it.encode_binary(q, 0.0)
        hamm = np.asarray(it.batch_binary_hamming(qp, packed))
        coarse = np.argsort(hamm, kind="stable")[: k * rerank_factor]
        recall_coarse += len(exact & set(coarse[:k].tolist())) / k

        # Rerank the coarse candidates with exact f32 dot.
        dots = corpus[coarse].astype(np.float64) @ q.astype(np.float64)
        reranked = coarse[np.argsort(-dots, kind="stable")][:k]
        recall_rerank += len(exact & set(reranked.tolist())) / k

    print(f"recall@{k} coarse (Hamming only):     {recall_coarse / n_queries:.2%}")
    print(f"recall@{k} with f32 rerank (x{rerank_factor}):  "
          f"{recall_rerank / n_queries:.2%}")
    assert recall_rerank >= recall_coarse, "rerank must not hurt recall"
    assert recall_rerank / n_queries > 0.3, "rerank recall sanity floor"
    print("OK")


if __name__ == "__main__":
    main()
