"""Rank fidelity of binary quantization: Spearman correlation between
binary-Hamming ranking and exact f32 cosine ranking
(reference examples/binary_vs_rabitq.rs — the qualitative comparison;
the RaBitQ crate itself has no TPU port, so this measures our encoder
against the exact ranking the way that example does).

Run: python examples/binary_vs_rabitq.py
"""

import numpy as np

import innr_tpu as it


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    ra = np.argsort(np.argsort(a))
    rb = np.argsort(np.argsort(b))
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    return float((ra @ rb) / np.sqrt((ra @ ra) * (rb @ rb)))


def main():
    rng = np.random.default_rng(17)
    n, d = 2_000, 512
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal(d).astype(np.float32)
    q /= np.linalg.norm(q)

    exact = corpus.astype(np.float64) @ q.astype(np.float64)

    packed = it.encode_binary_batch(corpus, 0.0)
    qp = it.encode_binary(q, 0.0)
    hamm = np.asarray(it.batch_binary_hamming(qp, packed)).astype(np.float64)

    rho = spearman(exact, -hamm)  # low Hamming = high similarity
    print(f"Spearman rho (binary Hamming vs exact cosine), d={d}: {rho:.3f}")
    assert rho > 0.7, "binary ranking must correlate strongly at d=512"

    for d_small in (64, 128, 256):
        pk = it.encode_binary_batch(corpus[:, :d_small], 0.0)
        qk = it.encode_binary(q[:d_small], 0.0)
        hk = np.asarray(it.batch_binary_hamming(qk, pk)).astype(np.float64)
        print(f"  d={d_small}: rho = {spearman(exact, -hk):.3f}")
    print("OK: fidelity grows with dimension")


if __name__ == "__main__":
    main()
