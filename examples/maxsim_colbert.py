"""ColBERT MaxSim late interaction: 32-token queries x docs at d=128,
demonstrating non-commutativity and the batched serving shape
(reference examples/maxsim_colbert.rs).

Run: python examples/maxsim_colbert.py
"""

import numpy as np

import innr_tpu as it


def main():
    rng = np.random.default_rng(13)
    d = 128
    query = rng.standard_normal((32, d)).astype(np.float32)
    docs = [
        rng.standard_normal((rng.integers(64, 128), d)).astype(np.float32)
        for _ in range(8)
    ]
    # Make doc 3 "relevant": inject query tokens.
    docs[3][:32] = query + 0.1 * rng.standard_normal((32, d)).astype(np.float32)

    scores = [float(it.maxsim(query, doc)) for doc in docs]
    best = int(np.argmax(scores))
    for i, s in enumerate(scores):
        marker = " <-- best" if i == best else ""
        print(f"doc {i}: maxsim = {s:9.2f}{marker}")
    assert best == 3, "the doc containing the query tokens must win"

    # Non-commutativity: maxsim(Q, D) != maxsim(D, Q).
    fwd = float(it.maxsim(query, docs[0]))
    bwd = float(it.maxsim(docs[0], query))
    print(f"maxsim(Q, D) = {fwd:.2f}, maxsim(D, Q) = {bwd:.2f} (not commutative)")
    assert abs(fwd - bwd) > 1e-3

    # Batched serving shape: all docs at once, padded to a fixed token count.
    t_max = max(doc.shape[0] for doc in docs)
    padded = np.zeros((len(docs), t_max, d), np.float32)
    for i, doc in enumerate(docs):
        padded[i, : doc.shape[0]] = doc
    batch_scores = np.asarray(it.batch_maxsim(query[None], padded))[0]
    # Zero-padded doc tokens can only add dot<=0 contributions to the max;
    # with random data max is positive, so padding is neutral here.
    assert int(np.argmax(batch_scores)) == 3
    print("OK: batched scores agree on the winner")


if __name__ == "__main__":
    main()
