"""MinHash near-duplicate detection over a sketch corpus: shingle -> MinHash
sketch -> fused slot-kNN retrieval -> Jaccard verification.

The slot-Hamming primitives are the reference's MinHash comparison layer
(src/slot.rs:20-30 documents the estimator and its bias); this example runs
the full dedup workflow on top: build u32 MinHash sketches for a synthetic
document set with planted near-duplicates, retrieve candidates with the
fused slot-kNN scan (one corpus read for all queries via SketchCorpus),
estimate Jaccard from matching-slot fractions, and verify the estimates
against the true shingle-set Jaccard.

Run: python examples/minhash_dedup.py
"""

import numpy as np

import innr_tpu as it
from innr_tpu.loader import minhash_sketch_host


def shingle(tokens: np.ndarray, width: int = 3) -> set:
    """w-token shingles packed into ints (tokens are small ints here)."""
    if len(tokens) < width:
        return {int(t) for t in tokens}
    stacked = np.stack([tokens[i : len(tokens) - width + 1 + i] for i in range(width)])
    packed = (
        stacked[0].astype(np.uint64)
        | (stacked[1].astype(np.uint64) << np.uint64(20))
        | (stacked[2].astype(np.uint64) << np.uint64(40))
    )
    return set(packed.tolist())


def true_jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def main():
    rng = np.random.default_rng(11)
    n_docs, doc_len, num_slots = 3_000, 120, 128
    vocab = 50_000

    # Base documents + planted near-duplicates (small token edits).
    docs = [rng.integers(0, vocab, doc_len) for _ in range(n_docs)]
    dup_pairs = []
    for i in range(0, 60, 2):
        dup = docs[i].copy()
        n_edits = rng.integers(1, 8)
        dup[rng.choice(doc_len, n_edits, replace=False)] = rng.integers(
            0, vocab, n_edits
        )
        docs[i + 1] = dup
        dup_pairs.append((i, i + 1))

    shingle_sets = [shingle(d) for d in docs]
    # Native host encoder (pthread-parallel C, NumPy fallback identical):
    sketches = minhash_sketch_host(
        [np.fromiter(s, dtype=np.uint64, count=len(s)) for s in shingle_sets],
        num_slots,
    )
    print(f"{n_docs} docs -> {num_slots}-slot u32 sketches "
          f"({sketches.nbytes / 1e6:.1f} MB)")

    # Fused retrieval: every planted duplicate must surface as its
    # original's nearest non-self sketch.
    corpus = it.SketchCorpus(sketches)
    queries = sketches[[i for i, _ in dup_pairs]]
    sims, idx = it.minhash_knn_batch(queries, corpus, 2)
    sims, idx = np.asarray(sims), np.asarray(idx)

    found = 0
    est_errors = []
    for qi, (orig, dup) in enumerate(dup_pairs):
        assert idx[qi, 0] == orig and sims[qi, 0] == 1.0  # self-match first
        if idx[qi, 1] == dup:
            found += 1
            tj = true_jaccard(shingle_sets[orig], shingle_sets[dup])
            est_errors.append(abs(float(sims[qi, 1]) - tj))
    print(f"near-duplicate recall: {found}/{len(dup_pairs)}")
    assert found == len(dup_pairs), "planted near-duplicates must be found"

    # The MinHash estimator must track true Jaccard (128 slots -> se ~ 1/sqrt(128) ~ 0.09).
    mean_err = float(np.mean(est_errors))
    print(f"mean |estimated - true| Jaccard over duplicates: {mean_err:.3f}")
    assert mean_err < 0.1, mean_err

    # Unrelated docs score near zero.
    floor_sims, _ = it.minhash_knn(sketches[100], it.SketchCorpus(sketches[2000:]), 1)
    print(f"best unrelated similarity: {float(np.asarray(floor_sims)[0]):.3f}")
    assert float(np.asarray(floor_sims)[0]) < 0.25

    # Pairwise primitives agree with the corpus-scan results.
    o, d = dup_pairs[0]
    pair = float(np.asarray(it.minhash_jaccard(sketches[o], sketches[d])))
    scan = float(sims[0, 1]) if idx[0, 1] == d else None
    assert scan is not None and abs(pair - scan) < 1e-6
    print(f"pairwise == corpus-scan estimate: {pair:.3f}")
    print("minhash_dedup: all assertions passed")


if __name__ == "__main__":
    main()
