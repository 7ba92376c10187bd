"""Sparse ops (reference src/sparse.rs + src/sparse_ext.rs)."""

import numpy as np
import pytest

import innr_tpu as it
from innr_tpu.ops import sparse_ext as se
from innr_tpu.ops.reference import sparse_dot_portable


class TestSparseDot:
    def test_docstring_case(self):
        got = it.sparse_dot([0, 2], [1.0, 2.0], [0, 3], [3.0, 4.0])
        assert float(got) == pytest.approx(3.0)

    def test_no_overlap(self):
        assert float(it.sparse_dot([0, 1], [1.0, 1.0], [2, 3], [1.0, 1.0])) == 0.0

    def test_empty(self):
        e = np.zeros(0, np.uint32)
        ev = np.zeros(0, np.float32)
        assert float(it.sparse_dot(e, ev, e, ev)) == 0.0

    def test_length_mismatch_raises(self):
        with pytest.raises(it.ContractError):
            it.sparse_dot([0, 1], [1.0], [0], [1.0])

    @pytest.mark.parametrize("trial", range(5))
    def test_differential_random(self, rng, trial):
        def make(nnz, dim=500):
            idx = np.sort(rng.choice(dim, nnz, replace=False)).astype(np.uint32)
            val = rng.standard_normal(nnz).astype(np.float32)
            return idx, val

        ai, av = make(rng.integers(1, 60))
        bi, bv = make(rng.integers(1, 60))
        got = float(it.sparse_dot(ai, av, bi, bv))
        want = sparse_dot_portable(ai, av, bi, bv)
        assert got == pytest.approx(want, abs=1e-4)

    def test_equals_densified(self, rng):
        # Sparse dot == dense dot of densified vectors
        # (reference tests/sparse_maxsim_props.rs:84).
        dim = 64
        ai = np.sort(rng.choice(dim, 10, replace=False)).astype(np.uint32)
        av = rng.standard_normal(10).astype(np.float32)
        bi = np.sort(rng.choice(dim, 12, replace=False)).astype(np.uint32)
        bv = rng.standard_normal(12).astype(np.float32)
        da = np.zeros(dim, np.float32)
        da[ai] = av
        db = np.zeros(dim, np.float32)
        db[bi] = bv
        assert float(it.sparse_dot(ai, av, bi, bv)) == pytest.approx(
            float(it.dot(da, db)), abs=1e-4
        )


class TestSparseMaxsim:
    def test_empty_is_zero(self):
        assert float(it.sparse_maxsim([], [([0], [1.0])])) == 0.0
        assert float(it.sparse_maxsim([([0], [1.0])], [])) == 0.0

    def test_single_pair(self):
        q = [(np.array([0, 2], np.uint32), np.array([1.0, 2.0], np.float32))]
        d = [(np.array([0], np.uint32), np.array([3.0], np.float32))]
        assert float(it.sparse_maxsim(q, d)) == pytest.approx(3.0)

    def test_max_over_docs(self):
        q = [([0], [1.0])]
        d = [([0], [2.0]), ([0], [5.0]), ([1], [100.0])]
        assert float(it.sparse_maxsim(q, d)) == pytest.approx(5.0)

    def test_matches_bruteforce(self, rng):
        def tok():
            nnz = int(rng.integers(1, 8))
            idx = np.sort(rng.choice(40, nnz, replace=False)).astype(np.uint32)
            return idx, rng.standard_normal(nnz).astype(np.float32)

        q = [tok() for _ in range(4)]
        d = [tok() for _ in range(6)]
        want = sum(
            max(sparse_dot_portable(qi, qv, di, dv) for di, dv in d)
            for qi, qv in q
        )
        assert float(it.sparse_maxsim(q, d)) == pytest.approx(want, abs=1e-4)


class TestSparseExt:
    def test_tuple_list_api(self):
        a = [(0, 1.0), (2, 2.0)]
        b = [(0, 3.0), (3, 4.0)]
        assert float(se.sparse_dot(a, b)) == pytest.approx(3.0)

    def test_sparse_dense_out_of_bounds_skipped(self):
        # Regression (reference src/sparse_ext.rs:190-202): unsorted input
        # with an out-of-bounds dim must be skipped, not crash.
        sparse = (np.array([10, 0], np.uint32), np.array([1.0, 2.0], np.float32))
        dense = np.array([3.0], np.float32)
        assert float(se.sparse_dense_dot(sparse, dense)) == 6.0

    def test_sparse_dense_unsorted_in_bounds(self):
        sparse = (np.array([3, 0], np.uint32), np.array([1.0, 2.0], np.float32))
        dense = np.array([1.0, 0.0, 0.0, 4.0], np.float32)
        assert float(se.sparse_dense_dot(sparse, dense)) == 6.0

    def test_norm_and_normalize(self):
        v = (np.array([0, 5], np.uint32), np.array([3.0, 4.0], np.float32))
        assert float(se.sparse_l2_norm(v)) == pytest.approx(5.0)
        _, nv = se.sparse_normalize(v)
        assert float(np.linalg.norm(np.asarray(nv))) == pytest.approx(1.0, rel=1e-6)

    def test_normalize_zero_unchanged(self):
        v = (np.array([0], np.uint32), np.array([0.0], np.float32))
        _, nv = se.sparse_normalize(v)
        assert float(nv[0]) == 0.0

    def test_top_k(self):
        v = (np.array([1, 5, 9], np.uint32), np.array([0.1, -5.0, 2.0], np.float32))
        idx, val = se.sparse_top_k(v, 2)
        assert idx.tolist() == [5, 9]  # by |w|, re-sorted by dim
        assert val.tolist() == [-5.0, 2.0]

    def test_top_k_small_passthrough(self):
        v = (np.array([1], np.uint32), np.array([1.0], np.float32))
        idx, val = se.sparse_top_k(v, 5)
        assert idx.tolist() == [1]

    def test_max_weight_folds_from_zero(self):
        # Reference folds from 0.0: all-negative vector reports 0.0
        # (src/sparse_ext.rs:183).
        v = (np.array([0, 1], np.uint32), np.array([-2.0, -1.0], np.float32))
        assert float(se.sparse_max_weight(v)) == 0.0


class TestSparseCorpus:
    """Corpus-scale sparse retrieval vs a scipy-free host oracle."""

    def _make_docs(self, rng, n, vocab=5000, max_nnz=24):
        docs = []
        for _ in range(n):
            nnz = int(rng.integers(1, max_nnz))
            idx = np.sort(rng.choice(vocab, nnz, replace=False)).astype(np.uint32)
            val = rng.standard_normal(nnz).astype(np.float32)
            docs.append((idx, val))
        return docs

    def _dense(self, pair, vocab=5000):
        d = np.zeros(vocab, np.float64)
        d[np.asarray(pair[0], dtype=np.int64)] = np.asarray(pair[1], np.float64)
        return d

    def test_knn_matches_dense_oracle(self, rng):
        docs = self._make_docs(rng, 300)
        corpus = it.SparseCorpus(docs)
        q = docs[17]
        scores, idx = it.sparse_knn(q, corpus, 7)
        dq = self._dense(q)
        ref = np.array([self._dense(d) @ dq for d in docs], np.float32)
        want = np.argsort(-ref, kind="stable")[:7]
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_allclose(np.asarray(scores), ref[want], rtol=1e-5, atol=1e-6)

    def test_knn_batch(self, rng):
        docs = self._make_docs(rng, 150)
        corpus = it.SparseCorpus(docs)
        queries = [docs[3], docs[60], docs[149]]
        scores, idx = it.sparse_knn_batch(queries, corpus, 4)
        assert np.asarray(scores).shape == (3, 4)
        for qi, q in enumerate(queries):
            s1, i1 = it.sparse_knn(q, corpus, 4)
            np.testing.assert_array_equal(np.asarray(idx)[qi], np.asarray(i1))
            np.testing.assert_allclose(
                np.asarray(scores)[qi], np.asarray(s1), rtol=1e-6
            )

    def test_container_and_edges(self, rng):
        docs = self._make_docs(rng, 10)
        corpus = it.SparseCorpus(docs)
        assert corpus.num_docs == 10
        assert corpus.memory_bytes() == corpus.indices.size * 8
        s, i = it.sparse_knn(docs[0], corpus, 0)
        assert len(np.asarray(i)) == 0
        s, i = it.sparse_knn(docs[0], corpus, 100)
        assert len(np.asarray(i)) == 10
        with pytest.raises(it.ContractError):
            it.sparse_knn((docs[0][0],), corpus, 3)  # not a pair
        with pytest.raises(it.ContractError):
            it.sparse_knn((docs[0][0], docs[0][1][:1]), corpus, 3)  # len mismatch
        # prepadded construction roundtrip
        corpus2 = it.SparseCorpus((corpus.indices, corpus.values))
        s2, i2 = it.sparse_knn(docs[0], corpus2, 3)
        s1, i1 = it.sparse_knn(docs[0], corpus, 3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_self_query_wins_on_positive_docs(self, rng):
        docs = self._make_docs(rng, 50)
        # positive values so the self dot strictly dominates is not
        # guaranteed in general; check self is top-1 for a planted doc
        # with large values
        big_idx = np.sort(rng.choice(5000, 10, replace=False)).astype(np.uint32)
        big = (big_idx, np.full(10, 10.0, np.float32))
        docs.append(big)
        corpus = it.SparseCorpus(docs)
        scores, idx = it.sparse_knn(big, corpus, 1)
        assert int(np.asarray(idx)[0]) == 50
        np.testing.assert_allclose(float(np.asarray(scores)[0]), 1000.0, rtol=1e-6)


class TestSparseMaxSimCorpus:
    """Corpus-scale sparse MaxSim vs the pairwise sparse_maxsim oracle."""

    def _doc(self, rng, n_tokens, vocab=300):
        doc = []
        for _ in range(n_tokens):
            nnz = int(rng.integers(1, 10))
            idx = np.sort(rng.choice(vocab, nnz, replace=False)).astype(np.uint32)
            doc.append((idx, rng.standard_normal(nnz).astype(np.float32)))
        return doc

    def test_batch_matches_pairwise(self, rng):
        docs = [self._doc(rng, int(rng.integers(1, 7))) for _ in range(25)]
        q = self._doc(rng, 4)
        scores = np.asarray(it.sparse_maxsim_batch(q, docs))
        for di, d in enumerate(docs):
            want = float(it.sparse_maxsim(q, d))
            np.testing.assert_allclose(scores[di], want, rtol=1e-5, atol=1e-6)

    def test_knn_and_planted_winner(self, rng):
        docs = [self._doc(rng, 3) for _ in range(30)]
        q = docs[13]  # self-similar doc must rank first
        scores, idx = it.sparse_maxsim_knn(q, docs, 5)
        assert int(np.asarray(idx)[0]) == 13
        ref = np.array(
            [float(it.sparse_maxsim(q, d)) for d in docs], np.float32
        )
        want = np.argsort(-ref, kind="stable")[:5]
        np.testing.assert_array_equal(np.asarray(idx), want)

    def test_empty_and_negative_contracts(self, rng):
        docs = [self._doc(rng, 2), [], self._doc(rng, 1)]
        q = self._doc(rng, 2)
        scores = np.asarray(it.sparse_maxsim_batch(q, docs))
        assert scores[1] == 0.0  # empty doc -> 0.0 (reference contract)
        # all-negative overlaps: padded doc tokens must NOT contribute a
        # winning 0.0 (the token mask excludes them from the max)
        neg_doc = [(np.array([1], np.uint32), np.array([-5.0], np.float32))]
        pos_q = [(np.array([1], np.uint32), np.array([1.0], np.float32))]
        two_tok = [
            (np.array([1], np.uint32), np.array([-5.0], np.float32)),
            (np.array([1], np.uint32), np.array([-7.0], np.float32)),
        ]
        s = np.asarray(it.sparse_maxsim_batch(pos_q, [neg_doc, two_tok]))
        # doc 0 has 1 token, doc 1 has 2 -> doc 0 pads to 2 tokens; its
        # score must stay -5.0 (not 0.0 from the pad token)
        np.testing.assert_allclose(s, [-5.0, -5.0])
        # empty query
        s2 = it.sparse_maxsim_batch([], docs)
        np.testing.assert_array_equal(np.asarray(s2), np.zeros(3, np.float32))
        sc, si = it.sparse_maxsim_knn(q, [], 3)
        assert len(np.asarray(si)) == 0

    def test_prepadded_triple(self, rng):
        docs = [self._doc(rng, 2) for _ in range(8)]
        triple = it.pad_sparse_docs(docs)
        s1 = np.asarray(it.sparse_maxsim_batch(docs[0], docs))
        s2 = np.asarray(it.sparse_maxsim_batch(docs[0], triple))
        np.testing.assert_allclose(s1, s2)


class TestSecondReviewRegressions:
    def test_empty_query_batch(self, rng):
        docs = [(np.array([1, 5], np.uint32), np.array([1.0, 2.0], np.float32))]
        corpus = it.SparseCorpus(docs)
        s, i = it.sparse_knn_batch([], corpus, 3)
        assert np.asarray(s).shape[0] == 0
        from innr_tpu.parallel import ShardedSparseCorpus

        sc = ShardedSparseCorpus(docs * 10)
        s, i = sc.knn_batch([], 3)
        assert np.asarray(s).shape[0] == 0

    def test_maxsim_1d_query_pair_lifted(self, rng):
        docs = [
            [(np.array([1, 5], np.uint32), np.array([1.0, 2.0], np.float32))],
            [(np.array([2], np.uint32), np.array([3.0], np.float32))],
        ]
        one_tok = (np.array([1, 5], np.uint32), np.array([1.0, 2.0], np.float32))
        s1 = np.asarray(it.sparse_maxsim_batch(one_tok, docs))
        s2 = np.asarray(it.sparse_maxsim_batch([one_tok], docs))
        np.testing.assert_allclose(s1, s2)
        with pytest.raises(it.ContractError):
            it.sparse_maxsim_batch(
                (np.array([1], np.uint32), np.array([1.0, 2.0], np.float32)), docs
            )

    def test_sharded_maxsim_empty_query_parity(self, rng):
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from innr_tpu.parallel import ShardedSparseMaxSimCorpus

        docs = [
            [(np.array([3], np.uint32), np.array([1.0], np.float32))]
            for _ in range(12)
        ]
        sc = ShardedSparseMaxSimCorpus(docs)
        v, i = sc.knn([], 3)
        wv, wi = it.sparse_maxsim_knn([], docs, 3)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(wi))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(wv))
