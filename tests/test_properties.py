"""Hypothesis property tests — the proptest analog
(reference tests/property_tests.rs, 500 cases/prop)."""

import numpy as np
from hypothesis import given, settings, strategies as st

import innr_tpu as it
from innr_tpu.ops import reference as ref
from conftest import cond_tol

SETTINGS = dict(max_examples=100, deadline=None)


def vec(min_dim=1, max_dim=129):
    return st.integers(min_dim, max_dim).flatmap(
        lambda n: st.lists(
            st.floats(-100.0, 100.0, width=32), min_size=n, max_size=n
        )
    )


def pair(min_dim=1, max_dim=129):
    return st.integers(min_dim, max_dim).flatmap(
        lambda n: st.tuples(
            st.lists(st.floats(-100.0, 100.0, width=32), min_size=n, max_size=n),
            st.lists(st.floats(-100.0, 100.0, width=32), min_size=n, max_size=n),
        )
    )


class TestDenseProperties:
    @settings(**SETTINGS)
    @given(pair())
    def test_dot_matches_reference(self, ab):
        a = np.asarray(ab[0], np.float32)
        b = np.asarray(ab[1], np.float32)
        got = float(it.dot(a, b))
        assert abs(got - ref.dot_portable(a, b)) <= cond_tol(a, b)

    @settings(**SETTINGS)
    @given(pair())
    def test_dot_commutative(self, ab):
        a = np.asarray(ab[0], np.float32)
        b = np.asarray(ab[1], np.float32)
        assert float(it.dot(a, b)) == float(it.dot(b, a))

    @settings(**SETTINGS)
    @given(pair())
    def test_cosine_bounded_or_guarded(self, ab):
        a = np.asarray(ab[0], np.float32)
        b = np.asarray(ab[1], np.float32)
        c = float(it.cosine(a, b))
        assert (-1.001 <= c <= 1.001) or c == 0.0

    @settings(**SETTINGS)
    @given(pair())
    def test_l2_symmetric_nonnegative(self, ab):
        a = np.asarray(ab[0], np.float32)
        b = np.asarray(ab[1], np.float32)
        d1 = float(it.l2_distance(a, b))
        d2 = float(it.l2_distance(b, a))
        assert d1 >= 0.0 and d1 == d2

    @settings(**SETTINGS)
    @given(vec())
    def test_self_distance_zero(self, v):
        v = np.asarray(v, np.float32)
        assert float(it.l2_distance_squared(v, v)) == 0.0
        assert float(it.l1_distance(v, v)) == 0.0

    @settings(**SETTINGS)
    @given(vec(min_dim=2))
    def test_normalize_unit_or_guarded(self, v):
        v = np.asarray(v, np.float32)
        out, n = it.normalize_with_norm(v)
        if float(n) > 1e-6:
            assert abs(float(it.norm(out)) - 1.0) < 1e-3


class TestBatchProperties:
    """Batch ops ≡ per-vector ops; kNN invariants
    (reference tests/property_tests.rs:364-466)."""

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 30), st.integers(1, 20), st.data())
    def test_batch_equals_per_vector(self, n, d, data):
        rows = np.asarray(
            data.draw(
                st.lists(
                    st.lists(st.floats(-50.0, 50.0, width=32), min_size=d, max_size=d),
                    min_size=n,
                    max_size=n,
                )
            ),
            np.float32,
        )
        q = np.asarray(
            data.draw(st.lists(st.floats(-50.0, 50.0, width=32), min_size=d, max_size=d)),
            np.float32,
        )
        vb = it.VerticalBatch.from_rows(rows)
        dots = np.asarray(it.batch_dot(q, vb))
        l2s = np.asarray(it.batch_l2_squared(q, vb))
        for i in range(n):
            assert abs(dots[i] - float(it.dot(q, rows[i]))) <= cond_tol(q, rows[i]) + 1e-4
            di = q - rows[i]
            assert abs(l2s[i] - float(it.l2_distance_squared(q, rows[i]))) <= cond_tol(di, di) + 1e-4

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 10), st.integers(1, 50), st.data())
    def test_knn_invariants(self, n, d, k, data):
        rows = np.asarray(
            data.draw(
                st.lists(
                    st.lists(st.floats(-50.0, 50.0, width=32), min_size=d, max_size=d),
                    min_size=n,
                    max_size=n,
                )
            ),
            np.float32,
        )
        q = rows[0]
        vb = it.VerticalBatch.from_rows(rows)
        res = it.batch_knn(q, vb, k)
        kk = min(k, n)
        assert len(res.indices) == kk
        # sorted ascending, unique indices
        assert all(res.scores[i] <= res.scores[i + 1] for i in range(kk - 1))
        assert len(set(res.indices.tolist())) == kk


class TestQuantizedProperties:
    @settings(**SETTINGS)
    @given(vec(min_dim=1, max_dim=200))
    def test_binary_roundtrip_bits(self, v):
        v = np.asarray(v, np.float32)
        # XLA flushes subnormals to zero (DAZ); a subnormal input may
        # legitimately encode as 0 — skip those positions.
        p = it.encode_binary(v, 0.0)
        for i in range(min(v.size, 40)):
            if 0.0 < abs(float(v[i])) < 1.2e-38:
                continue
            assert p.get(i) == bool(v[i] > 0.0)

    @settings(**SETTINGS)
    @given(vec(min_dim=1, max_dim=200), st.floats(0.0, 5.0))
    def test_ternary_dot_self_is_nnz(self, v, t):
        v = np.asarray(v, np.float32)
        p = it.encode_ternary(v, np.float32(t))
        assert int(it.ternary_dot(p, p)) == p.nnz()

    @settings(**SETTINGS)
    @given(vec(min_dim=1, max_dim=100))
    def test_quantize_within_half_step(self, v):
        v = np.asarray(v, np.float32)
        params = it.QuantizationParams.fit(v)
        q = it.quantize_u8(v, params)
        deq = params.alpha * (np.asarray(q.data()).astype(np.float64) / 255.0) + params.offset
        assert np.max(np.abs(deq - v)) <= params.alpha / 255.0 / 2 + 1e-5


class TestRound2Properties:
    """Properties for the round-2 surfaces: filtered pushdown and
    multi-query MaxSim retrieval."""

    @settings(max_examples=20, deadline=None)
    @given(st.integers(2, 40), st.integers(1, 12), st.integers(1, 20), st.data())
    def test_filtered_invariants(self, n, d, k, data):
        rows = np.asarray(
            data.draw(
                st.lists(
                    st.lists(st.floats(-50.0, 50.0, width=32), min_size=d, max_size=d),
                    min_size=n,
                    max_size=n,
                )
            ),
            np.float32,
        )
        mask = np.asarray(
            data.draw(st.lists(st.booleans(), min_size=n, max_size=n)), bool
        )
        vb = it.VerticalBatch.from_rows(rows)
        q = rows[0]
        res = it.batch_knn_filtered(q, vb, k, mask)
        num_passing = int(mask.sum())
        assert len(res.indices) == min(k, num_passing)
        assert mask[res.indices].all() if len(res.indices) else True
        # scores ascending, exact L2^2 of the selected rows
        for j, i in enumerate(res.indices):
            want = float(np.sum((rows[i].astype(np.float64) - q) ** 2))
            assert abs(res.scores[j] - want) <= 1e-3 + 1e-5 * abs(want)

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 4), st.integers(1, 3), st.data())
    def test_maxsim_batch_equals_pairwise(self, n, td, tq, data):
        d = data.draw(st.integers(1, 8))
        docs = np.asarray(
            data.draw(
                st.lists(
                    st.lists(
                        st.lists(st.floats(-10.0, 10.0, width=32), min_size=d, max_size=d),
                        min_size=td, max_size=td,
                    ),
                    min_size=n, max_size=n,
                )
            ),
            np.float32,
        )
        qs = np.asarray(
            data.draw(
                st.lists(
                    st.lists(
                        st.lists(st.floats(-10.0, 10.0, width=32), min_size=d, max_size=d),
                        min_size=tq, max_size=tq,
                    ),
                    min_size=2, max_size=2,
                )
            ),
            np.float32,
        )
        from innr_tpu.ops.maxsim import maxsim_knn_batch

        vals, idx = maxsim_knn_batch(qs, docs, min(3, n))
        for b in range(2):
            for j, i in enumerate(idx[b]):
                want = float(it.maxsim(qs[b], docs[int(i)]))
                assert abs(vals[b][j] - want) <= 1e-3 + 1e-4 * abs(want)


class TestSlotSparseRetrievalProperties:
    """Hypothesis properties for the round-2 retrieval families."""

    @given(st.integers(1, 40), st.integers(1, 24), st.integers(1, 10), st.data())
    @settings(max_examples=40, deadline=None)
    def test_slot_knn_matches_stable_argsort(self, n, s, k, data):
        sketches = np.asarray(
            data.draw(
                st.lists(
                    st.lists(st.integers(0, 7), min_size=s, max_size=s),
                    min_size=n, max_size=n,
                )
            ),
            dtype=np.uint32,
        )
        q = sketches[data.draw(st.integers(0, n - 1))]
        counts, idx = it.slot_knn_u32(q, it.SketchCorpus(sketches), k)
        ref_counts = np.sum(sketches != q[None, :], axis=1)
        want = np.argsort(ref_counts, kind="stable")[: min(k, n)]
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_array_equal(np.asarray(counts), ref_counts[want])

    @given(st.integers(1, 25), st.integers(0, 12), st.data())
    @settings(max_examples=40, deadline=None)
    def test_sparse_knn_matches_dense_scatter(self, n_docs, q_nnz, data):
        vocab = 64
        docs = []
        for _ in range(n_docs):
            nnz = data.draw(st.integers(1, 12))
            idx = np.sort(
                np.random.default_rng(data.draw(st.integers(0, 10**6)))
                .choice(vocab, nnz, replace=False)
            ).astype(np.uint32)
            val = np.asarray(
                data.draw(
                    st.lists(
                        st.floats(-8, 8, width=32), min_size=nnz, max_size=nnz
                    )
                ),
                np.float32,
            )
            docs.append((idx, val))
        if q_nnz == 0:
            q = (np.zeros(0, np.uint32), np.zeros(0, np.float32))
        else:
            qi = np.sort(
                np.random.default_rng(data.draw(st.integers(0, 10**6)))
                .choice(vocab, q_nnz, replace=False)
            ).astype(np.uint32)
            qv = np.asarray(
                data.draw(
                    st.lists(
                        st.floats(-8, 8, width=32), min_size=q_nnz,
                        max_size=q_nnz,
                    )
                ),
                np.float32,
            )
            q = (qi, qv)
        corpus = it.SparseCorpus(docs)
        scores, idx = it.sparse_knn(q, corpus, 5)
        dq = np.zeros(vocab, np.float64)
        if q[0].size:
            dq[q[0].astype(np.int64)] = q[1].astype(np.float64)
        ref_scores = np.empty(n_docs, np.float32)
        for di, (i_, v_) in enumerate(docs):
            dd = np.zeros(vocab, np.float64)
            dd[i_.astype(np.int64)] = v_.astype(np.float64)
            ref_scores[di] = np.float32(dd @ dq)
        want = np.argsort(-ref_scores, kind="stable")[: min(5, n_docs)]
        got = np.asarray(idx)
        # indices may differ only where scores tie exactly
        np.testing.assert_allclose(
            np.asarray(scores), ref_scores[want], rtol=1e-5, atol=1e-5
        )

    @given(st.integers(2, 16), st.integers(1, 6), st.data())
    @settings(max_examples=30, deadline=None)
    def test_minhash_knn_batch_rows_independent(self, n, n_q, data):
        s = 16
        sketches = np.asarray(
            data.draw(
                st.lists(
                    st.lists(st.integers(0, 3), min_size=s, max_size=s),
                    min_size=n, max_size=n,
                )
            ),
            dtype=np.uint32,
        )
        corpus = it.SketchCorpus(sketches)
        q_rows = [data.draw(st.integers(0, n - 1)) for _ in range(n_q)]
        qs = sketches[q_rows]
        sims_b, idx_b = it.minhash_knn_batch(qs, corpus, 3)
        for r in range(n_q):
            sims_1, idx_1 = it.minhash_knn(qs[r], corpus, 3)
            np.testing.assert_array_equal(
                np.asarray(idx_b)[r], np.asarray(idx_1)
            )
            np.testing.assert_allclose(
                np.asarray(sims_b)[r], np.asarray(sims_1)
            )
