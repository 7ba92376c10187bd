"""Scalar u8 quantization (reference src/scalar.rs tests)."""

import numpy as np
import pytest

import innr_tpu as it


class TestParams:
    def test_from_range(self):
        p = it.QuantizationParams.from_range(-1.0, 3.0)
        assert p.alpha == 4.0 and p.offset == -1.0

    def test_degenerate_range_alpha_one(self):
        p = it.QuantizationParams.from_range(2.0, 2.0)
        assert p.alpha == 1.0

    def test_fit(self):
        p = it.QuantizationParams.fit([0.5, -1.5, 2.5])
        assert p.alpha == pytest.approx(4.0) and p.offset == pytest.approx(-1.5)

    def test_fit_empty(self):
        p = it.QuantizationParams.fit([])
        assert p.alpha == 1.0 and p.offset == 0.0

    def test_fit_quantile_clips_outliers(self, rng):
        vals = rng.standard_normal(10000).astype(np.float32)
        vals[0] = 1000.0
        p = it.QuantizationParams.fit_quantile(vals, 0.99)
        assert p.alpha < 100.0  # the outlier is clipped

    def test_fit_quantile_one_equals_fit(self, rng):
        vals = rng.standard_normal(100).astype(np.float32)
        assert it.QuantizationParams.fit_quantile(vals, 1.0) == it.QuantizationParams.fit(vals)

    def test_fit_quantile_ignores_nonfinite(self):
        p = it.QuantizationParams.fit_quantile([np.inf, 1.0, 0.0, np.nan], 0.9)
        assert np.isfinite(p.alpha) and np.isfinite(p.offset)

    def test_fit_quantile_bad_arg(self):
        with pytest.raises(it.ContractError):
            it.QuantizationParams.fit_quantile([1.0], 0.0)

    def test_fit_vectors(self):
        p = it.QuantizationParams.fit_vectors([[0.0, 1.0], [-2.0, 0.5]])
        assert p.offset == -2.0 and p.alpha == 3.0


class TestQuantize:
    def test_roundtrip_error_bounded(self, rng):
        v = rng.standard_normal(256).astype(np.float32)
        params = it.QuantizationParams.fit(v)
        q = it.quantize_u8(v, params)
        deq = params.alpha * (np.asarray(q.data()).astype(np.float64) / 255.0) + params.offset
        assert np.max(np.abs(deq - v)) <= params.alpha / 255.0 / 2 + 1e-6

    def test_codes_clamped(self):
        params = it.QuantizationParams.from_range(0.0, 1.0)
        q = it.quantize_u8(np.array([-5.0, 0.5, 5.0], np.float32), params)
        codes = np.asarray(q.data())
        assert codes[0] == 0 and codes[2] == 255


class TestAsymmetric:
    def test_matches_dequantized_dot(self, rng):
        v = rng.standard_normal(300).astype(np.float32)
        q = rng.standard_normal(300).astype(np.float32)
        params = it.QuantizationParams.fit(v)
        qz = it.quantize_u8(v, params)
        deq = params.alpha * (np.asarray(qz.data()).astype(np.float64) / 255.0) + params.offset
        want = float(q.astype(np.float64) @ deq)
        assert float(it.asymmetric_dot_u8(q, qz, params)) == pytest.approx(want, rel=1e-4)

    def test_precomputed_matches(self, rng):
        v = rng.standard_normal(64).astype(np.float32)
        q = rng.standard_normal(64).astype(np.float32)
        params = it.QuantizationParams.fit(v)
        qz = it.quantize_u8(v, params)
        ctx = it.query_context(q)
        assert ctx.query_sum == pytest.approx(float(np.sum(q)), rel=1e-5)
        a = float(it.asymmetric_dot_u8(q, qz, params))
        b = float(it.asymmetric_dot_u8_precomputed(q, qz, params, ctx))
        assert a == pytest.approx(b, rel=1e-5)

    def test_mixed_dot(self, rng):
        a = rng.standard_normal(100).astype(np.float32)
        b = rng.integers(0, 256, 100).astype(np.uint8)
        want = float(a.astype(np.float64) @ b.astype(np.float64))
        assert float(it.mixed_dot_u8_f32(a, b)) == pytest.approx(want, rel=1e-5)

    def test_dimension_mismatch(self, rng):
        params = it.QuantizationParams.from_range(0.0, 1.0)
        qz = it.quantize_u8(np.zeros(8, np.float32), params)
        with pytest.raises(it.ContractError):
            it.asymmetric_dot_u8(np.zeros(9, np.float32), qz, params)


class TestBatchKnnU8:
    def test_ranking_matches_exact(self, rng):
        rows = rng.standard_normal((200, 64)).astype(np.float32)
        q = rng.standard_normal(64).astype(np.float32)
        params = it.QuantizationParams.fit(rows)
        batch = it.QuantizedU8Batch.quantize(rows, params)
        res = it.batch_knn_u8(q, batch, params, 5)
        assert len(res) == 5
        # Scores descending
        scores = [s for _, s in res]
        assert scores == sorted(scores, reverse=True)
        # Against per-vector asymmetric scoring
        all_scores = np.array([
            float(it.asymmetric_dot_u8(q, it.quantize_u8(rows[i], params), params))
            for i in range(200)
        ])
        want = np.argsort(-all_scores, kind="stable")[:5]
        got = [i for i, _ in res]
        # Quantized ties can swap adjacent ranks; require same candidate set
        assert set(got) == set(want.tolist())

    def test_accepts_list_of_quantized(self, rng):
        rows = rng.standard_normal((10, 16)).astype(np.float32)
        params = it.QuantizationParams.fit(rows)
        corpus = [it.quantize_u8(r, params) for r in rows]
        res = it.batch_knn_u8(rows[2], corpus, params, 3)
        assert res[0][0] == 2

    def test_empty_and_k0(self):
        params = it.QuantizationParams.from_range(0.0, 1.0)
        assert it.batch_knn_u8(np.zeros(4, np.float32), [], params, 3) == []

    def test_multi_query_matches_single(self, rng):
        """Mutation-sweep survivor regression: the multi-query u8 path's
        empty-guard polarity (``n == 0 or k == 0``) was not observable
        from this module's tests — a flipped guard silently returned
        empty results for every non-empty corpus."""
        from innr_tpu.ops.scalar import batch_knn_u8_multi

        rows = rng.standard_normal((150, 32)).astype(np.float32)
        qs = rng.standard_normal((3, 32)).astype(np.float32)
        params = it.QuantizationParams.fit(rows)
        corpus = it.QuantizedU8Batch.quantize(rows, params)
        vals, idx = batch_knn_u8_multi(qs, corpus, params, 4)
        assert np.asarray(idx).shape == (3, 4)
        for i in range(3):
            single = it.batch_knn_u8(qs[i], corpus, params, 4)
            assert [int(g) for g, _ in single] == list(np.asarray(idx)[i])
        # empty corpus / k=0 still yield (Q, 0)
        empty = it.QuantizedU8Batch.quantize(
            np.zeros((0, 32), np.float32), params
        )
        v0, i0 = batch_knn_u8_multi(qs, empty, params, 3)
        assert np.asarray(i0).shape == (3, 0)
        v1, i1 = batch_knn_u8_multi(qs, corpus, params, 0)
        assert np.asarray(i1).shape == (3, 0)

    def test_memory_4x(self, rng):
        rows = rng.standard_normal((10, 768)).astype(np.float32)
        params = it.QuantizationParams.fit(rows)
        batch = it.QuantizedU8Batch.quantize(rows, params)
        assert batch.memory_bytes() == rows.nbytes // 4


class TestBatchKnnU8ScoreContract:
    """Mutation-derived gap (scripts/mutation_check.py): the jnp-path
    batch_knn_u8 scores must carry the full affine correction, verified
    against asymmetric_dot_u8 on data with a nonzero offset."""

    def test_scores_equal_asymmetric_dot(self, rng):
        import innr_tpu as it

        rows = (rng.standard_normal((50, 16)) + 3.0).astype(np.float32)
        params = it.QuantizationParams.fit(rows)
        assert params.offset != 0.0
        corpus = it.QuantizedU8Batch.quantize(rows, params)
        q = rng.standard_normal(16).astype(np.float32)
        res = it.batch_knn_u8(q, corpus, params, 5)
        for i, score in res:
            want = float(
                it.asymmetric_dot_u8(
                    q, it.QuantizedU8(corpus.codes[i]), params
                )
            )
            np.testing.assert_allclose(score, want, rtol=1e-5, atol=1e-5)
