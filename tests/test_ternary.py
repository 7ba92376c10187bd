"""Ternary quantization (reference src/ternary.rs tests + padding regression)."""

import numpy as np
import pytest

import innr_tpu as it


def _tern(v, t):
    return np.where(v > t, 1, np.where(v < -t, -1, 0)).astype(np.int32)


class TestEncode:
    def test_threshold_bands(self):
        p = it.encode_ternary([0.8, -0.8, 0.1, -0.1, 0.5], 0.5)
        assert p.get(0) == 1 and p.get(1) == -1
        assert p.get(2) == 0 and p.get(3) == 0
        assert p.get(4) == 0  # 0.5 > 0.5 is false

    def test_padding_pairs_masked(self):
        # Regression (reference src/ternary.rs:344-356): full-word planes
        # must mask bits past `dimension`.
        ones = np.array([0xFFFFFFFF], np.uint32)
        zero = np.array([0], np.uint32)
        p = it.PackedTernary(ones, zero, 5)
        assert p.nnz() == 5

    def test_both_planes_set_rejected(self):
        ones = np.array([1], np.uint32)
        with pytest.raises(it.ContractError):
            it.PackedTernary(ones, ones, 3)

    def test_interleaved_u64_roundtrip(self, rng):
        v = rng.standard_normal(100).astype(np.float32)
        p = it.encode_ternary(v, 0.3)
        q = it.PackedTernary.from_interleaved_u64(p.to_interleaved_u64(), 100)
        assert p == q

    def test_set_get(self):
        p = it.PackedTernary.zeros(40)
        p2 = p.set(35, -1).set(2, 1)
        assert p2.get(35) == -1 and p2.get(2) == 1 and p2.get(3) == 0
        assert p2.set(35, 0).get(35) == 0


class TestOps:
    @pytest.mark.parametrize("dim", [1, 31, 32, 33, 65, 300, 768])
    def test_dot_differential(self, rng, dim):
        v = rng.standard_normal(dim).astype(np.float32)
        w = rng.standard_normal(dim).astype(np.float32)
        a, b = it.encode_ternary(v, 0.5), it.encode_ternary(w, 0.5)
        assert int(it.ternary_dot(a, b)) == int(_tern(v, 0.5) @ _tern(w, 0.5))

    def test_hamming_opposite_signs_only(self, rng):
        v = rng.standard_normal(200).astype(np.float32)
        w = rng.standard_normal(200).astype(np.float32)
        a, b = it.encode_ternary(v, 0.3), it.encode_ternary(w, 0.3)
        tv, tw = _tern(v, 0.3), _tern(w, 0.3)
        want = int(np.sum((tv != 0) & (tw != 0) & (tv != tw)))
        assert int(it.ternary_hamming(a, b)) == want

    def test_asymmetric_dot(self, rng):
        v = rng.standard_normal(150).astype(np.float32)
        q = rng.standard_normal(150).astype(np.float32)
        p = it.encode_ternary(v, 0.4)
        want = float(q.astype(np.float64) @ _tern(v, 0.4))
        assert float(it.asymmetric_dot(q, p)) == pytest.approx(want, abs=1e-4)

    def test_dimension_mismatch_raises(self):
        with pytest.raises(it.ContractError):
            it.ternary_dot(it.PackedTernary.zeros(32), it.PackedTernary.zeros(33))
        with pytest.raises(it.ContractError):
            it.asymmetric_dot(np.zeros(4, np.float32), it.PackedTernary.zeros(5))

    def test_sparsity(self, rng):
        v = rng.standard_normal(300).astype(np.float32)
        p = it.encode_ternary(v, 0.5)
        assert it.sparsity(p) == pytest.approx(float(np.mean(_tern(v, 0.5) == 0)))
        assert it.sparsity(it.PackedTernary.zeros(0)) == 0.0

    def test_memory_16x_compression(self):
        p = it.PackedTernary.zeros(768)
        assert p.memory_bytes() == 768 // 4  # 2 bits/value = 16x vs f32

    def test_to_values(self, rng):
        v = rng.standard_normal(77).astype(np.float32)
        p = it.encode_ternary(v, 0.2)
        np.testing.assert_array_equal(np.asarray(p.to_values()), _tern(v, 0.2))


class TestBatch:
    def test_batch_dot_matches_pairwise(self, rng):
        rows = rng.standard_normal((20, 96)).astype(np.float32)
        pos, neg = it.encode_ternary_batch(rows, 0.5)
        q = it.encode_ternary(rows[3], 0.5)
        got = np.asarray(it.batch_ternary_dot(q, pos, neg))
        for i in range(20):
            pi = it.encode_ternary(rows[i], 0.5)
            assert got[i] == int(it.ternary_dot(q, pi))

    def test_batch_asymmetric_matches_pairwise(self, rng):
        rows = rng.standard_normal((12, 64)).astype(np.float32)
        qf = rng.standard_normal(64).astype(np.float32)
        pos, neg = it.encode_ternary_batch(rows, 0.5)
        got = np.asarray(it.batch_asymmetric_dot(qf, pos, neg, 64))
        for i in range(12):
            want = float(it.asymmetric_dot(qf, it.encode_ternary(rows[i], 0.5)))
            assert got[i] == pytest.approx(want, abs=1e-4)
