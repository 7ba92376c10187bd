"""Binary quantization (reference src/binary.rs tests + padding regression)."""

import numpy as np
import pytest

import innr_tpu as it


class TestEncode:
    def test_strict_threshold(self):
        p = it.encode_binary([0.5, -0.1, 0.9, 0.0], 0.0)
        assert p.get(0) and not p.get(1) and p.get(2)
        assert not p.get(3)  # 0.0 > 0.0 is false: strictly greater

    def test_dimension(self):
        assert it.encode_binary(np.zeros(100, np.float32), 0.0).dimension == 100

    def test_padding_bits_masked(self):
        # Regression (reference src/binary.rs:217-225): ops popcount whole
        # words; padding past `dimension` must be zero.
        words = np.array([0xFFFFFFFF], np.uint32)
        p = it.PackedBinary(words, 5)
        assert p.count_ones() == 5

    def test_u64_roundtrip(self):
        v = np.random.default_rng(0).standard_normal(130).astype(np.float32)
        p = it.encode_binary(v, 0.0)
        q = it.PackedBinary.from_u64(p.data_u64(), 130)
        assert p == q


class TestOps:
    def test_hamming_docstring_case(self):
        a = it.encode_binary([1.0, -1.0, 1.0, -1.0], 0.0)
        b = it.encode_binary([1.0, 1.0, -1.0, -1.0], 0.0)
        assert int(it.binary_hamming(a, b)) == 2

    def test_dot_docstring_case(self):
        a = it.encode_binary([1.0, -1.0, 1.0, -1.0], 0.0)
        b = it.encode_binary([1.0, 1.0, -1.0, -1.0], 0.0)
        assert int(it.binary_dot(a, b)) == 1

    def test_jaccard_docstring_case(self):
        a = it.encode_binary([1.0, -1.0, 1.0, -1.0], 0.0)
        b = it.encode_binary([1.0, 1.0, -1.0, -1.0], 0.0)
        assert float(it.binary_jaccard(a, b)) == pytest.approx(1.0 / 3.0, abs=1e-6)

    def test_jaccard_empty_union_is_one(self):
        a = it.PackedBinary.zeros(64)
        assert float(it.binary_jaccard(a, a)) == 1.0

    def test_dimension_mismatch_raises(self):
        a = it.PackedBinary.zeros(64)
        b = it.PackedBinary.zeros(65)
        with pytest.raises(it.ContractError):
            it.binary_hamming(a, b)

    @pytest.mark.parametrize("dim", [1, 31, 32, 33, 63, 64, 65, 300, 768])
    def test_differential_vs_numpy(self, rng, dim):
        v = rng.standard_normal(dim).astype(np.float32)
        w = rng.standard_normal(dim).astype(np.float32)
        a, b = it.encode_binary(v, 0.0), it.encode_binary(w, 0.0)
        va, vb = v > 0, w > 0
        assert int(it.binary_hamming(a, b)) == int(np.sum(va != vb))
        assert int(it.binary_dot(a, b)) == int(np.sum(va & vb))

    def test_set_get_functional(self):
        p = it.PackedBinary.zeros(40)
        p2 = p.set(33, True)
        assert not p.get(33) and p2.get(33)
        assert p2.set(33, False).get(33) is False
        # out-of-range ignored
        assert p.set(100, True) is p

    def test_memory_bytes(self):
        assert it.PackedBinary.zeros(768).memory_bytes() == 768 // 8


class TestBatch:
    def test_batch_encode_matches_single(self, rng):
        rows = rng.standard_normal((10, 70)).astype(np.float32)
        packed = np.asarray(it.encode_binary_batch(rows, 0.0))
        for i in range(10):
            np.testing.assert_array_equal(
                packed[i], np.asarray(it.encode_binary(rows[i], 0.0).words)
            )

    def test_batch_hamming_matches_pairwise(self, rng):
        rows = rng.standard_normal((20, 128)).astype(np.float32)
        packed = it.encode_binary_batch(rows, 0.0)
        q = it.encode_binary(rows[3], 0.0)
        got = np.asarray(it.batch_binary_hamming(q, packed))
        for i in range(20):
            pi = it.encode_binary(rows[i], 0.0)
            assert got[i] == int(it.binary_hamming(q, pi))
