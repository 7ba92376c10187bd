"""Slot Hamming / MinHash (reference src/slot.rs). Integer ops: EXACT
equality, never tolerance (reference fuzz/slot_diff.rs)."""

import numpy as np
import pytest

import innr_tpu as it
from innr_tpu.ops.reference import (
    slot_compare_counts_portable,
    slot_hamming_portable,
)


class TestSlotHamming:
    def test_docstring_case(self):
        assert int(it.slot_hamming_u32([1, 2, 3, 4], [1, 0, 3, 9])) == 2

    @pytest.mark.parametrize("n", [1, 2, 3, 7, 8, 9, 15, 16, 17, 31, 32, 64, 257])
    def test_u32_differential(self, rng, n):
        a = rng.integers(0, 4, n).astype(np.uint32)
        b = rng.integers(0, 4, n).astype(np.uint32)
        assert int(it.slot_hamming_u32(a, b)) == slot_hamming_portable(a, b)

    @pytest.mark.parametrize("n", [1, 4, 8, 16, 100, 257])
    def test_u16_differential(self, rng, n):
        a = rng.integers(0, 1 << 16, n).astype(np.uint16)
        b = rng.integers(0, 1 << 16, n).astype(np.uint16)
        assert int(it.slot_hamming_u16(a, b)) == slot_hamming_portable(a, b)

    @pytest.mark.parametrize("n", [1, 4, 8, 100, 257])
    def test_u64_differential(self, rng, n):
        a = rng.integers(0, 2**63, n, dtype=np.uint64)
        b = a.copy()
        flip = rng.random(n) < 0.4
        b[flip] ^= np.uint64(1) << rng.integers(0, 64, n, dtype=np.uint64)[flip]
        assert int(it.slot_hamming_u64(a, b)) == slot_hamming_portable(a, b)

    def test_u64_differs_only_in_high_half(self):
        a = np.array([0x0000000100000000], np.uint64)
        b = np.array([0x0000000200000000], np.uint64)
        assert int(it.slot_hamming_u64(a, b)) == 1

    def test_length_mismatch_raises(self):
        with pytest.raises(it.ContractError):
            it.slot_hamming_u32(np.zeros(3, np.uint32), np.zeros(4, np.uint32))

    def test_generic_min_length_no_raise(self):
        # Generic slot_hamming compares over min length, no panic
        # (reference src/slot.rs:266).
        assert it.slot_hamming([1, 2, 3], [1, 9]) == 1

    def test_empty(self):
        z = np.zeros(0, np.uint32)
        assert int(it.slot_hamming_u32(z, z)) == 0


class TestSlotCompareCounts:
    def test_docstring_case(self):
        a = np.array([3, 1, 4, 1, 5], np.uint16)
        b = np.array([3, 1, 2, 9, 5], np.uint16)
        c = it.slot_compare_counts(a, b)
        assert (c.eq, c.lt, c.gt) == (3, 1, 1)

    @pytest.mark.parametrize("dtype", [np.uint16, np.uint32, np.uint64])
    def test_differential(self, rng, dtype):
        hi = min(int(np.iinfo(dtype).max), 2**63 - 1)
        a = rng.integers(0, hi, 100, dtype=np.int64).astype(dtype)
        b = rng.integers(0, hi, 100, dtype=np.int64).astype(dtype)
        if dtype == np.uint64:
            # Exercise the high-half comparison path explicitly.
            a = (a << np.uint64(1)) | np.uint64(1)
            b = b << np.uint64(1)
        c = it.slot_compare_counts(a, b)
        assert (c.eq, c.lt, c.gt) == slot_compare_counts_portable(a, b)
        assert c.eq + c.lt + c.gt == 100

    def test_min_length(self):
        c = it.slot_compare_counts([1, 2, 3], [1])
        assert c.eq + c.lt + c.gt == 1

    def test_u64_high_half_ordering(self):
        a = np.array([0x0000000200000001], np.uint64)
        b = np.array([0x0000000100000002], np.uint64)
        c = it.slot_compare_counts(a, b)
        assert (c.eq, c.lt, c.gt) == (0, 0, 1)


class TestMinHash:
    def test_jaccard_docstring(self):
        a = np.array([1, 2, 3, 4], np.uint32)
        b = np.array([1, 2, 3, 9], np.uint32)
        assert float(it.minhash_jaccard(a, b)) == 0.75
        assert float(it.jaccard_distance(a, b)) == 0.25

    def test_empty_contracts(self):
        z = np.zeros(0, np.uint32)
        assert float(it.minhash_jaccard(z, z)) == 1.0
        assert float(it.jaccard_distance(z, z)) == 0.0

    def test_complementary(self, rng):
        a = rng.integers(0, 8, 128).astype(np.uint32)
        b = rng.integers(0, 8, 128).astype(np.uint32)
        assert float(it.minhash_jaccard(a, b)) + float(
            it.jaccard_distance(a, b)
        ) == pytest.approx(1.0, abs=1e-6)

    def test_minhash_estimates_jaccard(self, rng):
        # Build two sets with known Jaccard ~ 1/3 and MinHash-sketch them.
        universe = np.arange(3000)
        s1 = set(universe[:2000].tolist())
        s2 = set(universe[1000:3000].tolist())
        true_j = len(s1 & s2) / len(s1 | s2)
        k = 256
        seeds = rng.integers(1, 2**31, k).astype(np.uint64)

        def sketch(s):
            items = np.fromiter(s, dtype=np.uint64)

            def h(seed):
                z = (items + seed) * np.uint64(0x9E3779B97F4A7C15)
                z ^= z >> np.uint64(31)
                return np.min(z & np.uint64(0x7FFFFFFF))

            with np.errstate(over="ignore"):
                return np.array([h(seed) for seed in seeds], dtype=np.uint32)

        est = float(it.minhash_jaccard(sketch(s1), sketch(s2)))
        assert est == pytest.approx(true_j, abs=0.1)


class TestBatch:
    def test_batch_slot_hamming(self, rng):
        corpus = rng.integers(0, 4, (50, 64)).astype(np.uint32)
        q = corpus[7]
        got = np.asarray(it.batch_slot_hamming_u32(q, corpus))
        want = np.sum(corpus != q[None, :], axis=1)
        np.testing.assert_array_equal(got, want)


class TestSlotKnn:
    def test_slot_knn_matches_bruteforce(self, rng):
        corpus = rng.integers(0, 8, (200, 64)).astype(np.uint32)
        q = corpus[33]
        counts, idx = it.slot_knn_u32(q, corpus, 5)
        ref = np.sum(corpus != q[None, :], axis=1)
        want = np.argsort(ref, kind="stable")[:5]
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_array_equal(np.asarray(counts), ref[want])
        assert int(np.asarray(idx)[0]) == 33 and int(np.asarray(counts)[0]) == 0

    def test_minhash_knn_similarity(self, rng):
        corpus = rng.integers(0, 8, (100, 32)).astype(np.uint32)
        q = corpus[7]
        sims, idx = it.minhash_knn(q, corpus, 3)
        assert int(np.asarray(idx)[0]) == 7
        assert float(np.asarray(sims)[0]) == 1.0
        assert np.all(np.diff(np.asarray(sims)) <= 0)

    def test_slot_knn_edges(self, rng):
        corpus = rng.integers(0, 8, (5, 16)).astype(np.uint32)
        counts, idx = it.slot_knn_u32(corpus[0], corpus, 0)
        assert len(np.asarray(idx)) == 0
        counts, idx = it.slot_knn_u32(corpus[0], corpus, 50)
        assert len(np.asarray(idx)) == 5
