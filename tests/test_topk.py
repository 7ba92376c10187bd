"""TopK tracker semantics (reference src/topk.rs) and total-order utils."""

import math

import numpy as np
import pytest

import innr_tpu as it
from innr_tpu.utils.order import top_k_total, total_order_key_f32


class TestTopK:
    def test_basic(self):
        top = it.TopK(3)
        for i, d in [(0, 1.5), (1, 0.3), (2, 2.0), (3, 0.8)]:
            top.insert(i, d)
        assert len(top) == 3
        results = top.into_sorted()
        assert [r[0] for r in results] == [1, 3, 0]
        assert results[0][1] == pytest.approx(0.3)

    def test_k_zero_raises(self):
        with pytest.raises(ValueError):
            it.TopK(0)

    def test_threshold_inf_until_full(self):
        top = it.TopK(2)
        assert top.threshold() == math.inf
        top.insert(0, 1.0)
        assert top.threshold() == math.inf
        top.insert(1, 2.0)
        assert top.threshold() == 2.0

    def test_reject_above_threshold(self):
        top = it.TopK(2)
        top.insert(0, 1.0)
        top.insert(1, 2.0)
        top.insert(2, 3.0)  # rejected
        assert sorted(i for i, _ in top.into_sorted()) == [0, 1]

    def test_eviction(self):
        top = it.TopK(2)
        top.insert(0, 1.0)
        top.insert(1, 2.0)
        top.insert(2, 0.5)
        results = top.into_sorted()
        assert [r[0] for r in results] == [2, 0]

    def test_nan_does_not_poison(self):
        # Regression pinned in reference src/topk.rs:191-208.
        tk = it.TopK(2)
        tk.insert(0, float("nan"))
        tk.insert(1, 1.0)
        tk.insert(2, 0.5)
        ids = [i for i, _ in tk.into_sorted()]
        assert set(ids) == {1, 2}

    def test_is_empty(self):
        top = it.TopK(1)
        assert top.is_empty()
        top.insert(0, 1.0)
        assert not top.is_empty()

    def test_equal_distances_keep_insertion_order(self):
        top = it.TopK(3)
        for i in range(3):
            top.insert(i, 1.0)
        assert [i for i, _ in top.into_sorted()] == [0, 1, 2]


class TestTotalOrder:
    def test_key_orders_like_total_cmp(self):
        vals = np.array(
            [-np.inf, -1.0, -0.0, 0.0, 1e-38, 1.0, np.inf, np.nan], np.float32
        )
        keys = np.asarray(total_order_key_f32(vals))
        assert list(np.argsort(keys, kind="stable")) == list(range(len(vals)))
        # NaN key is the greatest
        assert keys[-1] == keys.max()

    def test_neg_nan_is_least(self):
        neg_nan = np.frombuffer(np.uint32(0xFFC00000).tobytes(), np.float32)[0]
        vals = np.array([neg_nan, -np.inf, 0.0], np.float32)
        keys = np.asarray(total_order_key_f32(vals))
        assert keys[0] == keys.min()

    def test_top_k_total_ties_prefer_low_index(self):
        vals = np.array([1.0, 3.0, 3.0, 2.0], np.float32)
        _, idx = top_k_total(vals, 2, largest=True)
        assert list(np.asarray(idx)) == [1, 2]

    def test_top_k_total_equals_topk_tracker(self, rng):
        """Vectorized selection == streaming TopK tracker (the two must be
        interchangeable; batch kNN relies on it)."""
        dists = rng.standard_normal(300).astype(np.float32) ** 2
        dists[17] = np.nan
        vals, idx = top_k_total(dists, 7, largest=False)
        tracker = it.TopK(7)
        for i, d in enumerate(dists):
            tracker.insert(i, float(d))
        expect = tracker.into_sorted()
        assert [int(i) for i in np.asarray(idx)] == [i for i, _ in expect]
