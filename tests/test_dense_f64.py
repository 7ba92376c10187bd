"""f64 reductions via double-f32 arithmetic vs NumPy f64 oracles at the
reference's 1e-9 relative bound (reference fuzz/l2_l1_diff.rs)."""

import numpy as np
import pytest

import innr_tpu as it
from innr_tpu.ops.reference import (
    dot_f64_portable,
    l1_distance_f64_portable,
    l2_distance_squared_f64_portable,
)

REL = 1e-9


def _vec64(rng, n, scale=1.0):
    return rng.standard_normal(n) * scale


class TestDf64:
    @pytest.mark.parametrize("dim", [1, 2, 7, 8, 9, 64, 129, 768, 1535])
    def test_dot(self, rng, dim):
        a, b = _vec64(rng, dim), _vec64(rng, dim)
        got = it.dot_f64(a, b, impl="df64")
        want = dot_f64_portable(a, b)
        assert got == pytest.approx(want, rel=REL, abs=1e-12)

    @pytest.mark.parametrize("dim", [1, 8, 64, 768])
    def test_l2_squared(self, rng, dim):
        a, b = _vec64(rng, dim), _vec64(rng, dim)
        got = it.l2_distance_squared_f64(a, b, impl="df64")
        want = l2_distance_squared_f64_portable(a, b)
        assert got == pytest.approx(want, rel=REL, abs=1e-12)

    @pytest.mark.parametrize("dim", [1, 8, 64, 768])
    def test_l1(self, rng, dim):
        a, b = _vec64(rng, dim), _vec64(rng, dim)
        got = it.l1_distance_f64(a, b, impl="df64")
        want = l1_distance_f64_portable(a, b)
        assert got == pytest.approx(want, rel=REL, abs=1e-12)

    def test_mixed_magnitudes(self, rng):
        a = np.concatenate([_vec64(rng, 32, 1e10), _vec64(rng, 32, 1e-10)])
        b = np.concatenate([_vec64(rng, 32, 1e-10), _vec64(rng, 32, 1e10)])
        got = it.dot_f64(a, b, impl="df64")
        want = dot_f64_portable(a, b)
        assert got == pytest.approx(want, rel=1e-8, abs=1e-12)

    def test_cancellation(self):
        # df64 must resolve what f32 cannot: 1e8 + 1 - 1e8.
        a = np.array([1e8, 1.0, -1e8])
        b = np.array([1.0, 1.0, 1.0])
        assert it.dot_f64(a, b, impl="df64") == pytest.approx(1.0, rel=1e-10)

    def test_f32_would_fail_here(self):
        # Sanity: the case above genuinely needs more than f32.
        a32 = np.array([1e8, 1.0, -1e8], np.float32)
        b32 = np.ones(3, np.float32)
        assert float(it.dot(a32, b32)) != pytest.approx(1.0, rel=1e-3)


class TestSemantics:
    def test_min_length_no_raise(self, rng):
        # dense_f64 compares over the shorter length (reference
        # src/lib.rs:38-41).
        a = np.array([1.0, 2.0, 3.0])
        b = np.array([4.0, 5.0])
        assert it.dot_f64(a, b) == pytest.approx(14.0)

    def test_empty_zero(self):
        assert it.dot_f64([], []) == 0.0
        assert it.l1_distance_f64([], []) == 0.0

    def test_norm(self):
        assert it.norm_f64([3.0, 4.0]) == pytest.approx(5.0, rel=1e-12)

    def test_normalize(self):
        v, n = it.normalize_f64([3.0, 4.0])
        assert n == pytest.approx(5.0)
        assert np.linalg.norm(v) == pytest.approx(1.0, rel=1e-12)

    def test_normalize_zero_unchanged(self):
        v, n = it.normalize_f64([0.0, 0.0])
        assert n == 0.0 and v.tolist() == [0.0, 0.0]

    def test_cosine_zero_norm_guard(self):
        assert it.cosine_f64([0.0, 0.0], [1.0, 0.0]) == 0.0

    def test_cosine(self, rng):
        a, b = _vec64(rng, 100), _vec64(rng, 100)
        want = float(
            (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )
        assert it.cosine_f64(a, b, impl="df64") == pytest.approx(want, rel=1e-9)

    def test_l2_distance(self):
        assert it.l2_distance_f64([0.0, 0.0], [3.0, 4.0]) == pytest.approx(5.0)
