"""MicroBatcher: request coalescing correctness, bucketing, lifecycle.

The serving analog of the reference's library-call path; the launch-floor
economics it amortizes are measured in examples/serving_demo.py on-chip
(PERF.md "launch floor"). Everything here runs against small in-process
backends so the threading/coalescing logic is tested deterministically.
"""

import threading
import time

import numpy as np
import pytest

import innr_tpu as it
from innr_tpu.serving import MicroBatcher, _bucket
from innr_tpu.utils.asserts import ContractError


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _unit_rows(rng, n, d):
    """Unit-norm rows: self-dot (=1) strictly wins MIPS, so searching
    rows[i] must return i first — the identity the tests assert."""
    rows = rng.standard_normal((n, d)).astype(np.float32)
    return (rows / np.linalg.norm(rows, axis=1, keepdims=True)).astype(
        np.float32
    )


def _brute_backend(rows):
    """Callable backend: exact MIPS via NumPy (deterministic oracle)."""

    def scan(qs):
        scores = qs.astype(np.float64) @ rows.T.astype(np.float64)
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :3]
        vals = np.take_along_axis(scores, idx, axis=1).astype(np.float32)
        return vals, idx.astype(np.int32)

    return scan


class TestBucket:
    def test_powers_of_two(self):
        assert [_bucket(n, 32) for n in (1, 2, 3, 4, 5, 8, 9, 31, 32)] == [
            1, 2, 4, 4, 8, 8, 16, 32, 32,
        ]

    def test_capped_at_max_batch(self):
        assert _bucket(7, 4) == 4


class TestCorrectness:
    def test_single_caller_matches_oracle(self, rng):
        rows = _unit_rows(rng, 64, 8)
        with MicroBatcher(_brute_backend(rows), k=3, max_wait_ms=1.0) as mb:
            q = rows[17]
            vals, idx = mb.search(q)
            assert idx[0] == 17
            assert vals.shape == (3,)

    def test_concurrent_callers_each_get_own_result(self, rng):
        rows = _unit_rows(rng, 128, 8)
        results = {}
        with MicroBatcher(
            _brute_backend(rows), k=3, max_batch=16, max_wait_ms=20.0
        ) as mb:
            def worker(i):
                _, idx = mb.search(rows[i])
                results[i] = int(idx[0])

            threads = [
                threading.Thread(target=worker, args=(i,)) for i in range(12)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        assert results == {i: i for i in range(12)}
        # 12 concurrent requests must NOT take 12 launches.
        assert mb.stats.launches < 12
        assert mb.stats.requests == 12

    def test_pad_rows_are_discarded(self, rng):
        # 3 requests -> bucket 4; the pad row duplicates request 0 but
        # only 3 results are delivered.
        rows = _unit_rows(rng, 32, 4)
        seen_shapes = []
        oracle = _brute_backend(rows)

        def scan(qs):
            seen_shapes.append(qs.shape[0])
            return oracle(qs)

        with MicroBatcher(scan, k=3, max_batch=8, max_wait_ms=30.0) as mb:
            out = {}

            def worker(i):
                _, idx = mb.search(rows[i])
                out[i] = int(idx[0])

            ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        assert out == {0: 0, 1: 1, 2: 2}
        assert all(s in (1, 2, 4) for s in seen_shapes)

    def test_max_batch_splits_windows(self, rng):
        rows = rng.standard_normal((64, 4)).astype(np.float32)
        with MicroBatcher(
            _brute_backend(rows), k=2, max_batch=4, max_wait_ms=50.0
        ) as mb:
            ts = []
            for i in range(10):
                t = threading.Thread(target=mb.search, args=(rows[i],))
                t.start()
                ts.append(t)
            for t in ts:
                t.join()
        assert mb.stats.requests == 10
        assert max(mb.stats.batch_histogram) <= 4


class TestBackends:
    def test_two_stage_index_backend(self, rng):
        rows = _unit_rows(rng, 256, 16)
        idx2 = it.TwoStageIndex(rows, "matryoshka", rerank_factor=4)
        with MicroBatcher(idx2, k=2, max_wait_ms=1.0) as mb:
            vals, idx = mb.search(rows[9])
            assert idx[0] == 9

    def test_two_arg_callable_backend(self, rng):
        # Regression: f(queries, k) callables (e.g. lambda q, k:
        # batch_knn_dot(q, vb, k)) were wrapped as 1-arg and exploded.
        rows = _unit_rows(rng, 64, 8)
        oracle = _brute_backend(rows)
        calls = []

        def scan2(qs, k):
            calls.append(k)
            return oracle(qs)

        with MicroBatcher(scan2, k=3, max_wait_ms=1.0) as mb:
            _, idx = mb.search(rows[7])
            assert idx[0] == 7
        assert calls == [3]

    def test_knn_dot_object_backend(self, rng):
        class Obj:
            def __init__(self, rows):
                self.rows = rows

            def knn_dot(self, qs, k):
                return _brute_backend(self.rows)(qs)

        rows = _unit_rows(rng, 64, 8)
        with MicroBatcher(Obj(rows), k=3, max_wait_ms=1.0) as mb:
            _, idx = mb.search(rows[5])
            assert idx[0] == 5


class TestLifecycle:
    def test_contract_errors(self, rng):
        with pytest.raises(ContractError):
            MicroBatcher(lambda qs: qs, k=0)
        with pytest.raises(ContractError):
            MicroBatcher(object(), k=1)
        rows = rng.standard_normal((8, 4)).astype(np.float32)
        mb = MicroBatcher(_brute_backend(rows), k=1)
        with pytest.raises(ContractError):
            mb.search(rows)  # 2-D query
        mb.close()
        with pytest.raises(ContractError):
            mb.search(rows[0])

    def test_backend_error_propagates_to_caller(self):
        def broken(qs):
            raise ValueError("backend exploded")

        with MicroBatcher(broken, k=1, max_wait_ms=1.0) as mb:
            with pytest.raises(ValueError, match="backend exploded"):
                mb.search(np.zeros(4, np.float32))

    def test_close_drains_pending(self, rng):
        rows = _unit_rows(rng, 16, 4)
        mb = MicroBatcher(
            _brute_backend(rows), k=1, max_batch=64, max_wait_ms=500.0
        )
        got = {}

        def worker():
            _, idx = mb.search(rows[3])
            got["idx"] = int(idx[0])

        t = threading.Thread(target=worker)
        t.start()
        time.sleep(0.05)  # let the request enqueue into the long window
        mb.close()  # must flush, not strand, the waiter
        t.join(timeout=10)
        assert got.get("idx") == 3
