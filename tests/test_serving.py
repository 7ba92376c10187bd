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

    def test_quarter_steps_above_half(self):
        # Above max_batch/2 the ladder steps by max_batch/4: a 17-query
        # window pads to 24, not 32 (round-5: the pure power-of-two
        # ladder wasted up to ~2x compute exactly where windows are
        # largest).
        assert [_bucket(n, 32) for n in (17, 20, 24, 25)] == [24, 24, 24, 32]
        assert [_bucket(n, 64) for n in (33, 48, 49, 63)] == [48, 48, 64, 64]

    def test_capped_at_max_batch(self):
        assert _bucket(7, 4) == 4

    def test_tiny_max_batch(self):
        assert [_bucket(n, 1) for n in (1,)] == [1]
        assert [_bucket(n, 3) for n in (1, 2, 3)] == [1, 2, 3]


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


class TestAsyncAndPipelining:
    """Round-5 saturation work: Future interface + pipelined flushes."""

    def test_submit_returns_future(self, rng):
        rows = _unit_rows(rng, 64, 8)
        with MicroBatcher(_brute_backend(rows), k=3, max_wait_ms=1.0) as mb:
            futs = [mb.submit(rows[i]) for i in (5, 9, 21)]
            for want, f in zip((5, 9, 21), futs):
                vals, idx = f.result(timeout=10)
                assert int(idx[0]) == want
                assert vals.shape == (3,)

    def test_future_carries_backend_error(self):
        def broken(qs):
            raise ValueError("backend exploded")

        with MicroBatcher(broken, k=1, max_wait_ms=1.0) as mb:
            f = mb.submit(np.zeros(4, np.float32))
            with pytest.raises(ValueError, match="backend exploded"):
                f.result(timeout=10)

    def test_pipelined_flushes_overlap(self, rng):
        """With a slow backend and pipeline_depth=2, two windows must be
        in flight concurrently (observed via a high-water mark); with
        depth=1 they must serialize."""
        rows = _unit_rows(rng, 16, 4)
        oracle = _brute_backend(rows)

        class Spy:
            def __init__(self):
                self.active = 0
                self.high = 0
                self.lock = threading.Lock()

            def __call__(self, qs):
                with self.lock:
                    self.active += 1
                    self.high = max(self.high, self.active)
                time.sleep(0.05)
                out = oracle(qs)
                with self.lock:
                    self.active -= 1
                return out

        for depth, want_high in ((2, 2), (1, 1)):
            spy = Spy()
            with MicroBatcher(spy, k=1, max_batch=2, max_wait_ms=1.0,
                              pipeline_depth=depth) as mb:
                futs = [mb.submit(rows[i % 16]) for i in range(8)]
                for f in futs:
                    f.result(timeout=30)
            if depth == 2:
                assert spy.high == want_high, spy.high
            else:
                assert spy.high == 1, spy.high

    def test_depth_contract(self, rng):
        rows = _unit_rows(rng, 8, 4)
        with pytest.raises(ContractError):
            MicroBatcher(_brute_backend(rows), k=1, pipeline_depth=0)

    def test_results_exact_under_pipelining(self, rng):
        """48 concurrent callers through depth-2 pipelining: every caller
        gets its own exact row (no cross-window mixups)."""
        rows = _unit_rows(rng, 64, 8)
        with MicroBatcher(_brute_backend(rows), k=1, max_batch=8,
                          max_wait_ms=1.0, pipeline_depth=2) as mb:
            results = {}
            errs = []

            def worker(i):
                try:
                    _, idx = mb.search(rows[i])
                    results[i] = int(idx[0])
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            threads = [
                threading.Thread(target=worker, args=(i,)) for i in range(48)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
        assert not errs
        assert results == {i: i for i in range(48)}
        assert mb.stats.requests == 48
        assert mb.stats.launches >= 6  # windows of <= max_batch
