"""Dispatch-arm coverage gate.

The reference's CI coverage job exists to prove "every dispatch arm
executes" (``.github/workflows/ci.yml:174``). innr_tpu's dispatch arms are
fused-Pallas vs jnp/MXU vs forced-reference per op family; this module
drives each family through all of its arms and *instruments the arms
themselves* (wrapping the kernel entry points) so the gate fails if a
dispatch change silently stops exercising a path — no coverage.py needed.
"""

import numpy as np
import pytest

import innr_tpu as it
from innr_tpu import config


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _record_calls(monkeypatch, module, name, log):
    real = getattr(module, name)

    def wrapper(*a, **kw):
        log.append(name)
        return real(*a, **kw)

    monkeypatch.setattr(module, name, wrapper)


class TestDispatchArms:
    def test_backend_reporting_tracks_force_reference(self):
        from innr_tpu import backend

        assert backend.batch_backend(10 ** 6) is backend.Backend.PALLAS
        assert backend.batch_backend(10) is backend.Backend.MXU
        try:
            config.force_reference(True)
            assert backend.batch_backend(10 ** 6) is backend.Backend.REFERENCE
            assert backend.dense_backend(128) is backend.Backend.REFERENCE
            assert backend.slot_backend(64) is backend.Backend.REFERENCE
        finally:
            config.force_reference(False)

    @pytest.mark.parametrize(
        "family,fused_names",
        [
            ("dense", ["fused_knn_dot_batch", "fused_knn_l2", "fused_knn_cosine_batch"]),
            ("binary", ["fused_binary_knn"]),
            ("ternary", ["fused_ternary_knn"]),
            ("u8", ["fused_knn_u8_batch"]),
        ],
    )
    def test_all_three_arms_execute(self, rng, monkeypatch, family, fused_names):
        """For each op family: the fused arm, the jnp arm, and the forced-
        reference arm all run, produce identical indices, and the fused arm
        is *observed* (instrumented), not assumed."""
        from innr_tpu.kernels import knn as kknn, packed_knn as kpacked

        rows = rng.standard_normal((64, 32)).astype(np.float32)
        q = rows[3] + 0.01 * rng.standard_normal(32).astype(np.float32)
        calls: list = []
        for mod in (kknn, kpacked):
            for name in fused_names:
                if hasattr(mod, name):
                    _record_calls(monkeypatch, mod, name, calls)

        def run():
            if family == "dense":
                vb = it.VerticalBatch.from_rows(rows)
                out = [
                    it.batch_knn_dot(np.stack([q, q]), vb, 3).indices,
                    it.batch_knn(q, vb, 3).indices,
                    it.batch_knn_cosine(np.stack([q, q]), vb, 3).indices,
                ]
                return np.concatenate([np.ravel(o) for o in out])
            if family == "binary":
                corpus = it.PackedBinaryBatch.encode(rows, 0.0)
                qb = it.encode_binary(q, 0.0)
                _, idx = it.binary_knn(qb, corpus, 3)
                return np.asarray(idx)
            if family == "ternary":
                corpus = it.PackedTernaryBatch.encode(rows, 0.2)
                qt = it.encode_ternary(q, 0.2)
                _, idx = it.ternary_knn(qt, corpus, 3)
                return np.asarray(idx)
            params = it.QuantizationParams.fit(rows)
            corpus = it.QuantizedU8Batch.quantize(rows, params)
            res = it.batch_knn_u8(q, corpus, params, 3)
            return np.asarray([i for i, _ in res])

        # Arm 1: jnp/MXU (64 rows < MIN_ROWS_PALLAS).
        assert 64 < config.MIN_ROWS_PALLAS
        idx_jnp = run()
        assert calls == [], f"fused arm ran below threshold: {calls}"

        # Arm 2: fused Pallas (threshold lowered; interpret mode off-TPU).
        monkeypatch.setattr(config, "MIN_ROWS_PALLAS", 8)
        idx_fused = run()
        assert calls, "fused arm did not execute"
        np.testing.assert_array_equal(idx_fused, idx_jnp)

        # Arm 3: forced reference beats the threshold knob.
        calls.clear()
        try:
            config.force_reference(True)
            idx_ref = run()
        finally:
            config.force_reference(False)
        assert calls == [], f"fused arm ran while reference forced: {calls}"
        np.testing.assert_array_equal(idx_ref, idx_jnp)

    def test_maxsim_both_arms(self, rng, monkeypatch):
        from innr_tpu.kernels import maxsim_kernel as kmax
        from innr_tpu.ops.maxsim import maxsim_knn

        docs = rng.standard_normal((80, 6, 16)).astype(np.float32)
        q = rng.standard_normal((4, 16)).astype(np.float32)
        calls: list = []
        _record_calls(monkeypatch, kmax, "fused_maxsim_knn", calls)

        monkeypatch.setattr(config, "MIN_ROWS_PALLAS", 10 ** 9)
        _, idx_jnp = maxsim_knn(q, docs, 5)
        assert calls == []
        monkeypatch.setattr(config, "MIN_ROWS_PALLAS", 16)
        _, idx_fused = maxsim_knn(q, docs, 5)
        assert calls
        np.testing.assert_array_equal(idx_fused, idx_jnp)

    def test_slot_all_three_arms(self, rng, monkeypatch):
        """Slot-sketch family: fused vs jnp vs forced-reference arms all
        execute and agree exactly (integer counts)."""
        from innr_tpu.kernels import slot_knn as kslot

        sketches = rng.integers(0, 8, (64, 32)).astype(np.uint32)
        corpus = it.SketchCorpus(sketches)
        q = sketches[11]
        calls: list = []
        for name in ("fused_slot_knn", "fused_slot_knn_batch"):
            _record_calls(monkeypatch, kslot, name, calls)

        def run():
            _, i1 = it.slot_knn_u32(q, corpus, 3)
            _, i2 = it.slot_knn_u32_batch(sketches[:2], corpus, 3)
            return np.concatenate([np.ravel(np.asarray(i1)), np.ravel(np.asarray(i2))])

        assert 64 < config.MIN_ROWS_PALLAS
        idx_jnp = run()
        assert calls == [], f"fused arm ran below threshold: {calls}"

        monkeypatch.setattr(config, "MIN_ROWS_PALLAS", 8)
        idx_fused = run()
        assert sorted(set(calls)) == ["fused_slot_knn", "fused_slot_knn_batch"]
        np.testing.assert_array_equal(idx_fused, idx_jnp)

        calls.clear()
        try:
            config.force_reference(True)
            idx_ref = run()
        finally:
            config.force_reference(False)
        assert calls == [], f"fused arm ran while reference forced: {calls}"
        np.testing.assert_array_equal(idx_ref, idx_jnp)
