"""Native host runtime (C via ctypes) and host-side ingest loaders:
differential tests vs the jit encoders and the Python TopK."""

import numpy as np
import pytest

import innr_tpu as it
from innr_tpu import _native
from innr_tpu.loader import encode_binary_host, encode_ternary_host, quantize_u8_host


class TestNativeTopK:
    def test_insert_batch_equals_streaming(self, rng):
        dists = rng.standard_normal(500).astype(np.float32) ** 2
        dists[17] = np.nan
        ids = np.arange(500, dtype=np.uint32)
        a = it.TopK(7)
        a.insert_batch(ids, dists)
        b = it.TopK(7)
        for i, d in zip(ids, dists):
            b.insert(int(i), float(d))
        assert a.into_sorted() == b.into_sorted()

    def test_incremental_batches(self, rng):
        a = it.TopK(5)
        b = it.TopK(5)
        all_d = rng.standard_normal(300).astype(np.float32) ** 2
        ids = np.arange(300, dtype=np.uint32)
        for lo in range(0, 300, 50):
            a.insert_batch(ids[lo:lo+50], all_d[lo:lo+50])
        b.insert_batch(ids, all_d)
        assert a.into_sorted() == b.into_sorted()

    def test_matches_vectorized_topk(self, rng):
        from innr_tpu.utils.order import top_k_total

        dists = rng.standard_normal(400).astype(np.float32) ** 2
        tk = it.TopK(9)
        tk.insert_batch(np.arange(400, dtype=np.uint32), dists)
        expect = tk.into_sorted()
        vals, idx = top_k_total(dists, 9, largest=False)
        assert [int(i) for i in np.asarray(idx)] == [i for i, _ in expect]

    def test_ties_keep_insertion_order(self):
        tk = it.TopK(3)
        tk.insert_batch(np.arange(5, dtype=np.uint32), np.ones(5, np.float32))
        assert [i for i, _ in tk.into_sorted()] == [0, 1, 2]


class TestHostLoaders:
    def test_binary_host_equals_device_encoder(self, rng):
        rows = rng.standard_normal((30, 100)).astype(np.float32)
        host = encode_binary_host(rows, 0.1)
        device = it.PackedBinaryBatch.encode(rows, 0.1)
        np.testing.assert_array_equal(np.asarray(host.words), np.asarray(device.words))

    def test_ternary_host_equals_device_encoder(self, rng):
        rows = rng.standard_normal((20, 70)).astype(np.float32)
        host = encode_ternary_host(rows, 0.3)
        device = it.PackedTernaryBatch.encode(rows, 0.3)
        np.testing.assert_array_equal(np.asarray(host.pos), np.asarray(device.pos))
        np.testing.assert_array_equal(np.asarray(host.neg), np.asarray(device.neg))

    def test_u8_host_equals_device_quantizer(self, rng):
        rows = rng.standard_normal((25, 60)).astype(np.float32)
        params = it.QuantizationParams.fit(rows)
        host = quantize_u8_host(rows, params)
        device = it.QuantizedU8Batch.quantize(rows, params)
        h = np.asarray(host.codes).astype(np.int32)
        d = np.asarray(device.codes).astype(np.int32)
        # Rounding mode at exact .5 boundaries may differ by 1 code
        # (reference rounds half-away, XLA rounds half-even); everywhere
        # else they are identical.
        assert np.max(np.abs(h - d)) <= 1
        assert np.mean(h != d) < 0.01

    def test_loaded_corpus_searches(self, rng):
        rows = rng.standard_normal((500, 64)).astype(np.float32)
        corpus = encode_binary_host(rows, 0.0)
        q = it.encode_binary(rows[42], 0.0)
        counts, idx = it.binary_knn(q, corpus, 3)
        assert idx[0] == 42 and counts[0] == 0


@pytest.mark.skipif(not _native.available(), reason="no C compiler")
class TestNativeDirect:
    def test_hamming_scan(self, rng):
        corpus = rng.integers(0, 2**32, (50, 8), dtype=np.uint32)
        q = corpus[9]
        got = _native.hamming_scan(q, corpus)
        want = np.zeros(50, np.uint32)
        for i, row in enumerate(corpus):
            want[i] = sum(bin(int(a) ^ int(b)).count("1") for a, b in zip(row, q))
        np.testing.assert_array_equal(got, want)


class TestParallelEncoders:
    """The pthread row encoders (ABI v2) must be bit-identical to serial
    at any thread count (rows are independent)."""

    def test_mt_binary_identical(self, rng):
        from innr_tpu import _native

        if not _native.available():
            pytest.skip("native unavailable")
        rows = rng.standard_normal((20_000, 96)).astype(np.float32)
        got = _native.pack_binary_rows(rows, 0.0)  # > threshold triggers mt
        want = _pack_rows_numpy_ref(rows > 0.0)
        np.testing.assert_array_equal(got, want)

    def test_mt_ternary_identical(self, rng):
        from innr_tpu import _native

        if not _native.available():
            pytest.skip("native unavailable")
        rows = rng.standard_normal((20_000, 96)).astype(np.float32)
        pos, neg = _native.pack_ternary_rows(rows, 0.4)
        np.testing.assert_array_equal(pos, _pack_rows_numpy_ref(rows > 0.4))
        np.testing.assert_array_equal(neg, _pack_rows_numpy_ref(rows < -0.4))

    def test_mt_u8_identical(self, rng):
        from innr_tpu import _native

        if not _native.available():
            pytest.skip("native unavailable")
        rows = rng.standard_normal((20_000, 64)).astype(np.float32)
        got = _native.quantize_u8_rows(rows, 4.0, -2.0)
        x = (rows - np.float32(-2.0)) * np.float32(255.0 / 4.0)
        want = np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got, want)


def _pack_rows_numpy_ref(bits: np.ndarray) -> np.ndarray:
    d = bits.shape[-1]
    w = -(-d // 32)
    pad = w * 32 - d
    if pad:
        bits = np.concatenate(
            [bits, np.zeros(bits.shape[:-1] + (pad,), dtype=bool)], axis=-1
        )
    grouped = bits.reshape(bits.shape[:-1] + (w, 32)).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    return (grouped << shifts).sum(axis=-1).astype(np.uint32)


class TestMinHashEncoder:
    def test_native_matches_numpy_bit_for_bit(self, rng):
        from innr_tpu import _native
        from innr_tpu.loader import minhash_sketch_host

        docs = [
            rng.integers(0, 2**63, int(rng.integers(1, 40)), dtype=np.uint64)
            for _ in range(50)
        ]
        docs.append(np.zeros(0, np.uint64))  # empty doc
        got = minhash_sketch_host(docs, 16)
        # force the numpy fallback
        import innr_tpu.loader as loader

        real = _native.minhash_rows
        try:
            _native.minhash_rows = lambda *a, **k: None
            want = minhash_sketch_host(docs, 16)
        finally:
            _native.minhash_rows = real
        np.testing.assert_array_equal(got, want)
        assert np.all(got[-1] == 0xFFFFFFFF)  # empty doc -> all-max

    def test_sketches_estimate_jaccard_and_retrieve(self, rng):
        import innr_tpu as it
        from innr_tpu.loader import minhash_sketch_host

        base = rng.integers(0, 2**62, 300, dtype=np.uint64)
        near = base.copy()
        near[:15] = rng.integers(0, 2**62, 15, dtype=np.uint64)  # ~90% overlap
        far = rng.integers(0, 2**62, 300, dtype=np.uint64)
        sketches = minhash_sketch_host([base, near, far], 128)
        j_near = float(it.minhash_jaccard(sketches[0], sketches[1]))
        j_far = float(it.minhash_jaccard(sketches[0], sketches[2]))
        true_near = len(set(base.tolist()) & set(near.tolist())) / len(
            set(base.tolist()) | set(near.tolist())
        )
        assert abs(j_near - true_near) < 0.15
        assert j_far < 0.15
        sims, idx = it.minhash_knn(sketches[0], it.SketchCorpus(sketches), 2)
        assert list(np.asarray(idx)) == [0, 1]


class TestStaleAbiRebuild:
    def test_stale_library_rebuilt_for_next_process(self, tmp_path):
        """A cached .so from an older ABI must trigger an in-place rebuild
        (without it, the whole native runtime silently dies forever).
        Within the same process dlopen may return the stale handle, so
        the contract is: the NEXT process is healthy."""
        import pathlib
        import shutil
        import subprocess
        import sys

        from innr_tpu import _native

        lib = _native._LIB_PATH
        if not lib.exists():
            pytest.skip("native library not built")
        backup = tmp_path / "lib.bak"
        shutil.copy(lib, backup)
        try:
            stub = tmp_path / "stub.c"
            stub.write_text("int innr_native_abi_version(void){return 2;}")
            subprocess.run(
                ["cc", "-shared", "-fPIC", "-o", str(lib), str(stub)],
                check=True,
            )
            code = (
                "from innr_tpu import _native; _native.available(); "
                "print('first done')"
            )
            subprocess.run([sys.executable, "-c", code], check=True,
                           capture_output=True, timeout=300)
            code2 = (
                "from innr_tpu import _native; "
                "assert _native.available(), 'rebuild did not take'; "
                "print('HEALTHY')"
            )
            r = subprocess.run([sys.executable, "-c", code2], check=False,
                               capture_output=True, text=True, timeout=300)
            assert "HEALTHY" in r.stdout, r.stdout + r.stderr
        finally:
            shutil.copy(backup, lib)
