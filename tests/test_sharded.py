"""Distributed kNN over an 8-virtual-device CPU mesh: the sharded scan must
match the single-chip result exactly (indices) and closely (scores)."""

import jax
import numpy as np
import pytest

import innr_tpu as it
from innr_tpu.parallel import ShardedCorpus, default_mesh


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")


class TestShardedKnn:
    def test_mesh_has_8_devices(self, devices_ok):
        assert default_mesh().devices.size == 8

    def test_dot_matches_single_chip(self, rng, devices_ok):
        rows = rng.standard_normal((1000, 64)).astype(np.float32)
        q = rng.standard_normal(64).astype(np.float32)
        sc = ShardedCorpus(rows)
        vals, idx = sc.knn_dot(q, 7)
        vb = it.VerticalBatch.from_rows(rows)
        want = it.batch_knn_dot(q, vb, 7)
        np.testing.assert_array_equal(np.asarray(idx), want.indices)
        np.testing.assert_allclose(np.asarray(vals), want.scores, rtol=1e-5)

    def test_l2_matches_single_chip(self, rng, devices_ok):
        rows = rng.standard_normal((1000, 64)).astype(np.float32)
        q = rng.standard_normal(64).astype(np.float32)
        sc = ShardedCorpus(rows)
        vals, idx = sc.knn_l2(q, 5)
        vb = it.VerticalBatch.from_rows(rows)
        want = it.batch_knn(q, vb, 5)
        np.testing.assert_array_equal(np.asarray(idx), want.indices)
        np.testing.assert_allclose(np.asarray(vals), want.scores, rtol=1e-4, atol=1e-4)

    def test_padding_rows_never_win(self, rng, devices_ok):
        # 1001 rows over 8 devices forces padding; padded rows must not
        # appear even when k is large.
        rows = rng.standard_normal((1001, 16)).astype(np.float32)
        q = rng.standard_normal(16).astype(np.float32)
        sc = ShardedCorpus(rows)
        vals, idx = sc.knn_dot(q, 50)
        assert np.all(np.asarray(idx) < 1001)

    def test_self_query_wins(self, rng, devices_ok):
        rows = rng.standard_normal((512, 32)).astype(np.float32)
        sc = ShardedCorpus(rows)
        _, idx = sc.knn_l2(rows[99], 1)
        assert int(np.asarray(idx)[0]) == 99

    def test_shape_contracts(self, rng, devices_ok):
        sc = ShardedCorpus(rng.standard_normal((64, 8)).astype(np.float32))
        assert sc.num_vectors == 64 and sc.dimension == 8
        with pytest.raises(it.ContractError):
            sc.knn_dot(np.zeros(9, np.float32), 3)

    def test_k_clamped(self, rng, devices_ok):
        rows = rng.standard_normal((32, 8)).astype(np.float32)
        sc = ShardedCorpus(rows)
        vals, idx = sc.knn_dot(rows[0], 4)
        assert np.asarray(idx).shape == (4,)


class TestShardedMultiQuery:
    def test_multi_query_matches_single(self, rng, devices_ok):
        rows = rng.standard_normal((512, 32)).astype(np.float32)
        sc = ShardedCorpus(rows)
        qs = rng.standard_normal((4, 32)).astype(np.float32)
        vals, idx = sc.knn_dot(qs, 5)
        assert np.asarray(idx).shape == (4, 5)
        for j in range(4):
            v1, i1 = sc.knn_dot(qs[j], 5)
            np.testing.assert_array_equal(np.asarray(idx)[j], np.asarray(i1))

    def test_multi_query_l2(self, rng, devices_ok):
        rows = rng.standard_normal((256, 16)).astype(np.float32)
        sc = ShardedCorpus(rows)
        vals, idx = sc.knn_l2(rows[[3, 9]], 2)
        assert int(np.asarray(idx)[0, 0]) == 3
        assert int(np.asarray(idx)[1, 0]) == 9
