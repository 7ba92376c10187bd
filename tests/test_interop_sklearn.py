"""Third-party ANN-index interop proof.

The reference proves its ``Distance`` impls are drop-in metrics by building
real ``hnsw_rs`` indexes over them (``tests/anndists_interop.rs:54-97``).
The analog available in this image is scikit-learn: its ``BallTree`` /
``NearestNeighbors`` are genuine third-party index structures that accept
user-supplied metrics, so they are built here *through* innr_tpu's
``Distance`` protocol (``innr_tpu/distance.py``) — the index calls our
``eval`` per pair exactly as hnsw_rs calls the reference's trait — and the
retrieved neighbors must match innr_tpu's own brute-force scans.
"""

import numpy as np
import pytest

import innr_tpu as it
from innr_tpu.distance import DistCosine, DistL2, DistSlotU32

sklearn_neighbors = pytest.importorskip("sklearn.neighbors")


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestSklearnInterop:
    def test_balltree_over_dist_l2(self, rng):
        """A real BallTree built with DistL2 as its metric: tree queries
        must return the same neighbors as innr's batch_knn."""
        rows = rng.standard_normal((200, 16)).astype(np.float32)
        dist = DistL2()
        tree = sklearn_neighbors.BallTree(
            rows, leaf_size=8, metric=lambda a, b: float(dist.eval(a, b))
        )
        queries = rows[:5] + 0.01 * rng.standard_normal((5, 16)).astype(np.float32)
        d_tree, i_tree = tree.query(queries, k=4)
        vb = it.VerticalBatch.from_rows(rows)
        for qi in range(5):
            want = it.batch_knn(queries[qi], vb, 4)
            np.testing.assert_array_equal(np.sort(i_tree[qi]), np.sort(want.indices))
            np.testing.assert_allclose(
                np.sort(d_tree[qi]) ** 2, np.sort(want.scores), rtol=1e-4
            )

    def test_nearestneighbors_over_dist_cosine(self, rng):
        """NearestNeighbors driven by DistCosine recalls the same top-k as
        innr's batch_knn_cosine (the hnsw_rs DistCosine analog)."""
        rows = rng.standard_normal((150, 24)).astype(np.float32)
        dist = DistCosine()
        nn = sklearn_neighbors.NearestNeighbors(
            n_neighbors=5,
            algorithm="brute",
            metric=lambda a, b: float(dist.eval(a, b)),
        )
        nn.fit(rows)
        q = rng.standard_normal((3, 24)).astype(np.float32)
        d_nn, i_nn = nn.kneighbors(q)
        vb = it.VerticalBatch.from_rows(rows)
        for qi in range(3):
            want = it.batch_knn_cosine(q[qi], vb, 5)
            assert set(i_nn[qi].tolist()) == set(want.indices.tolist())
            np.testing.assert_allclose(
                np.sort(1.0 - d_nn[qi])[::-1], want.scores, rtol=1e-4, atol=1e-5
            )

    def test_nearestneighbors_over_dist_slot_u32(self, rng):
        """MinHash sketches through DistSlotU32 inside a third-party index:
        mirrors the reference building hnsw_rs over DistSlotU32 sketches."""
        # MinHash-like sketches with planted near-duplicates.
        base = rng.integers(0, 2**31, (40, 64), dtype=np.uint32)
        sketches = np.concatenate([base, base.copy()], axis=0)
        # Perturb the duplicates in 8 of 64 slots.
        for i in range(40):
            pos = rng.choice(64, 8, replace=False)
            sketches[40 + i, pos] = rng.integers(0, 2**31, 8, dtype=np.uint32)

        dist = DistSlotU32()
        nn = sklearn_neighbors.NearestNeighbors(
            n_neighbors=2,
            algorithm="brute",
            metric=lambda a, b: float(
                dist.eval(a.astype(np.uint32), b.astype(np.uint32))
            ),
        )
        nn.fit(sketches.astype(np.float64))  # sklearn stores f64; u32 is exact
        d_nn, i_nn = nn.kneighbors(sketches[:10].astype(np.float64))
        for qi in range(10):
            # nearest = itself (distance 0), second = its planted near-dup
            assert i_nn[qi][0] == qi
            assert d_nn[qi][0] == 0.0
            assert i_nn[qi][1] == 40 + qi
            np.testing.assert_allclose(d_nn[qi][1], 8 / 64, atol=1e-6)
        # And the distances agree with innr's own batch slot scan.
        batch_d = np.asarray(dist.eval_batch(sketches[0], sketches))
        np.testing.assert_allclose(batch_d[i_nn[0]], d_nn[0], atol=1e-6)

    def test_recall_of_tree_index_vs_innr_bruteforce(self, rng):
        """End-to-end recall parity: a BallTree ANN query over innr-
        normalized embeddings recalls innr's exact cosine top-k."""
        rows = rng.standard_normal((300, 32)).astype(np.float32)
        unit = np.asarray(it.normalize(rows[0]))  # smoke the op here too
        assert np.isclose(np.linalg.norm(unit), 1.0, atol=1e-5)
        normed = np.stack([np.asarray(it.normalize(r)) for r in rows[:60]])
        tree = sklearn_neighbors.BallTree(normed, metric="euclidean")
        q = normed[7]
        _, i_tree = tree.query(q[None], k=5)
        vb = it.VerticalBatch.from_rows(normed)
        want = it.batch_knn_cosine(q, vb, 5)
        # On unit vectors, L2 order == cosine order.
        assert set(i_tree[0].tolist()) == set(want.indices.tolist())
