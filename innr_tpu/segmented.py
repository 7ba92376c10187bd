"""Mutable serving index over immutable segments (the LSM pattern).

Every container in the family is an immutable device array — the right
trade for TPU scan throughput, and exactly what the reference ships
(``VerticalBatch`` has no insert/remove). Real serving additionally needs
ingestion and deletion; :class:`SegmentedCorpus` provides both WITHOUT
giving up immutable scan segments:

- ``add(rows)`` appends a new immutable :class:`~innr_tpu.batch.
  VerticalBatch` segment (no rebuild of existing ones);
- ``delete(ids)`` sets host-side tombstones (the segment arrays are
  untouched; deleted rows are excluded exactly at query time);
- ``knn_dot/knn/knn_cosine`` run one fused multi-query scan per segment —
  over-fetching by the segment's tombstone count so deletions can never
  displace genuine winners — and merge the per-segment candidates on
  int32 total-order keys with global-id tie-breaking, the same discipline
  as the distributed merge;
- ``compact()`` folds all segments into one when tombstones accumulate.

Row ids are permanent (monotonic): ``add`` returns the id range, results
report ids, and ``compact`` preserves them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from innr_tpu.batch import (
    VerticalBatch,
    batch_knn,
    batch_knn_cosine,
    batch_knn_dot,
)
from innr_tpu.utils.asserts import ContractError
from innr_tpu.utils.order import total_order_key_f32

__all__ = ["SegmentedCorpus"]


class _Segment:
    def __init__(self, vb: VerticalBatch, ids: np.ndarray):
        self.vb = vb
        self.ids = ids  # (n,) int64 permanent global ids
        self.alive = np.ones(len(ids), bool)

    @property
    def n_dead(self) -> int:
        return int((~self.alive).sum())


class SegmentedCorpus:
    """A mutable f32 corpus: immutable scan segments + tombstones."""

    def __init__(self, dimension: int):
        if int(dimension) <= 0:
            raise ContractError("SegmentedCorpus: dimension must be positive")
        self._dim = int(dimension)
        self._segments: list[_Segment] = []
        self._next_id = 0

    # ------------------------------------------------------------- mutate --
    def add(self, rows) -> tuple[int, int]:
        """Append rows as a new immutable segment. Returns the permanent
        ``(first_id, last_id + 1)`` range assigned to them."""
        rows = np.asarray(rows, dtype=np.float32)
        if rows.ndim != 2 or rows.shape[1] != self._dim:
            raise ContractError(
                f"SegmentedCorpus.add: rows must be (N, {self._dim}), got "
                f"{rows.shape}"
            )
        n = rows.shape[0]
        if n == 0:
            return self._next_id, self._next_id
        ids = np.arange(self._next_id, self._next_id + n, dtype=np.int64)
        self._segments.append(_Segment(VerticalBatch.from_rows(rows), ids))
        self._next_id += n
        return int(ids[0]), int(ids[-1]) + 1

    def delete(self, ids) -> int:
        """Tombstone rows by permanent id. Unknown/already-deleted ids are
        ignored. Returns the number of rows newly deleted.

        Each segment's id array is sorted ascending (monotonic assignment;
        compaction preserves order), so lookup is a vectorized
        ``searchsorted`` per segment — no per-row side table."""
        ids = np.unique(np.atleast_1d(np.asarray(ids, dtype=np.int64)))
        deleted = 0
        for seg in self._segments:
            if len(seg.ids) == 0:
                continue
            pos = np.clip(np.searchsorted(seg.ids, ids), 0, len(seg.ids) - 1)
            hit = seg.ids[pos] == ids
            tgt = pos[hit]
            deleted += int(seg.alive[tgt].sum())
            seg.alive[tgt] = False
        return deleted

    def compact(self) -> None:
        """Fold all alive rows into one segment (ids preserved). Call when
        tombstones or segment count accumulate; scans over many small
        segments pay one kernel launch each."""
        if not self._segments:
            return
        rows = np.concatenate(
            [np.asarray(s.vb.rows)[s.alive] for s in self._segments]
        )
        ids = np.concatenate([s.ids[s.alive] for s in self._segments])
        self._segments = (
            [_Segment(VerticalBatch.from_rows(rows), ids)] if len(ids) else []
        )

    # ------------------------------------------------------------ inspect --
    @property
    def dimension(self) -> int:
        return self._dim

    @property
    def num_vectors(self) -> int:
        """Alive rows."""
        return sum(int(s.alive.sum()) for s in self._segments)

    @property
    def num_deleted(self) -> int:
        return sum(s.n_dead for s in self._segments)

    @property
    def num_segments(self) -> int:
        return len(self._segments)

    def memory_bytes(self) -> int:
        return sum(s.vb.memory_bytes() for s in self._segments)

    # ------------------------------------------------------------- search --
    @staticmethod
    def _merge(per_seg, k: int):
        """Merge per-segment (keys, scores, global ids) — best key first,
        then lowest global id, like the distributed merge. Dead-row
        entries arrive pinned to INT32_MIN keys, which lose to every alive
        candidate (including NaN scores, whose flipped total-order key is
        strictly greater) — pins can never surface while >= k alive
        candidates exist, which the k <= num_vectors clamp guarantees."""
        keys = np.concatenate([p[0] for p in per_seg], axis=1)
        scores = np.concatenate([p[1] for p in per_seg], axis=1)
        gids = np.concatenate([p[2] for p in per_seg], axis=1)
        order = np.lexsort((gids, -keys.astype(np.int64)), axis=-1)[:, :k]
        return (
            np.take_along_axis(scores, order, axis=1),
            np.take_along_axis(gids, order, axis=1),
        )

    def _run(self, queries, k: int, scan, largest: bool, op: str):
        qs = np.asarray(queries, dtype=np.float32)
        single = qs.ndim == 1
        if single:
            qs = qs[None, :]
        if qs.ndim != 2 or qs.shape[1] != self._dim:
            raise ContractError(
                f"innr_tpu::{op}: queries must be (Q, {self._dim}), got "
                f"{np.asarray(queries).shape}"
            )
        n_alive = self.num_vectors
        n_q = qs.shape[0]
        k = min(int(k), n_alive)
        if k <= 0:
            empty = (
                np.zeros((n_q, 0), np.float32),
                np.zeros((n_q, 0), np.int64),
            )
            return (empty[0][0], empty[1][0]) if single else empty
        per_seg = []
        for seg in self._segments:
            n_seg_alive = int(seg.alive.sum())
            if n_seg_alive == 0:
                continue
            # Over-fetch by the tombstone count: dead rows can occupy at
            # most n_dead of the fetched slots, so k alive survivors are
            # guaranteed; rounded up to a power of two so the jitted
            # scan's static k takes O(log n) distinct values across a
            # delete-heavy serving session instead of recompiling per
            # tombstone count.
            need = k + seg.n_dead
            k_seg = min(1 << max(need - 1, 1).bit_length(), len(seg.ids))
            k_seg = max(k_seg, min(need, len(seg.ids)))
            res = scan(jnp.asarray(qs), seg.vb, k_seg)
            scores = np.asarray(res.scores)
            local = np.asarray(res.indices)
            alive = seg.alive[local]  # (Q, k_seg)
            gids = np.where(alive, seg.ids[local], np.int64(2**62))
            keys = np.asarray(total_order_key_f32(jnp.asarray(scores)))
            if not largest:
                keys = ~keys
            # Pin dead candidates in KEY space (INT32_MIN): score-space
            # pins (+-inf) would outrank alive NaN rows under total order.
            keys = np.where(alive, keys, np.int32(-(2**31)))
            per_seg.append((keys, scores, gids))
        out_scores, out_ids = self._merge(per_seg, k)
        if single:
            return out_scores[0], out_ids[0]
        return out_scores, out_ids

    def knn_dot(self, queries, k: int):
        """Top-k MIPS over all alive rows: (scores descending, permanent
        ids). Accepts (D,) or (Q, D)."""
        return self._run(queries, k, batch_knn_dot, True, "segmented_knn_dot")

    def knn(self, queries, k: int):
        """Top-k exact L2^2 (ascending) over all alive rows."""
        return self._run(queries, k, batch_knn, False, "segmented_knn")

    def knn_cosine(self, queries, k: int):
        """Top-k cosine (descending) over all alive rows."""
        return self._run(
            queries, k, batch_knn_cosine, True, "segmented_knn_cosine"
        )
