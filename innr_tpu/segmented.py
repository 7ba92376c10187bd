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
        self._id_to_loc: dict[int, tuple[int, int]] = {}

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
        seg = _Segment(VerticalBatch.from_rows(rows), ids)
        seg_idx = len(self._segments)
        self._segments.append(seg)
        for pos, gid in enumerate(ids):
            self._id_to_loc[int(gid)] = (seg_idx, pos)
        self._next_id += n
        return int(ids[0]), int(ids[-1]) + 1

    def delete(self, ids) -> int:
        """Tombstone rows by permanent id. Unknown/already-deleted ids are
        ignored. Returns the number of rows newly deleted."""
        deleted = 0
        for gid in np.atleast_1d(np.asarray(ids, dtype=np.int64)):
            loc = self._id_to_loc.get(int(gid))
            if loc is None:
                continue
            seg_idx, pos = loc
            if self._segments[seg_idx].alive[pos]:
                self._segments[seg_idx].alive[pos] = False
                deleted += 1
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
        self._id_to_loc = {
            int(gid): (0, pos) for pos, gid in enumerate(ids)
        }

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
    def _merge(self, per_seg, k: int, n_q: int, largest: bool):
        """Merge per-segment (scores (Q, k_s), global ids (Q, k_s)) —
        total-order keys with lower-id tie-breaking, like the distributed
        merge."""
        scores = jnp.concatenate([s for s, _ in per_seg], axis=1)
        gids = np.concatenate([g for _, g in per_seg], axis=1)
        keys = np.asarray(total_order_key_f32(scores))
        if not largest:
            keys = ~keys
        # lexicographic: best key first, then lowest global id
        order = np.lexsort((gids, -keys.astype(np.int64)), axis=-1)[:, :k]
        out_scores = np.take_along_axis(np.asarray(scores), order, axis=1)
        out_ids = np.take_along_axis(gids, order, axis=1)
        return out_scores, out_ids

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
            # guaranteed; then drop dead candidates exactly.
            k_seg = min(k + seg.n_dead, len(seg.ids))
            res = scan(jnp.asarray(qs), seg.vb, k_seg)
            scores = np.asarray(res.scores)
            local = np.asarray(res.indices)
            alive = seg.alive[local]  # (Q, k_seg)
            gids = seg.ids[local]
            # Pin dead candidates to the worst key so they merge last.
            scores = np.where(
                alive, scores, -np.inf if largest else np.inf
            ).astype(np.float32)
            gids = np.where(alive, gids, np.int64(2**62))
            per_seg.append((jnp.asarray(scores), gids))
        out_scores, out_ids = self._merge(per_seg, k, n_q, largest)
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
