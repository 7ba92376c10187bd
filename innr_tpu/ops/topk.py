"""Fixed-capacity top-K tracker with reference-exact semantics.

Port of the *semantics* of reference ``src/topk.rs``: K smallest
``(id, distance)`` pairs, buffer sorted descending (worst at index 0, O(1)
threshold), ``total_cmp`` ordering so NaN sorts greatest and can never poison
the acceptance gate (reference ``src/topk.rs:96-121`` and the NaN regression
test at ``:191-208``).

This class is the *host-side streaming* form — the inner-loop tracker the
reference feeds one candidate at a time. On TPU the batch kNN paths never
touch it: they select with integer total-order ``lax.top_k``
(:func:`innr_tpu.utils.order.top_k_total`), which produces identical results
to draining a stream of candidates through this tracker. The class exists
for API parity and as the oracle the vectorized selection is differential-
tested against.
"""

from __future__ import annotations

import struct

__all__ = ["TopK"]


def _total_key(d: float) -> int:
    """int key whose ``<`` equals ``f32::total_cmp`` on f32 values."""
    (bits,) = struct.unpack("<i", struct.pack("<f", d))
    return bits ^ 0x7FFFFFFF if bits < 0 else bits


class TopK:
    """Fixed-capacity tracker of the K smallest distances seen so far."""

    __slots__ = ("k", "_distances", "_ids")

    def __init__(self, k: int):
        if k <= 0:
            raise ValueError("innr_tpu.TopK: k must be >= 1")
        self.k = int(k)
        # Sorted descending by total order: index 0 is the current worst.
        self._distances: list[float] = []
        self._ids: list[int] = []

    def threshold(self) -> float:
        """Current worst distance, or +inf until the set is full."""
        if len(self._distances) < self.k:
            return float("inf")
        return self._distances[0]

    def insert(self, id_: int, distance: float) -> None:
        """Insert if ``distance`` improves the set (total-order compare)."""
        distance = float(distance)
        count = len(self._distances)
        if count < self.k:
            pos = self._find_insert_pos(distance, count)
            self._distances.insert(pos, distance)
            self._ids.insert(pos, int(id_))
        elif _total_key(distance) < _total_key(self._distances[0]):
            # Better than the current worst: evict index 0, re-insert.
            self._distances.pop(0)
            self._ids.pop(0)
            pos = self._find_insert_pos(distance, self.k - 1)
            self._distances.insert(pos, distance)
            self._ids.insert(pos, int(id_))
        # else: reject — single compare, no mutation.

    def __len__(self) -> int:
        return len(self._distances)

    def is_empty(self) -> bool:
        return not self._distances

    def into_sorted(self) -> list[tuple[int, float]]:
        """Results ascending by distance (closest first); consumes the set."""
        out = list(zip(reversed(self._ids), reversed(self._distances)))
        self._distances = []
        self._ids = []
        return out

    def _find_insert_pos(self, distance: float, length: int) -> int:
        """Leftmost index in the descending buffer where
        ``buffer[i] <= distance`` under total order — equal elements push
        toward higher indices (reference ``src/topk.rs:173-188``)."""
        key = _total_key(distance)
        lo, hi = 0, length
        while lo < hi:
            mid = (lo + hi) // 2
            if _total_key(self._distances[mid]) > key:
                lo = mid + 1
            else:
                hi = mid
        return lo
