"""Batch vector ops and the kNN family — the MXU path.

TPU-native redesign of reference ``src/batch.rs``. The reference stores the
corpus dimension-major ("PDX"/vertical layout) so a scalar CPU loop over one
dimension touches contiguous memory and auto-vectorizes
(``src/batch.rs:256-265``). On TPU the unit of work is a tile, not a lane:
the MXU consumes row-major (N, D) tiles directly and XLA performs the
layout/tiling, so a columnar layout would only add a transpose. We therefore
keep the :class:`VerticalBatch` *API* (constructors, accessors, the
dimension-major ``data()`` serialization format) but store rows natively.

Scan semantics carried over exactly (see each function's docstring):

- ``batch_knn`` / ``batch_knn_reordered``: exact L2^2, ascending.
- ``batch_knn_dot`` / ``batch_knn_cosine``: similarity, descending.
- ``batch_knn_filtered``: predicate pushdown; indices refer to the original
  batch.
- ``batch_knn_adaptive``: *approximate* warmup-extrapolation pruning
  (reference ``src/batch.rs:439-558``), redesigned as two MXU passes.
- All orderings use IEEE total order (``f32::total_cmp`` parity) via
  :mod:`innr_tpu.utils.order`, so NaN scores can never poison selection.

The ``*_into`` buffer-reuse variants exist in the reference to avoid
re-allocating result vectors per scan (``src/batch.rs:250``). Under jit XLA
owns buffer reuse (donation + fusion), so here they are thin aliases kept
for migration parity.

Large corpora dispatch to the fused Pallas streaming-score+top-k kernel
(:mod:`innr_tpu.kernels.knn`) when available; the jnp path is both the
fallback and the differential oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from innr_tpu import config
from innr_tpu.config import NORM_EPSILON
from innr_tpu.utils.asserts import ContractError
from innr_tpu.utils.order import top_k_total, total_order_key_f32

__all__ = [
    "VerticalBatch",
    "BatchKnnResult",
    "batch_l2_squared",
    "batch_l2_squared_into",
    "batch_dot",
    "batch_dot_into",
    "batch_norms",
    "batch_norms_into",
    "batch_cosine",
    "batch_cosine_into",
    "batch_l2_squared_pruning",
    "batch_dimension_variance",
    "batch_knn",
    "batch_knn_dot",
    "batch_knn_cosine",
    "batch_knn_filtered",
    "batch_knn_reordered",
    "batch_knn_adaptive",
]


class VerticalBatch:
    """Corpus container for batch scans (reference ``src/batch.rs:88``).

    Stores rows natively as a ``(num_vectors, dimension)`` f32 array (the
    MXU layout); the reference's dimension-major accessors are preserved on
    top of it. The backing array is exposed (``rows``, ``data()``) so
    callers own serialization, matching the reference's raw-data accessors
    (``src/batch.rs:212-214``).
    """

    __slots__ = ("rows", "_norms2", "_inv_norms", "_tile_summary",
                 "_tile_summary_norm", "_prune_tile_n")

    def __init__(self, rows: jax.Array, dtype=jnp.float32):
        """``dtype=jnp.bfloat16`` stores the corpus half-precision: the
        HBM-bound scans read half the bytes (~2x throughput; the MXU
        multiplies bf16 natively with f32 accumulation) at ~1e-2 relative
        score precision — a TPU-native option with no reference analog."""
        if dtype not in (jnp.float32, jnp.bfloat16):
            raise ContractError("VerticalBatch: dtype must be float32 or bfloat16")
        rows = jnp.asarray(rows, dtype=dtype)
        if rows.ndim != 2:
            raise ContractError(
                f"VerticalBatch: rows must be 2-D (N, D), got {rows.shape}"
            )
        self.rows = rows
        # Lazy per-row norm caches (rows are immutable jax arrays): the
        # reference's batch_norms precompute — computing them inside each
        # L2/cosine scan would cost a second full corpus read per call.
        self._norms2 = None
        self._inv_norms = None
        self._tile_summary = None
        self._tile_summary_norm = None
        self._prune_tile_n = None

    def norms2(self) -> jax.Array:
        """Per-row squared L2 norms, computed once and cached."""
        if self._norms2 is None:
            r = self.rows.astype(jnp.float32)
            self._norms2 = jnp.sum(r * r, axis=1)
        return self._norms2

    def inv_norms(self) -> jax.Array:
        """Per-row guarded inverse norms (zero-norm -> 0.0), cached."""
        if self._inv_norms is None:
            from innr_tpu.kernels.knn import inv_norms as _inv

            self._inv_norms = _inv(self.rows)
        return self._inv_norms

    def set_prune_tile_n(self, tile_n) -> "VerticalBatch":
        """Override the pruning tile height for this corpus (layout knob).

        The default (``pruned_tile_n``, VMEM-budget-sized) assumes
        clusters span several tiles; corpora whose natural cluster size
        is SMALLER than a tile cannot prune at all (tile radii approach
        the inter-center distance — measured envelope boundary). Setting
        a smaller tile height trades grid steps for coherence: pass your
        cluster size (rounded up to a lane multiple) to re-enable
        pruning on fine-grained corpora. Exactness never depends on this
        — any tile height returns bit-identical results. ``None``
        restores the default. Clears the cached summaries; returns self.
        """
        from innr_tpu.kernels.pruned_knn import pruned_tile_n
        from innr_tpu.utils.padding import round_up

        if tile_n is not None:
            tile_n = int(tile_n)
            if tile_n <= 0:
                raise ContractError(
                    "set_prune_tile_n: tile_n must be positive or None"
                )
            cap = pruned_tile_n(self.num_vectors, self.dimension,
                                self.rows.dtype)
            tile_n = min(round_up(tile_n, 128), cap)
        self._prune_tile_n = tile_n
        self._tile_summary = None
        self._tile_summary_norm = None
        return self

    def _tile_n(self) -> int:
        from innr_tpu.kernels.pruned_knn import pruned_tile_n

        if self._prune_tile_n is not None:
            return self._prune_tile_n
        return pruned_tile_n(self.num_vectors, self.dimension,
                             self.rows.dtype)

    def tile_summary(self, normalized: bool = False):
        """Per-HBM-tile (centroid, radius) bounds for tile-skip pruning
        (:mod:`innr_tpu.prune`), built lazily in one corpus pass and
        cached. Powers ``batch_knn*(..., prune=True)``,
        :func:`batch_knn_adaptive` and :func:`batch_l2_squared_pruning`
        on large corpora. ``normalized=True``: the unit-row summary the
        cosine pruned scan plans against (cached separately). Tile
        height: :meth:`set_prune_tile_n` override, else ``pruned_tile_n``."""
        from innr_tpu.prune import build_tile_summary

        if normalized:
            if self._tile_summary_norm is None:
                self._tile_summary_norm = build_tile_summary(
                    self.rows, self._tile_n(), normalized=True
                )
            return self._tile_summary_norm
        if self._tile_summary is None:
            self._tile_summary = build_tile_summary(self.rows, self._tile_n())
        return self._tile_summary

    def cluster_reorder(self, n_clusters: int = 256, n_iters: int = 5,
                        seed: int = 0, sample: int = 65536):
        """IVF-style layout pass for ``prune=True``: returns ``(reordered
        VerticalBatch, perm)`` where ``perm`` is the (N,) int32 device
        permutation (``new.rows[i] == self.rows[perm[i]]`` — map a kNN
        index ``j`` on the new batch back as ``perm[j]``).

        Everything runs on device (:func:`innr_tpu.prune.cluster_reorder`:
        sampled k-means++ fit, full-corpus assign, stable argsort, row
        gather — no host round-trip of any N-sized array; ~10
        scan-equivalents at 10M x 128, measured), and the new batch's
        pruning tile height is set automatically from the measured
        cluster-size distribution (:func:`innr_tpu.prune.suggest_tile_n`),
        so fine-grained corpora prune without the manual
        :meth:`set_prune_tile_n` knob. Correctness never depends on the
        layout — pruned scans are exact under any order — only the
        achievable HBM elision does."""
        from innr_tpu.prune import cluster_reorder, suggest_tile_n

        reordered, perm, sizes = cluster_reorder(
            self.rows, n_clusters=n_clusters, n_iters=n_iters, seed=seed,
            sample=sample,
        )
        out = VerticalBatch(reordered, dtype=self.rows.dtype)
        out.set_prune_tile_n(
            suggest_tile_n(sizes, self.num_vectors, self.dimension,
                           self.rows.dtype)
        )
        return out, perm

    # -- constructors (reference src/batch.rs:103/138/167) ------------------

    @classmethod
    def from_rows(cls, vectors) -> "VerticalBatch":
        """Build from a sequence of equal-length vectors (row-major)."""
        if isinstance(vectors, (jnp.ndarray, np.ndarray)):
            # The ctor validates 2-D; a 1-D/3-D ndarray is a contract
            # violation, never a "sequence of scalar vectors".
            return cls(jnp.asarray(vectors, dtype=jnp.float32))
        vectors = list(vectors)
        if not vectors:
            return cls(jnp.zeros((0, 0), dtype=jnp.float32))
        dim = len(vectors[0])
        for v in vectors:
            if len(v) != dim:
                raise ContractError("VerticalBatch: inconsistent vector dimension")
        return cls(jnp.asarray(np.asarray(vectors, dtype=np.float32)))

    @classmethod
    def from_slices(cls, vectors) -> "VerticalBatch":
        """Alias of :meth:`from_rows` (reference ``src/batch.rs:138``)."""
        return cls.from_rows(vectors)

    @classmethod
    def from_flat(cls, data, num_vectors: int, dimension: int) -> "VerticalBatch":
        """Build from flat row-major data (reference ``src/batch.rs:167``)."""
        flat = np.asarray(data, dtype=np.float32).reshape(-1)
        if flat.size != num_vectors * dimension:
            raise ContractError(
                f"VerticalBatch.from_flat: {flat.size} values != "
                f"{num_vectors} x {dimension}"
            )
        return cls(jnp.asarray(flat.reshape(num_vectors, dimension)))

    # -- accessors -----------------------------------------------------------

    @property
    def num_vectors(self) -> int:
        return int(self.rows.shape[0])

    @property
    def dimension(self) -> int:
        return int(self.rows.shape[1])

    def get(self, dim: int, vec_idx: int) -> float:
        """Value at (dimension, vector_index) — reference argument order."""
        return float(self.rows[vec_idx, dim])

    def dimension_slice(self, dim: int) -> jax.Array:
        """One dimension across all vectors (reference ``src/batch.rs:193``)."""
        return self.rows[:, dim]

    def data(self) -> np.ndarray:
        """Flat data in the reference's dimension-major serialization format
        (``data[d * num_vectors + i]``, reference ``src/batch.rs:212``)."""
        return np.asarray(self.rows).T.reshape(-1)

    def extract_vector(self, vec_idx: int) -> jax.Array:
        return self.rows[vec_idx]

    def __repr__(self) -> str:  # pragma: no cover
        return f"VerticalBatch(num_vectors={self.num_vectors}, dimension={self.dimension})"


@dataclass
class BatchKnnResult:
    """kNN result (reference ``src/batch.rs:369``). Score meaning matches the
    producing function: L2^2 for ``batch_knn``/``adaptive``/``reordered``/
    ``filtered`` (lower = closer), similarity for ``dot``/``cosine``
    (higher = more similar)."""

    indices: np.ndarray
    scores: np.ndarray


# ---------------------------------------------------------------------------
# jit'd score kernels
# ---------------------------------------------------------------------------

@jax.jit
def _l2sq_scores(q: jax.Array, rows: jax.Array) -> jax.Array:
    d = rows.astype(jnp.float32) - q[None, :]
    return jnp.sum(d * d, axis=1)


@jax.jit
def _l2sq_scores_decomposed(q: jax.Array, rows: jax.Array,
                            norms2: jax.Array) -> jax.Array:
    """L2^2 via the MXU decomposition ``norms2 - 2 q.r + ||q||^2`` — the
    same formula the fused/pruned Pallas scans use, so threshold-survivor
    membership cannot flip across the MIN_ROWS_PALLAS dispatch boundary on
    formula grounds (advisor r3; remaining differences are matmul
    reassociation ulps only)."""
    dots = jnp.matmul(
        rows.astype(jnp.float32), q,
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    qq = jnp.sum(q.astype(jnp.float32) * q)
    return norms2 - 2.0 * dots + qq


@jax.jit
def _dot_scores(q: jax.Array, rows: jax.Array) -> jax.Array:
    return jnp.matmul(
        rows.astype(jnp.float32), q,
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )


@jax.jit
def _norms(rows: jax.Array) -> jax.Array:
    r = rows.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(r * r, axis=1))


@jax.jit
def _cosine_scores(q: jax.Array, rows: jax.Array, norms: jax.Array) -> jax.Array:
    dots = jnp.matmul(
        rows.astype(jnp.float32), q,
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    qn = jnp.sqrt(jnp.sum(q * q))
    denom = qn * norms
    ok = (qn > NORM_EPSILON) & (norms > NORM_EPSILON)
    return jnp.where(ok, dots / jnp.where(ok, denom, 1.0), 0.0)


@partial(jax.jit, static_argnames=("k",))
def _knn_l2(q: jax.Array, rows: jax.Array, k: int):
    return top_k_total(_l2sq_scores(q, rows), k, largest=False)


@partial(jax.jit, static_argnames=("k",))
def _knn_dot(q: jax.Array, rows: jax.Array, k: int):
    return top_k_total(_dot_scores(q, rows), k, largest=True)


@partial(jax.jit, static_argnames=("k",))
def _knn_dot_multi(qs: jax.Array, rows: jax.Array, k: int):
    scores = jnp.matmul(
        qs, rows.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    return top_k_total(scores, k, largest=True)


@partial(jax.jit, static_argnames=("k",))
def _knn_l2_multi(qs: jax.Array, rows: jax.Array, k: int):
    d = rows[None, :, :].astype(jnp.float32) - qs[:, None, :]
    return top_k_total(jnp.sum(d * d, axis=2), k, largest=False)


@partial(jax.jit, static_argnames=("k",))
def _knn_cosine(q: jax.Array, rows: jax.Array, k: int):
    scores = _cosine_scores(q, rows, _norms(rows))
    return top_k_total(scores, k, largest=True)


@partial(jax.jit, static_argnames=("k",))
def _knn_cosine_multi(qs: jax.Array, rows: jax.Array, k: int):
    norms = _norms(rows)
    dots = jnp.matmul(
        qs, rows.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    qn = jnp.sqrt(jnp.sum(qs * qs, axis=1, keepdims=True))
    denom = qn * norms[None, :]
    ok = (qn > NORM_EPSILON) & (norms[None, :] > NORM_EPSILON)
    scores = jnp.where(ok, dots / jnp.where(ok, denom, 1.0), 0.0)
    return top_k_total(scores, k, largest=True)


@partial(jax.jit, static_argnames=("k",))
def _knn_l2_masked(qs: jax.Array, rows: jax.Array, mask: jax.Array, k: int):
    """Top-k smallest L2^2 among rows where ``mask`` for a (Q, D) query
    batch; non-passing rows get the maximal int32 key so they sort
    strictly last."""
    d = rows[None, :, :] - qs[:, None, :]
    dists = jnp.sum(d * d, axis=2)
    keys = total_order_key_f32(dists)
    keys = jnp.where(mask[None, :], keys, jnp.iinfo(jnp.int32).max)
    _, idx = jax.lax.top_k(~keys, k)
    return jnp.take_along_axis(dists, idx, axis=1), idx


@partial(jax.jit, static_argnames=("k", "warmup_dims"))
def _knn_adaptive(qs: jax.Array, rows: jax.Array, k: int, warmup_dims: int):
    """Two-phase adaptive kNN for a (Q, D) query batch
    (see :func:`batch_knn_adaptive`)."""
    dim = rows.shape[1]
    scale = jnp.float32(dim) / jnp.float32(warmup_dims)

    # Phase 1: warmup over the first warmup_dims dimensions (one MXU pass).
    dw = rows[None, :, :warmup_dims] - qs[:, None, :warmup_dims]
    partial_d = jnp.sum(dw * dw, axis=2)  # (Q, N)
    kth_vals, _ = top_k_total(partial_d, k, largest=False)
    threshold = kth_vals[:, -1:] * scale  # (Q, 1)
    # Inverted gate so NaN warmup partials stay alive, matching the
    # reference's "estimated > threshold * 1.5 -> prune" (false for NaN,
    # src/batch.rs:474-488).
    alive = ~(partial_d * scale > threshold * 1.5)

    # Phase 2: exact distances; the static-threshold prune
    # (full <= threshold) is exactly the reference's per-dimension
    # monotone-accumulation prune before re-tightening.
    d = rows[None, :, :] - qs[:, None, :]
    full = jnp.sum(d * d, axis=2)  # (Q, N)
    alive = alive & ~(full > threshold)

    keys = total_order_key_f32(full)
    keys = jnp.where(alive, keys, jnp.iinfo(jnp.int32).max)
    _, idx = jax.lax.top_k(~keys, k)
    return jnp.take_along_axis(full, idx, axis=1), idx, alive


# ---------------------------------------------------------------------------
# public batch scans
# ---------------------------------------------------------------------------

def _check_query(query, batch: VerticalBatch, op: str, allow_multi: bool = False) -> jax.Array:
    q = jnp.asarray(query, dtype=jnp.float32)
    ok_rank = q.ndim == 1 or (allow_multi and q.ndim == 2)
    if not ok_rank or q.shape[-1] != batch.dimension:
        raise ContractError(
            f"innr_tpu::{op}: query shape {q.shape} incompatible with batch "
            f"dimension {batch.dimension}"
        )
    return q


def batch_l2_squared(query, batch: VerticalBatch) -> jax.Array:
    """Squared L2 from query to every vector (reference ``src/batch.rs:236``)."""
    q = _check_query(query, batch, "batch_l2_squared")
    return _l2sq_scores(q, batch.rows)


def batch_l2_squared_into(query, batch: VerticalBatch) -> jax.Array:
    """Alias of :func:`batch_l2_squared`; buffer reuse is XLA's job here."""
    return batch_l2_squared(query, batch)


def batch_dot(query, batch: VerticalBatch) -> jax.Array:
    """Dot products (one MXU matvec; reference ``src/batch.rs:270``)."""
    q = _check_query(query, batch, "batch_dot")
    return _dot_scores(q, batch.rows)


def batch_dot_into(query, batch: VerticalBatch) -> jax.Array:
    """Alias of :func:`batch_dot` (reference ``src/batch.rs:284``)."""
    return batch_dot(query, batch)


def batch_norms(batch: VerticalBatch) -> jax.Array:
    """Per-vector L2 norms (reference ``src/batch.rs:652``)."""
    return _norms(batch.rows)


def batch_norms_into(batch: VerticalBatch) -> jax.Array:
    """Alias of :func:`batch_norms`."""
    return batch_norms(batch)


def batch_cosine(query, batch: VerticalBatch, norms=None) -> jax.Array:
    """Cosine similarities with precomputed norms
    (reference ``src/batch.rs:679``). Zero query norm -> all zeros; zero
    vector norm -> 0.0 for that vector."""
    q = _check_query(query, batch, "batch_cosine")
    if norms is None:
        norms = _norms(batch.rows)
    norms = jnp.asarray(norms, dtype=jnp.float32)
    if norms.shape[0] != batch.num_vectors:
        raise ContractError(
            f"innr_tpu::batch_cosine: norms length {norms.shape[0]} != "
            f"num_vectors {batch.num_vectors}"
        )
    return _cosine_scores(q, batch.rows, norms)


def batch_cosine_into(query, batch: VerticalBatch, norms=None) -> jax.Array:
    """Alias of :func:`batch_cosine`."""
    return batch_cosine(query, batch, norms)


def batch_l2_squared_pruning(
    query, batch: VerticalBatch, threshold: float
) -> tuple[np.ndarray, np.ndarray]:
    """Indices and distances of vectors with L2^2 <= threshold
    (reference ``src/batch.rs:320``).

    The reference prunes per-dimension as soon as the monotone partial sum
    exceeds ``threshold``; its survivor set is therefore exactly
    ``{i : full_dist[i] <= threshold}``. On TPU a small corpus is one
    fused full pass + filter; a large corpus runs the tile-skipping
    threshold scan (:mod:`innr_tpu.kernels.pruned_knn`) — HBM tiles whose
    centroid/radius lower bound exceeds the threshold are never read,
    which is the reference's early-exit realized at the bandwidth level.

    Both arms score with the same ``norms^2 - 2 q.r + ||q||^2`` MXU
    decomposition, so survivor membership agrees across the corpus-size
    dispatch boundary up to matmul-reassociation ulps (a row whose exact
    distance ties the threshold to the last ulp may differ between any two
    accumulation orders — the reference's sequential partial sums
    included). Returns ``(indices, distances)``.
    """
    q = _check_query(query, batch, "batch_l2_squared_pruning")
    if _use_fused(batch.num_vectors):
        from innr_tpu.kernels.pruned_knn import l2_squared_pruning_scan

        dists = np.asarray(
            l2_squared_pruning_scan(
                q, batch.rows, batch.norms2(), batch.tile_summary(),
                float(threshold),
            )
        )
    else:
        dists = np.asarray(
            _l2sq_scores_decomposed(q, batch.rows, batch.norms2())
        )
    keep = ~(dists > np.float32(threshold))  # NaN distances are kept out
    keep &= ~np.isnan(dists)
    idx = np.nonzero(keep)[0]
    return idx, dists[idx]


def batch_dimension_variance(batch: VerticalBatch) -> jax.Array:
    """Per-dimension population variance (reference ``src/batch.rs:561``)."""
    if batch.num_vectors <= 1 or batch.dimension == 0:
        return jnp.zeros((batch.dimension,), dtype=jnp.float32)
    mean = jnp.mean(batch.rows, axis=0)
    return jnp.mean((batch.rows - mean[None, :]) ** 2, axis=0)


# ---------------------------------------------------------------------------
# kNN family
# ---------------------------------------------------------------------------

def _empty_result(q=None) -> BatchKnnResult:
    """Empty result; shaped (Q, 0) for a 2-D query batch so per-query
    indexing works on the k=0 / empty-corpus edge."""
    shape = (0,) if q is None or getattr(q, "ndim", 1) == 1 else (int(q.shape[0]), 0)
    return BatchKnnResult(
        indices=np.zeros(shape, dtype=np.int64),
        scores=np.zeros(shape, dtype=np.float32),
    )


def _result(vals, idx) -> BatchKnnResult:
    # ONE device_get for both arrays: sequential np.asarray fetches cost
    # a full host<->device round trip EACH (~35 ms through the axon relay
    # — measured round 5: 69 ms for two asarray vs 43 ms for the pair),
    # which dominated small-result searches.
    vals, idx = jax.device_get((vals, idx))
    return BatchKnnResult(
        indices=np.asarray(idx, dtype=np.int64),
        scores=np.asarray(vals, dtype=np.float32),
    )


def batch_knn(query, batch: VerticalBatch, k: int, prune: bool = False) -> BatchKnnResult:
    """Exact k nearest neighbors by squared L2 (reference ``src/batch.rs:385``).

    Scores ascending. Selection is total-order top-k, equivalent to feeding
    every candidate through :class:`innr_tpu.ops.topk.TopK`.

    TPU-native extensions: ``query`` may be a (Q, D) batch — all Q queries
    share one corpus scan (one kernel launch on the fused path) and the
    result arrays are (Q, k). ``prune=True`` runs the tile-skipping scan
    (:mod:`innr_tpu.prune`): identical exact results, but HBM tiles whose
    centroid/radius bound proves them loser-only are never read — a real
    bandwidth win on tile-coherent corpora.
    """
    q = _check_query(query, batch, "batch_knn", allow_multi=True)
    if batch.num_vectors == 0 or k == 0:
        return _empty_result(q)
    k = min(int(k), batch.num_vectors)
    if _use_fused(batch.num_vectors, k):
        from innr_tpu.kernels import knn as _kernels

        if prune:
            from innr_tpu.kernels.pruned_knn import fused_knn_l2_pruned_batch

            qs = q if q.ndim == 2 else q[None, :]
            vals, idx = fused_knn_l2_pruned_batch(
                qs, batch.rows, batch.tile_summary(), k, norms2=batch.norms2()
            )
            if q.ndim == 1:
                vals, idx = vals[0], idx[0]
        elif q.ndim == 2:
            vals, idx = _kernels.fused_knn_l2_batch(
                q, batch.rows, k, norms2=batch.norms2()
            )
        else:
            vals, idx = _kernels.fused_knn_l2(
                q, batch.rows, k, norms2=batch.norms2()
            )
    elif q.ndim == 2:
        vals, idx = _knn_l2_multi(q, batch.rows, k)
    else:
        vals, idx = _knn_l2(q, batch.rows, k)
    return _result(vals, idx)


def batch_knn_dot(query, batch: VerticalBatch, k: int, prune: bool = False) -> BatchKnnResult:
    """Top-k by dot product — MIPS (reference ``src/batch.rs:731``).

    Scores descending. NaN scores sort first, matching the reference's
    descending ``total_cmp`` sort.

    TPU-native extensions: ``query`` may be a (Q, D) batch — all Q queries
    share one corpus scan (one MXU matmul / one fused kernel launch) and
    the result arrays are (Q, k). ``prune=True``: tile-skipping scan —
    exact same results, provably-losing HBM tiles never read (see
    :func:`batch_knn`).
    """
    q = _check_query(query, batch, "batch_knn_dot", allow_multi=True)
    if batch.num_vectors == 0 or k == 0:
        return _empty_result(q)
    k = min(int(k), batch.num_vectors)
    if _use_fused(batch.num_vectors, k):
        from innr_tpu.kernels import knn as _kernels

        if prune:
            from innr_tpu.kernels.pruned_knn import fused_knn_dot_pruned_batch

            qs = q if q.ndim == 2 else q[None, :]
            vals, idx = fused_knn_dot_pruned_batch(
                qs, batch.rows, batch.tile_summary(), k
            )
            if q.ndim == 1:
                vals, idx = vals[0], idx[0]
        elif q.ndim == 2:
            vals, idx = _kernels.fused_knn_dot_batch(q, batch.rows, k)
        else:
            vals, idx = _kernels.fused_knn_dot(q, batch.rows, k)
    elif q.ndim == 2:
        vals, idx = _knn_dot_multi(q, batch.rows, k)
    else:
        vals, idx = _knn_dot(q, batch.rows, k)
    return _result(vals, idx)


def batch_knn_cosine(query, batch: VerticalBatch, k: int, prune: bool = False) -> BatchKnnResult:
    """Top-k by cosine similarity (reference ``src/batch.rs:766``).

    Precomputes corpus norms once, then one MXU matvec (the fused Pallas
    scan streams inverse norms alongside the corpus for large N). Scores
    descending. A zero-norm query scores everything 0.0 (both paths; the
    fused scan pre-normalizes queries on-device, so there is no host sync).

    TPU-native extensions: ``query`` may be a (Q, D) batch — all Q queries
    share one corpus scan and the result arrays are (Q, k). ``prune=True``:
    tile-skipping scan over unit-row bounds — exact same results,
    provably-losing HBM tiles never read (see :func:`batch_knn`).
    """
    q = _check_query(query, batch, "batch_knn_cosine", allow_multi=True)
    if batch.num_vectors == 0 or k == 0:
        return _empty_result(q)
    k = min(int(k), batch.num_vectors)
    if _use_fused(batch.num_vectors, k):
        from innr_tpu.kernels import knn as _kernels

        if prune:
            from innr_tpu.kernels.pruned_knn import (
                fused_knn_cosine_pruned_batch,
            )

            qs = q if q.ndim == 2 else q[None, :]
            vals, idx = fused_knn_cosine_pruned_batch(
                qs, batch.rows, batch.tile_summary(normalized=True), k,
                inv=batch.inv_norms(),
            )
            if q.ndim == 1:
                vals, idx = vals[0], idx[0]
        elif q.ndim == 1:
            q = q[None, :]
            vals, idx = _kernels.fused_knn_cosine_batch(
                q, batch.rows, k, inv=batch.inv_norms()
            )
            vals, idx = vals[0], idx[0]
        else:
            vals, idx = _kernels.fused_knn_cosine_batch(
                q, batch.rows, k, inv=batch.inv_norms()
            )
    elif q.ndim == 2:
        vals, idx = _knn_cosine_multi(q, batch.rows, k)
    else:
        vals, idx = _knn_cosine(q, batch.rows, k)
    return _result(vals, idx)


def batch_knn_filtered(query, batch: VerticalBatch, k: int, predicate) -> BatchKnnResult:
    """kNN with predicate pushdown (reference ``src/batch.rs:809``).

    ``predicate`` is either a callable ``index -> bool`` (evaluated on host,
    as the reference does) or a precomputed boolean mask array of length
    ``num_vectors`` — the TPU-native form, since a mask is what the fused
    kernel consumes. Indices refer to the original batch. Returns at most
    ``min(k, num_passing)`` results.

    TPU-native extensions: ``query`` may be a (Q, D) batch (result arrays
    (Q, k)); large corpora run the fused streaming scan with the predicate
    pushed down into the kernel.
    """
    q = _check_query(query, batch, "batch_knn_filtered", allow_multi=True)
    if batch.num_vectors == 0 or k == 0:
        return _empty_result(q)

    if callable(predicate):
        mask = np.fromiter(
            (bool(predicate(i)) for i in range(batch.num_vectors)),
            dtype=bool,
            count=batch.num_vectors,
        )
    else:
        mask = np.asarray(predicate, dtype=bool)
        if mask.shape != (batch.num_vectors,):
            raise ContractError(
                f"innr_tpu::batch_knn_filtered: mask shape {mask.shape} != "
                f"({batch.num_vectors},)"
            )
    num_passing = int(mask.sum())
    if num_passing == 0:
        return _empty_result(q)
    # k <= num_passing guarantees every selected row passes (non-passing
    # rows sort strictly after ANY passing row, NaN included).
    k = min(int(k), num_passing)
    multi = q.ndim == 2
    qs = q if multi else q[None, :]
    if _use_fused(batch.num_vectors, k):
        from innr_tpu.kernels import knn as _kernels

        vals, idx = _kernels.fused_knn_l2_masked_batch(
            qs, batch.rows, jnp.asarray(mask), k, norms2=batch.norms2()
        )
    else:
        vals, idx = _knn_l2_masked(qs, batch.rows, jnp.asarray(mask), k)
    if not multi:
        vals, idx = vals[0], idx[0]
    return _result(vals, idx)


def _variance_order(batch: VerticalBatch) -> jax.Array:
    """Dimension permutation for the reordered scan: highest population
    variance first (total-order keys flip under ``~``, so argsort-ascending
    of the flipped keys is variance-descending; ties break low-dim-first
    via the stable sort)."""
    variances = batch_dimension_variance(batch)
    return jnp.argsort(~total_order_key_f32(variances), stable=True)


def batch_knn_reordered(query, batch: VerticalBatch, k: int) -> BatchKnnResult:
    """Exact kNN, processing dimensions in decreasing variance order
    (reference ``src/batch.rs:610``).

    Produces the same neighbors as :func:`batch_knn`. On CPU the reordering
    tightens pruning bounds; under XLA the reduction order is the compiler's
    choice, so the permutation is applied for semantic parity (identical
    results up to float association) and the scan itself is one fused pass.

    TPU-native extension: ``query`` may be a (Q, D) batch.
    """
    q = _check_query(query, batch, "batch_knn_reordered", allow_multi=True)
    if batch.num_vectors == 0 or k == 0:
        return _empty_result(q)
    k = min(int(k), batch.num_vectors)
    order = _variance_order(batch)
    if q.ndim == 2:
        vals, idx = _knn_l2_multi(q[:, order], batch.rows[:, order], k)
    else:
        vals, idx = _knn_l2(q[order], batch.rows[:, order], k)
    return _result(vals, idx)


def batch_knn_adaptive(
    query, batch: VerticalBatch, k: int, warmup_dims: int,
    force_adaptive: bool = False,
) -> BatchKnnResult:
    """Adaptive kNN with warmup-extrapolated pruning — **approximate**
    (reference ``src/batch.rs:439``).

    Phase 1 scores the first ``warmup_dims`` dimensions (one narrow MXU
    pass), linearly extrapolates a pruning threshold from the k-th best
    partial distance (x ``dim/warmup``, x1.5 margin), and drops candidates
    whose extrapolated distance exceeds it. Phase 2 computes exact distances
    for survivors and applies the monotone-accumulation prune
    (``full > threshold``), which on TPU collapses to one masked comparison
    because a candidate's partial L2^2 is monotone in the dimension count.

    The data-dependent per-dimension early exit of the CPU version does not
    map to XLA; this keeps the documented *approximation contract* (true
    neighbors pruned in warmup stay pruned) while every survivor's score is
    exact. May return fewer than ``k`` results when pruning is aggressive,
    like the reference. The reference's periodic threshold re-tightening
    only removes additional candidates; we skip it, so this version is
    never less accurate.

    TPU-native extension: ``query`` may be a (Q, D) batch. Result arrays
    are rectangular (Q, k); when a query has fewer than k survivors its
    tail entries carry index ``-1`` and score NaN (per-query trimming
    would be ragged).

    **Dispatch boundary**: corpora with ``num_vectors >=
    config.MIN_ROWS_PALLAS`` run the tile-skipping EXACT scan instead
    (:mod:`innr_tpu.kernels.pruned_knn`): the pruning happens at the HBM
    level (loser-only tiles are never read), warmup extrapolation is
    unnecessary, and — within the documented approximation contract,
    which only permits losing true neighbors — results are simply the
    exact top-k. On that path ``warmup_dims`` is validated but otherwise
    unused, results always fill all k slots (no -1/NaN padding), and the
    latency profile is the pruned scan's, not the two-phase warmup's.
    Pass ``force_adaptive=True`` (or ``config.force_reference(True)``) to
    run the warmup-extrapolation path regardless of corpus size — e.g. to
    exercise its approximation behavior or reproduce reference latencies.
    """
    q = _check_query(query, batch, "batch_knn_adaptive", allow_multi=True)
    if warmup_dims <= 0:
        raise ContractError("innr_tpu::batch_knn_adaptive: warmup_dims must be > 0")
    if batch.num_vectors == 0 or k == 0:
        return _empty_result(q)
    k = min(int(k), batch.num_vectors)
    warmup_dims = min(int(warmup_dims), batch.dimension)
    multi = q.ndim == 2
    qs = q if multi else q[None, :]
    if not force_adaptive and _use_fused(batch.num_vectors, k):
        res = batch_knn(q, batch, k, prune=True)
        return res
    vals, idx, alive = _knn_adaptive(qs, batch.rows, k, warmup_dims)
    vals, idx = np.asarray(vals), np.asarray(idx)
    keep = np.take_along_axis(np.asarray(alive), idx, axis=1)
    if not multi:
        return _result(vals[0][keep[0]], idx[0][keep[0]])
    return BatchKnnResult(
        indices=np.where(keep, idx, -1).astype(np.int64),
        scores=np.where(keep, vals, np.nan).astype(np.float32),
    )


def _use_fused(num_rows: int, k: int = 1) -> bool:
    """Dispatch gate for the Pallas fused kernel (analog of the reference's
    per-module SIMD length thresholds). There is no k cap: beyond the
    kernel's single-pass VMEM budget the fused path runs exclusion-bounded
    multi-pass scans (kernels/knn.py::_fused_knn_multi) — the XLA
    multi-query matmul fallback measured ~30x slower on-chip (PERF.md)."""
    if config.reference_forced():
        return False
    if num_rows < config.MIN_ROWS_PALLAS:
        return False
    try:
        from innr_tpu.kernels import knn as _kernels  # noqa: F401
    except Exception:  # pragma: no cover - kernels always importable
        return False
    return True
