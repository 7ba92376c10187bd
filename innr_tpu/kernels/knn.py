"""Fused streaming score + top-k kNN Pallas kernel (multi-query native).

The reference's batch kNN materializes an N-vector of scores and sorts it
(``src/batch.rs:731-752``), with a ``TopK`` tracker whose fast path rejects a
candidate with one compare (``src/topk.rs:96-121``). The TPU-native design
fuses both into the score scan itself and batches queries:

- the grid walks corpus tiles of shape ``(TILE_N, D)``; each step computes a
  ``(Q, TILE_N)`` score tile on the MXU — multiple queries share one corpus
  read, so HBM traffic stays one corpus pass for the whole query batch;
- scores are mapped to int32 *total-order keys* (see
  :mod:`innr_tpu.utils.order`; the map is an involution, so exact f32 scores
  are recovered bit-for-bit from the keys afterwards) — selection becomes
  integer max, which the VPU loves, and ``f32::total_cmp`` NaN semantics
  come for free;
- a ``(Q, k)`` running-best buffer lives in VMEM scratch across grid steps;
  a tile is merged only when some query's best tile key beats that query's
  current k-th best — the vectorized analog of ``TopK``'s one-compare
  reject fast path. A merge costs k row-wise max passes over the tile.

The kernel never writes the (Q, N) score matrix to HBM: traffic is exactly
one read of the corpus per query batch, which is the roofline for this op.

L2 uses the MXU decomposition ``||q-r||^2 = ||q||^2 - 2 q.r + ||r||^2`` with
per-row squared norms streamed alongside the tile; ``||q||^2`` is added back
on the host (a per-query monotone shift that cannot change selection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from innr_tpu.kernels import should_interpret
from innr_tpu.utils.padding import pad_axis_to, round_up

_INT_MIN = jnp.iinfo(jnp.int32).min
_INT_MAX = jnp.iinfo(jnp.int32).max

# Lane width of the running-best buffer. k is padded up to a multiple of
# this (the hardware lane count); the buffer may span several lanes-rows.
_K_LANE = 128
# Per-pass cap on k for one fused scan: bounds the running-best merge cost
# (each insertion shifts the whole (Q, k_pad) buffer). Larger k runs as
# multiple passes with exclusion bounds (see _fused_knn_raw) — never the
# XLA multi-query matmul, which is ~30x slower on-chip (PERF.md). The
# reference TopK has no k cap (src/topk.rs:64); neither does this path.
_K_MAX_PASS = 4096
# VMEM byte budget for the running-best state: 2 scratch + 2 output
# (q_pad, k_pad) int32 buffers = 16 bytes per entry.
_TOPK_VMEM_BUDGET = 6 * 1024 * 1024
# Sublane padding for the query axis: the TPU sublane count for 32-bit
# tiles. A hardware ISA constant, not a tunable — any other value is
# rejected by Mosaic at compile time on silicon and is unobservable
# under the CPU interpreter (excluded from mutation on those grounds).
_Q_TILE = 8
# TPU vector lane count (last-dim tile width). Same hardware-constant
# status as _Q_TILE: Mosaic rejects non-multiples on silicon; the CPU
# interpreter accepts anything, so mutants measure nothing.
_LANE = 128


def single_pass_k(n_q: int) -> int:
    """Largest k one fused pass supports for an ``n_q``-query batch —
    limited by the VMEM running-best buffers and the merge-cost cap."""
    q_pad = round_up(max(n_q, 1), _Q_TILE)
    k_pad = (_TOPK_VMEM_BUDGET // (16 * q_pad)) // _K_LANE * _K_LANE
    return max(_K_LANE, min(_K_MAX_PASS, k_pad))


def _invert_total_key(keys: jax.Array) -> jax.Array:
    """Inverse of ``total_order_key_f32`` (the transform is an involution):
    the select mirrors the encode in ``utils/order.py`` exactly (an
    arithmetic-shift formulation is equivalent but its shift constant is
    clamp-degenerate — unobservable under mutation)."""
    mask = jnp.where(keys < 0, jnp.int32(0x7FFFFFFF), jnp.int32(0))
    return jax.lax.bitcast_convert_type(keys ^ mask, jnp.float32)


def _pick_tile_n(n: int, d: int, budget: int = 4 * 1024 * 1024) -> int:
    """Corpus tile height: big enough to amortize the merge check, small
    enough that the (TILE_N, D) f32 tile + scores fit in VMEM."""
    tile = budget // max(d * 4, 1)
    tile = max(512, min(8192, tile))
    tile = round_up(min(tile, max(n, 8)), 8)
    return tile


def f32_keys(scores: jax.Array) -> jax.Array:
    """f32 scores -> int32 total-order keys (larger key = better). Select
    form for the same reason as ``_invert_total_key`` (and it is the
    exact twin of the encode in ``utils/order.py``)."""
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    sign_mask = jnp.where(bits < 0, jnp.int32(0x7FFFFFFF), jnp.int32(0))
    return bits ^ sign_mask


def init_topk_state(best_keys, best_idx) -> None:
    """Initialize the running-best scratch at grid step 0."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        best_keys[:] = jnp.full_like(best_keys, _INT_MIN)
        best_idx[:] = jnp.zeros_like(best_idx)


def update_topk(keys, global_idx, best_keys, best_idx, k: int) -> None:
    """Merge a (Q, T) tile of int32 keys into the (Q, k_pad) running-best
    scratch. The shared streaming-top-k primitive every fused kNN kernel
    builds on (dense dot/L2, u8 asymmetric, binary Hamming, ternary).

    Two-level fast path, mirroring ``TopK::insert``'s design
    (reference src/topk.rs:96-121):

    1. tile-level reject — one row-max + compare skips the whole tile when
       no query improves (almost every tile in a converged scan);
    2. candidate-level insertion — a while-loop that extracts ONE improving
       candidate per iteration (vectorized across queries) and inserts it
       into the sorted buffer via a shift (``where`` + roll — the
       ``copy_within``/memmove analog). Iterations = the *actual* number of
       top-k updates the tile causes (expected ~1; bounded by k), instead
       of unconditionally paying k selection passes.

    Buffers stay sorted descending by key with the worst-retained candidate
    at lane k-1 (the threshold), exactly the reference's layout inverted
    for "larger key = better".
    """
    n_q = keys.shape[0]
    tile_n = keys.shape[1]
    k_pad = best_keys.shape[1]
    tile_best = jnp.max(keys, axis=1)          # (Q,)
    thresholds = best_keys[:, k - 1]           # (Q,)
    can_improve = jnp.any(tile_best > thresholds)

    @pl.when(can_improve)
    def _merge():
        lanes = jax.lax.broadcasted_iota(jnp.int32, (n_q, tile_n), 1)
        buf_lanes = jax.lax.broadcasted_iota(jnp.int32, (n_q, k_pad), 1)

        def cond(carry):
            ck, bk, bi = carry
            return jnp.any(jnp.max(ck, axis=1) > bk[:, k - 1])

        def body(carry):
            ck, bk, bi = carry
            m = jnp.max(ck, axis=1, keepdims=True)           # (Q, 1)
            improve = m[:, 0] > bk[:, k - 1]                 # (Q,)
            # First occurrence = lowest corpus index (tiles arrive in
            # order): the reference's stable-sort tie-break.
            pos_t = jnp.min(
                jnp.where(ck == m, lanes, _INT_MAX), axis=1, keepdims=True
            )
            sel = lanes == pos_t
            cand_idx = jnp.min(
                jnp.where(sel, global_idx, _INT_MAX), axis=1, keepdims=True
            )
            # Sorted insert AFTER existing equal keys (first lane where
            # bk < m): earlier-inserted = lower corpus index keeps
            # precedence, the reference's stable tie-break
            # (src/topk.rs:173-188, "equal elements pushed toward higher
            # indices").
            ins = jnp.sum((bk >= m).astype(jnp.int32), axis=1, keepdims=True)
            bk_shift = pltpu.roll(bk, 1, axis=1)
            bi_shift = pltpu.roll(bi, 1, axis=1)
            nk = jnp.where(
                buf_lanes < ins, bk, jnp.where(buf_lanes == ins, m, bk_shift)
            )
            ni = jnp.where(
                buf_lanes < ins, bi, jnp.where(buf_lanes == ins, cand_idx, bi_shift)
            )
            imp = improve[:, None]
            bk = jnp.where(imp, nk, bk)
            bi = jnp.where(imp, ni, bi)
            # Consume the extracted candidate only for improving queries.
            ck = jnp.where(sel & imp, _INT_MIN, ck)
            return ck, bk, bi

        _, new_keys, new_idx = jax.lax.while_loop(
            cond, body, (keys, best_keys[:], best_idx[:])
        )
        best_keys[:] = new_keys
        best_idx[:] = new_idx


def masked_global_idx(step, n_q: int, tile_n: int, n_rows: int, keys):
    """Global row indices for a tile; mask padded rows to INT_MIN keys."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_q, tile_n), 1)
    global_idx = step * tile_n + lane
    keys = jnp.where(global_idx < n_rows, keys, _INT_MIN)
    return keys, global_idx


def _knn_kernel(n_rows, k, mode, has_excl, q_ref, rows_ref, *rest):
    """One grid step: score a tile for all queries, merge into the running
    best iff some query can improve. ``mode``: "dot" | "l2" | "cosine"
    (l2 streams per-row squared norms; cosine streams per-row inverse
    norms). ``has_excl``: an extra (2, Q, 128) int32 input carries
    per-query exclusion bounds — candidates at or before (bound_key,
    bound_idx) in the (key desc, idx asc) result order are masked out,
    which is how multi-pass large-k selection resumes after a pass."""
    rest = list(rest)
    norms_ref = rest.pop(0) if mode != "dot" else None
    excl_ref = rest.pop(0) if has_excl else None
    keys_out, idx_out, best_keys, best_idx = rest

    step = pl.program_id(0)
    n_q = q_ref.shape[0]
    tile_n = rows_ref.shape[0]

    init_topk_state(best_keys, best_idx)

    # (Q, TILE_N) score tile on the MXU: contract q (Q, D) with rows (T, D).
    # u8 corpora convert on-chip after the 1-byte/element HBM read — the
    # mixed-precision widen of reference src/arch/x86_64.rs:928.
    from innr_tpu import config

    rows = rows_ref[:]
    qs_tile = q_ref[:]
    dn = (((1,), (1,)), ((), ()))
    if rows.dtype == jnp.bfloat16:
        # bf16 corpus: the MXU multiplies bf16 natively with f32
        # accumulation; halving bytes/element doubles the HBM-bound scan's
        # throughput. Queries join in bf16 (scores carry bf16 input
        # rounding, ~1e-2 relative — the documented half-precision mode).
        # Mosaic rejects multi-pass precision requests on bf16 inputs
        # ("Bad lhs type"), and they would be meaningless anyway.
        scores = jax.lax.dot_general(
            qs_tile.astype(jnp.bfloat16), rows, dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    elif rows.dtype != jnp.float32:
        # u8 corpus: codes 0..255 are EXACT in bf16 (8 mantissa bits), so
        # the mixed f32xu8 dot runs as TWO bf16 MXU passes — query split
        # into hi + lo bf16 halves (~16 query mantissa bits; products are
        # exact, only the f32 accumulation splits) — instead of widening
        # to f32 and paying the 3-pass HIGHEST matmul. On-chip at
        # 4M x 768d the split scan runs at 0.835 of the same-bytes read
        # vs 0.701 for the f32 path (PERF.md round-5); on paper-spec v5e
        # the f32 path is MXU-bound outright (6x bf16 passes x 64
        # FLOPs/byte > the 240 FLOPs/byte MXU:HBM ratio) while split is
        # HBM-bound. Selection is unaffected at realistic score gaps
        # (~1e-5 relative perturbation; differential suites pass at their
        # condition-aware tolerances). Mosaic lacks a direct u8->bf16
        # cast; widen through int32. Non-finite query entries keep their
        # IEEE behavior via the hi term alone (lo is zeroed there:
        # inf - inf would inject NaN into finite-query lanes' sums).
        rows = rows.astype(jnp.int32).astype(jnp.bfloat16)
        q_hi = qs_tile.astype(jnp.bfloat16)
        q_lo = jnp.where(
            jnp.isfinite(qs_tile), qs_tile - q_hi.astype(jnp.float32), 0.0
        ).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            q_hi, rows, dn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            q_lo, rows, dn, preferred_element_type=jnp.float32
        )
    else:
        scores = jax.lax.dot_general(
            qs_tile, rows, dn,
            preferred_element_type=jnp.float32,
            precision=config.matmul_precision(),
        )
    if mode == "l2":
        # L2 decomposition: norms2 - 2 * dot (||q||^2 added on host).
        scores = norms_ref[:] - 2.0 * scores
    elif mode == "l2m":
        # Masked L2: aux row 0 = norms2, row 1 = predicate (0/1).
        scores = norms_ref[0:1, :] - 2.0 * scores
    elif mode == "cosine":
        # dot * (1/||r||); the 1/||q|| factor is a per-query monotone
        # scale applied on the host.
        scores = scores * norms_ref[:]
    elif mode == "cosinem":
        # Masked cosine: aux row 0 = inverse norms, row 1 = predicate.
        scores = scores * norms_ref[0:1, :]
    # "dotm": plain dot scores; aux row 0 IS the predicate.

    keys = f32_keys(scores)
    if mode in ("l2", "l2m"):
        keys = ~keys  # L2: smaller distance = better
    if mode in ("l2m", "cosinem", "dotm"):
        # Predicate pushdown: non-passing rows can never win
        # (reference src/batch.rs:842-845 pins them to f32::MAX). The
        # masked dot/cosine forms exist for IVF containers whose
        # cluster segments are padded to tile boundaries
        # (innr_tpu/ivf.py) — padding rows must never be selected.
        mask_row = norms_ref[0:1, :] if mode == "dotm" else norms_ref[1:, :]
        keys = jnp.where(mask_row > 0.0, keys, _INT_MIN)

    keys, global_idx = masked_global_idx(step, n_q, tile_n, n_rows, keys)
    if has_excl:
        # Resume after a previous pass: keep only candidates strictly
        # AFTER (bound_key, bound_idx) in the (key desc, idx asc) total
        # result order — ties on the bound key resume at the bound index.
        bound_k = excl_ref[0][:, 0:1]
        bound_i = excl_ref[1][:, 0:1]
        keep = (keys < bound_k) | ((keys == bound_k) & (global_idx > bound_i))
        keys = jnp.where(keep, keys, _INT_MIN)
    update_topk(keys, global_idx, best_keys, best_idx, k)

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


def fused_knn_keys_batch(qs: jax.Array, rows: jax.Array, aux, k: int, mode: str):
    """Fused scan returning RAW int32 total-order keys (larger = better for
    every mode; L2 keys come pre-flipped) plus local row indices — the form
    a distributed top-k merge consumes directly (keys from different shards
    compare without decoding). ``aux``: per-row squared norms for "l2",
    per-row inverse norms for "cosine", ``None`` for "dot".

    Any k: beyond the single-pass VMEM cap the scan runs as multiple
    exclusion-bounded passes (one extra corpus read per ``single_pass_k``
    results), never an XLA multi-query matmul."""
    return _fused_knn_multi(qs, rows, aux, k, mode)


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def _fused_knn(qs: jax.Array, rows: jax.Array, aux, k: int, mode: str = "dot"):
    keys, idx = _fused_knn_multi(qs, rows, aux, k, mode)
    if mode in ("l2", "l2m"):
        keys = ~keys
    vals = _invert_total_key(keys)
    return vals, idx


def _fused_knn_multi(qs: jax.Array, rows: jax.Array, aux, k: int, mode: str):
    """Raw-key fused scan for ANY k: a single pass when k fits the VMEM
    running-best budget, else ceil(k / cap) exclusion-bounded passes.

    Pass p collects the next ``cap`` candidates strictly after pass
    p-1's worst (key, idx) in the (key desc, idx asc) result order — the
    buffer's own tie-break — so the concatenation equals a single
    ideal-buffer scan bit-for-bit, at the cost of one corpus read per
    pass. This is the "no k cap" contract of the reference TopK
    (src/topk.rs:64) without giving up the streaming kernel.
    """
    cap = single_pass_k(qs.shape[0])
    if k <= cap:
        return _fused_knn_raw(qs, rows, aux, k, mode, None)
    out_keys, out_idx = [], []
    excl = None
    remaining = k
    while remaining > 0:
        pass_k = min(cap, remaining)
        pk, pi = _fused_knn_raw(qs, rows, aux, pass_k, mode, excl)
        out_keys.append(pk)
        out_idx.append(pi)
        excl = (pk[:, -1], pi[:, -1])
        remaining -= pass_k
    return jnp.concatenate(out_keys, axis=1), jnp.concatenate(out_idx, axis=1)


def plan_geometry(n: int, d: int, dtype, n_q: int, k: int) -> tuple[int, int]:
    """Tile geometry for one fused pass: ``(tile_n, bytes_per_row)``.

    Extracted for testability (the VMEM budget model is contract-bearing:
    a wrong formula scoped-VMEM OOMs only on real silicon, so the model's
    invariants are asserted directly — tests/test_regression_pins.py and
    tests/test_mutation_hardening.py).

    Per-dtype terms: u8 is 1 byte/element in VMEM but the in-kernel widen
    (u8 -> i32 -> f32) materializes ~8 more bytes/element of scoped VMEM —
    budget 9 bytes/element (measured OOM at d=768 multi-query otherwise)
    with an 8 MB budget (throughput peaks at ~1024-row tiles; PERF.md).
    bf16: 2 bytes/element, consumed natively by the MXU. The (Q, T) score
    tile, its int32 keys, and the iota/global-idx tiles add 12 bytes per
    corpus lane per padded query; the running-best state (2 scratch + 2
    output (Q, k_pad) i32 buffers) shrinks the tile budget at large k
    (floor 1 MB keeps tiles viable). tile_n is rounded to 128 — it is the
    LAST block dim of the aux streams and Mosaic requires lane-dim
    divisibility.
    """
    if dtype == jnp.uint8:
        bytes_per_row, budget = d * 9, 8 * 1024 * 1024
    elif dtype == jnp.bfloat16:
        bytes_per_row, budget = d * 2, 4 * 1024 * 1024
    else:
        bytes_per_row, budget = d * 4, 4 * 1024 * 1024
    q_pad_est = round_up(n_q, _Q_TILE)
    bytes_per_row += 12 * q_pad_est
    topk_bytes = 16 * q_pad_est * round_up(k, _K_LANE)
    budget = max(1024 * 1024, budget - topk_bytes)
    tile_n = round_up(
        _pick_tile_n(n, max(bytes_per_row // 4, 1), budget), 128
    )
    return tile_n, bytes_per_row


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def _fused_knn_raw(qs: jax.Array, rows: jax.Array, aux, k: int, mode: str,
                   excl=None):
    n_q, d = qs.shape
    n, _ = rows.shape
    tile_n, _ = plan_geometry(n, d, rows.dtype, n_q, k)
    d_pad = round_up(d, _LANE)
    q_pad = round_up(n_q, _Q_TILE)
    k_pad = round_up(k, _K_LANE)
    # Do NOT pad the corpus row axis: an XLA pad of an (N, D) array is a
    # full HBM copy (read + write of the whole corpus — measured ~40% of
    # total scan time at 10M x 128). Pallas handles the ragged final block;
    # its out-of-range lanes produce garbage scores that masked_global_idx
    # pins to INT_MIN before selection, so results are unaffected.
    rows_p = pad_axis_to(rows, 1, d_pad)
    qs_p = pad_axis_to(pad_axis_to(qs, 0, q_pad), 1, d_pad)
    grid = (-(-n // tile_n),)

    in_specs = [
        pl.BlockSpec((q_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [qs_p, rows_p]
    if mode != "dot":
        aux2 = aux if aux.ndim == 2 else aux[None, :]
        n_aux = aux2.shape[0]
        in_specs.append(
            pl.BlockSpec(
                (n_aux, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        )
        inputs.append(aux2)
    if excl is not None:
        # Per-query exclusion bounds, lane-broadcast to a (2, Q, 128) i32
        # block (plane 0: worst kept key, plane 1: its corpus index).
        bk, bi = excl
        excl_arr = jnp.stack(
            [
                jnp.broadcast_to(bk[:, None].astype(jnp.int32), (n_q, _LANE)),
                jnp.broadcast_to(bi[:, None].astype(jnp.int32), (n_q, _LANE)),
            ]
        )
        excl_arr = pad_axis_to(excl_arr, 1, q_pad)
        # Block dims derive from the array itself (planes, lanes) so the
        # spec can never drift from the operand it describes.
        in_specs.append(
            pl.BlockSpec(
                (excl_arr.shape[0], q_pad, excl_arr.shape[2]),
                lambda i: (0, 0, 0), memory_space=pltpu.VMEM,
            )
        )
        inputs.append(excl_arr)

    kernel = functools.partial(_knn_kernel, n, k, mode, excl is not None)
    keys, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((q_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
        ],
        interpret=should_interpret(),
    )(*inputs)

    return keys[:n_q, :k], idx[:n_q, :k]


def fused_knn_dot(q: jax.Array, rows: jax.Array, k: int):
    """Top-k largest dot products of one query against ``rows``.

    Returns ``(scores, indices)`` descending under IEEE total order,
    identical to the jnp path in :func:`innr_tpu.batch.batch_knn_dot`.
    """
    vals, idx = _fused_knn(q[None, :], rows, None, k, mode="dot")
    return vals[0], idx[0]


def fused_knn_l2(q: jax.Array, rows: jax.Array, k: int, norms2=None):
    """Top-k smallest squared L2 distances of one query — fused scan.

    Scores use the MXU decomposition with ``||q||^2`` added back afterwards
    and are clamped at zero (the direct form is non-negative by
    construction). Pass precomputed ``norms2`` (per-row squared norms) to
    avoid the extra corpus read — the reference's batch_norms precompute.
    """
    if norms2 is None:
        r = rows.astype(jnp.float32)
        norms2 = jnp.sum(r * r, axis=1)
    vals, idx = _fused_knn(q[None, :], rows, norms2, k, mode="l2")
    qq = jnp.sum(q * q)
    return jnp.maximum(vals[0] + qq, 0.0), idx[0]


def fused_knn_l2_masked_batch(
    qs: jax.Array, rows: jax.Array, mask: jax.Array, k: int, norms2=None
):
    """Top-k smallest L2^2 among predicate-passing rows for a (Q, D) query
    batch — predicate pushdown fused into the streaming scan (reference
    batch_knn_filtered, src/batch.rs:809). ``mask``: (N,) boolean; rows
    where it is False can never win. Returns ``(distances (Q, k) ascending
    within the passing set, indices (Q, k))``; when fewer than k rows pass,
    the tail entries are garbage — callers trim to the passing count.
    """
    if norms2 is None:
        r = rows.astype(jnp.float32)
        norms2 = jnp.sum(r * r, axis=1)
    aux = jnp.stack([norms2, mask.astype(jnp.float32)])
    vals, idx = _fused_knn(qs, rows, aux, k, mode="l2m")
    qq = jnp.sum(qs * qs, axis=1, keepdims=True)
    return jnp.maximum(vals + qq, 0.0), idx


def fused_knn_dot_batch(qs: jax.Array, rows: jax.Array, k: int):
    """Top-k MIPS for a (Q, D) query batch in ONE kernel launch.

    All queries share a single corpus read (the multi-query roofline) and a
    single dispatch — essential when per-call latency is non-trivial.
    Returns ``(scores (Q, k), indices (Q, k))``.
    """
    return _fused_knn(qs, rows, None, k, mode="dot")


def fused_knn_l2_batch(qs: jax.Array, rows: jax.Array, k: int, norms2=None):
    """Top-k L2^2 for a (Q, D) query batch in one kernel launch."""
    if norms2 is None:
        r = rows.astype(jnp.float32)
        norms2 = jnp.sum(r * r, axis=1)
    vals, idx = _fused_knn(qs, rows, norms2, k, mode="l2")
    qq = jnp.sum(qs * qs, axis=1, keepdims=True)
    return jnp.maximum(vals + qq, 0.0), idx


def fused_knn_u8_batch(qs: jax.Array, codes: jax.Array, k: int):
    """Top-k mixed dots of f32 queries against a u8-code corpus.

    ``codes`` stays uint8 in HBM (the 4x-bandwidth win of reference
    src/scalar.rs) and widens on-chip inside the kernel. Returns the raw
    *mixed* scores ``sum(q_i * code_i)`` (Q, k) plus indices; callers apply
    the affine correction ``(alpha/255) * mixed + offset * sum(q)`` — a
    per-query monotone map (alpha > 0), so selection is unaffected.
    """
    if codes.dtype != jnp.uint8:
        raise ValueError("fused_knn_u8_batch expects uint8 codes")
    return _fused_knn(qs, codes, None, k, mode="dot")


def _unit_queries(qs: jax.Array) -> jax.Array:
    """Normalize query rows; zero/tiny-norm queries become zero rows so
    every cosine they produce is exactly 0.0 (the reference's zero-norm
    guard), handled inside the fused scan with no host sync."""
    from innr_tpu.config import NORM_EPSILON

    qn = jnp.sqrt(jnp.sum(qs * qs, axis=1, keepdims=True))
    ok = qn > NORM_EPSILON
    return jnp.where(ok, qs / jnp.where(ok, qn, 1.0), 0.0)


def fused_knn_cosine(q: jax.Array, rows: jax.Array, k: int):
    """Top-k by cosine similarity — fused scan with per-row inverse norms
    streamed alongside the corpus tiles.

    Zero-norm corpus rows score exactly 0.0 (the reference guard); the
    query is pre-normalized (zero-norm queries become zero rows, scoring
    everything 0.0), so the whole contract lives on-device.
    """
    vals, idx = fused_knn_cosine_batch(q[None, :], rows, k)
    return vals[0], idx[0]


def inv_norms(rows: jax.Array) -> jax.Array:
    """Per-row guarded inverse norms (zero/tiny-norm rows -> 0.0), the
    cosine kernel's aux stream. Precompute once per corpus."""
    from innr_tpu.config import NORM_EPSILON

    r = rows.astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(r * r, axis=1))
    # ONE strict guard reused for both the select and the divisor (the
    # dense-op pattern): a second `norms > 0` divisor guard would be
    # unobservable — its inf result is discarded by the outer select.
    ok = norms > NORM_EPSILON
    return jnp.where(ok, 1.0 / jnp.where(ok, norms, 1.0), 0.0)


def fused_knn_cosine_batch(qs: jax.Array, rows: jax.Array, k: int, inv=None):
    """Top-k by cosine for a (Q, D) query batch in one kernel launch.

    Queries pre-normalize on-device; per-row inverse norms stream alongside
    the corpus tiles (pass precomputed ``inv`` to skip the extra corpus
    read). Returns ``(scores (Q, k), indices (Q, k))``.
    """
    if inv is None:
        inv = inv_norms(rows)
    return _fused_knn(_unit_queries(qs), rows, inv, k, mode="cosine")
