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

# Lane width of the running-best buffer. k is padded up to this.
_K_PAD = 128
# Sublane padding for the query axis.
_Q_TILE = 8


def _invert_total_key(keys: jax.Array) -> jax.Array:
    """Inverse of ``total_order_key_f32`` (the transform is an involution)."""
    mask = jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(keys, 31), 1
    )
    return jax.lax.bitcast_convert_type(keys ^ mask, jnp.float32)


def _pick_tile_n(n: int, d: int) -> int:
    """Corpus tile height: big enough to amortize the merge check, small
    enough that the (TILE_N, D) f32 tile + scores fit in VMEM."""
    budget = 4 * 1024 * 1024  # bytes of VMEM for the corpus tile
    tile = budget // max(d * 4, 1)
    tile = max(512, min(8192, tile))
    tile = round_up(min(tile, max(n, 8)), 8)
    return tile


def _knn_kernel(n_rows, k, want_norms, q_ref, rows_ref, *rest):
    """One grid step: score a tile for all queries, merge into the running
    best iff some query can improve."""
    if want_norms:
        norms_ref, keys_out, idx_out, best_keys, best_idx = rest
    else:
        norms_ref = None
        keys_out, idx_out, best_keys, best_idx = rest

    step = pl.program_id(0)
    n_q = q_ref.shape[0]
    tile_n = rows_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        best_keys[:] = jnp.full_like(best_keys, _INT_MIN)
        best_idx[:] = jnp.zeros_like(best_idx)

    # (Q, TILE_N) score tile on the MXU: contract q (Q, D) with rows (T, D).
    from innr_tpu import config

    scores = jax.lax.dot_general(
        q_ref[:],
        rows_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    if want_norms:
        # L2 decomposition: norms2 - 2 * dot (||q||^2 added on host).
        scores = norms_ref[:] - 2.0 * scores

    # int32 total-order keys; "larger key = better candidate" uniformly.
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    sign_mask = jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(bits, 31), 1
    )
    keys = bits ^ sign_mask
    if want_norms:
        keys = ~keys  # L2: smaller distance = better

    # Mask padded rows in the final tile.
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_q, tile_n), 1)
    global_idx = step * tile_n + lane
    keys = jnp.where(global_idx < n_rows, keys, _INT_MIN)

    # Reject fast path: skip the merge unless some query improves.
    tile_best = jnp.max(keys, axis=1)          # (Q,)
    thresholds = best_keys[:, k - 1]           # (Q,)
    can_improve = jnp.any(tile_best > thresholds)

    @pl.when(can_improve)
    def _merge():
        # Concat the lane-aligned buffer; slots >= k stay at the INT_MIN
        # sentinel and can never win while >= k real candidates exist.
        combined_keys = jnp.concatenate([best_keys[:], keys], axis=1)
        combined_idx = jnp.concatenate([best_idx[:], global_idx], axis=1)
        width = combined_keys.shape[1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (n_q, width), 1)
        buf_lanes = jax.lax.broadcasted_iota(jnp.int32, (n_q, _K_PAD), 1)

        def select(j, carry):
            ck, nk, ni = carry
            m = jnp.max(ck, axis=1, keepdims=True)  # (Q, 1)
            # First occurrence of the max: buffer entries precede the tile
            # and tiles arrive in index order, so "first" = lowest original
            # index = the reference's stable-sort tie-break.
            pos = jnp.min(
                jnp.where(ck == m, lanes, _INT_MAX), axis=1, keepdims=True
            )
            sel = lanes == pos
            chosen_idx = jnp.min(
                jnp.where(sel, combined_idx, _INT_MAX), axis=1, keepdims=True
            )
            # Vectorized positional write (VMEM refs reject scalar stores).
            nk = jnp.where(buf_lanes == j, m, nk)
            ni = jnp.where(buf_lanes == j, chosen_idx, ni)
            return jnp.where(sel, _INT_MIN, ck), nk, ni

        _, new_keys, new_idx = jax.lax.fori_loop(
            0,
            k,
            select,
            (
                combined_keys,
                jnp.full((n_q, _K_PAD), _INT_MIN, dtype=jnp.int32),
                jnp.zeros((n_q, _K_PAD), dtype=jnp.int32),
            ),
        )
        best_keys[:] = new_keys
        best_idx[:] = new_idx

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "l2"))
def _fused_knn(qs: jax.Array, rows: jax.Array, norms2, k: int, l2: bool):
    n_q, d = qs.shape
    n, _ = rows.shape
    tile_n = _pick_tile_n(n, d)
    n_pad = round_up(n, tile_n)
    d_pad = round_up(d, 128)
    q_pad = round_up(n_q, _Q_TILE)
    rows_p = pad_axis_to(pad_axis_to(rows, 0, n_pad), 1, d_pad)
    qs_p = pad_axis_to(pad_axis_to(qs, 0, q_pad), 1, d_pad)
    grid = (n_pad // tile_n,)

    in_specs = [
        pl.BlockSpec((q_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [qs_p, rows_p]
    if l2:
        norms_p = pad_axis_to(norms2[None, :], 1, n_pad)
        in_specs.append(
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        inputs.append(norms_p)

    kernel = functools.partial(_knn_kernel, n, k, l2)
    keys, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((q_pad, _K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, _K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, _K_PAD), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, _K_PAD), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_pad, _K_PAD), jnp.int32),
            pltpu.VMEM((q_pad, _K_PAD), jnp.int32),
        ],
        interpret=should_interpret(),
    )(*inputs)

    keys = keys[:n_q, :k]
    idx = idx[:n_q, :k]
    if l2:
        keys = ~keys
    vals = _invert_total_key(keys)
    return vals, idx


def _check_k(k: int):
    if k > _K_PAD:
        raise ValueError(f"fused kNN supports k <= {_K_PAD}, got {k}")


def fused_knn_dot(q: jax.Array, rows: jax.Array, k: int):
    """Top-k largest dot products of one query against ``rows``.

    Returns ``(scores, indices)`` descending under IEEE total order,
    identical to the jnp path in :func:`innr_tpu.batch.batch_knn_dot`.
    """
    _check_k(k)
    vals, idx = _fused_knn(q[None, :], rows, None, k, l2=False)
    return vals[0], idx[0]


def fused_knn_l2(q: jax.Array, rows: jax.Array, k: int):
    """Top-k smallest squared L2 distances of one query — fused scan.

    Scores use the MXU decomposition with ``||q||^2`` added back afterwards
    and are clamped at zero (the direct form is non-negative by
    construction).
    """
    _check_k(k)
    norms2 = jnp.sum(rows * rows, axis=1)
    vals, idx = _fused_knn(q[None, :], rows, norms2, k, l2=True)
    qq = jnp.sum(q * q)
    return jnp.maximum(vals[0] + qq, 0.0), idx[0]


def fused_knn_dot_batch(qs: jax.Array, rows: jax.Array, k: int):
    """Top-k MIPS for a (Q, D) query batch in ONE kernel launch.

    All queries share a single corpus read (the multi-query roofline) and a
    single dispatch — essential when per-call latency is non-trivial.
    Returns ``(scores (Q, k), indices (Q, k))``.
    """
    _check_k(k)
    return _fused_knn(qs, rows, None, k, l2=False)


def fused_knn_l2_batch(qs: jax.Array, rows: jax.Array, k: int):
    """Top-k L2^2 for a (Q, D) query batch in one kernel launch."""
    _check_k(k)
    norms2 = jnp.sum(rows * rows, axis=1)
    vals, idx = _fused_knn(qs, rows, norms2, k, l2=True)
    qq = jnp.sum(qs * qs, axis=1, keepdims=True)
    return jnp.maximum(vals + qq, 0.0), idx
