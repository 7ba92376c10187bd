"""Fused packed-corpus kNN: streaming XOR+popcount / sign-agreement scans
with the shared top-k merge.

Layout note: these kernels take the packed corpus **word-major** —
``(W, N)`` uint32 planes, so each VPU lane holds one corpus vector and the
per-vector count is a sublane reduction. This is the PDX columnar insight
of reference ``src/batch.rs:1-59`` reborn where it actually pays on TPU:
bit-packed scans have no MXU contraction to hide the layout, so
dimension-major is the natural vectorization axis. The containers in
:mod:`innr_tpu.ops.binary` / :mod:`innr_tpu.ops.ternary` cache the
transposed planes.

Scores are small integers, used directly as int32 selection keys (negated
for Hamming, where smaller is better) feeding the shared streaming top-k
(:func:`innr_tpu.kernels.knn.update_topk`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from innr_tpu.kernels import should_interpret
from innr_tpu.kernels.knn import (
    _K_LANE,
    init_topk_state,
    masked_global_idx,
    update_topk,
)
from innr_tpu.utils.padding import round_up


def _topk_bytes(n_q: int, k_pad: int) -> int:
    """Scoped-VMEM bytes held by the top-k state: best_keys/best_idx
    scratch plus the two output blocks — four (Q, k_pad) int32 buffers.
    Mirrors kernels/knn.py plan_geometry, which shrinks the corpus-tile
    budget by this amount; un-budgeted it OOMs scoped VMEM at large
    k x Q on silicon, invisibly to CPU interpret runs (advisor r3)."""
    return 16 * n_q * k_pad


def _pick_tile_n(n: int, w: int, k_pad: int = _K_LANE) -> int:
    budget = max(1024 * 1024, 4 * 1024 * 1024 - _topk_bytes(1, k_pad))
    tile = budget // max(w * 4, 1)
    tile = max(512, min(16384, tile))
    return round_up(min(tile, max(n, 128)), 128)


_W_CHUNK = 8  # sublane-aligned word chunk for the mq accumulation


def _ternary_tile_n(n: int, w: int, k_pad: int = _K_LANE) -> int:
    """Ternary tile height: BOTH sign planes stream through VMEM, so the
    per-row word budget is 2w (tested against the budget model in
    tests/test_mutation_hardening.py — an under-modeled factor OOMs the
    16 MB scoped VMEM on silicon, invisibly to CPU interpret runs)."""
    return _pick_tile_n(n, 2 * w, k_pad)


def _ternary_tile_n_mq(n: int, w: int, n_q: int, k_pad: int = _K_LANE) -> int:
    """Multi-query twin: 2w word columns + 5 live (Q, 8, T) chunk
    intermediates (same/diff planes, their popcounts, and the deferred
    sublane accumulator)."""
    return _pick_tile_n_mq(n, 2 * w, n_q, n_live=5, k_pad=k_pad)


def _pick_tile_n_mq(
    n: int, w: int, n_q: int, n_live: int = 2, k_pad: int = _K_LANE
) -> int:
    """Corpus tile for the multi-query kernels. The kernels accumulate
    counts over static 8-word sublane chunks, so the live scoped VMEM per
    corpus lane is the word column (4w bytes), ``n_live`` (Q, 8, T) chunk
    intermediates (binary: XOR + its popcount = 2; ternary: same/diff
    planes + two popcounts = 4), and the (Q, T) running counts (4q) —
    independent of Q x W. (The earlier one-shot (Q, W, T) broadcast both
    OOMed the 16 MB scoped-VMEM limit at Q=32 unbudgeted — measured on
    v5e — and, once budgeted, starved the tile to ~1.3K rows; the tile
    sweep showed mq throughput rising with tile size.) The (Q, k_pad)
    top-k state is subtracted from the budget (see ``_topk_bytes``)."""
    budget = max(
        2 * 1024 * 1024, 8 * 1024 * 1024 - _topk_bytes(n_q, k_pad)
    )
    per_lane = 4 * (w + (n_live * _W_CHUNK + 1) * n_q)
    tile = budget // max(per_lane, 1)
    tile = max(256, min(8192, tile))
    return round_up(min(tile, max(n, 128)), 128)


def _binary_kernel(n_rows, k, q_ref, words_ref, keys_out, idx_out, best_keys, best_idx):
    step = pl.program_id(0)
    tile_n = words_ref.shape[1]

    init_topk_state(best_keys, best_idx)

    # (W, T) tile XOR (W, 1) query -> popcount -> per-vector counts (1, T).
    x = words_ref[:] ^ q_ref[:]
    counts = jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), axis=0, keepdims=True
    )
    keys = -counts  # smaller Hamming = better
    keys, global_idx = masked_global_idx(step, 1, tile_n, n_rows, keys)
    update_topk(keys, global_idx, best_keys, best_idx, k)

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("k",))
def fused_binary_knn(q_words: jax.Array, corpus_words_t: jax.Array, k: int):
    """Top-k smallest bit-Hamming of one packed query against a word-major
    packed corpus.

    ``q_words``: (W,) uint32; ``corpus_words_t``: (W, N) uint32.
    Returns ``(counts (k,) uint32 ascending, indices (k,) int32)``.
    """
    w, n = corpus_words_t.shape
    k_pad = round_up(k, _K_LANE)
    tile_n = _pick_tile_n(n, w, k_pad)
    grid = (-(-n // tile_n),)
    corpus_p = corpus_words_t

    keys, idx = pl.pallas_call(
        functools.partial(_binary_kernel, n, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, k_pad), jnp.int32),
            pltpu.VMEM((1, k_pad), jnp.int32),
        ],
        interpret=should_interpret(),
    )(q_words[:, None], corpus_p)
    return (-keys[0, :k]).astype(jnp.uint32), idx[0, :k]


def _binary_kernel_mq(n_rows, k, q_ref, words_ref, keys_out, idx_out, best_keys, best_idx):
    """Multi-query step: (Q, W, 1) queries x (1, W, T) tile -> (Q, T)
    counts, accumulated over static 8-word sublane chunks so only a
    (Q, 8, T) XOR+popcount is ever live (see ``_pick_tile_n_mq``).

    The sublane reduce is DEFERRED (the slot-kernel trick,
    kernels/slot_knn.py): chunks add their popcounts into a (Q, 8, T)
    accumulator that collapses to (Q, T) once per tile, instead of paying
    a sublane reduction per chunk — on-chip at 30M x 768 bits, Q=16 this
    took the scan from 53.7 to 45.7 ms (roofline 0.55 -> 0.65 vs the
    same-bytes read; bit-identical counts by integer associativity).
    The op stays VPU-bound at Q=16 (~4-5 VPU ops per word per query:
    xor + popcount + widen + add), so like the slot kernel its HBM
    roofline tops out below 1; an unpack-to-±1 + MXU-matmul variant
    measured WORSE (0.55 — the per-bit unpack costs more VPU work than
    the popcount path it replaces; PERF.md round-5)."""
    step = pl.program_id(0)
    n_q = q_ref.shape[0]
    w = words_ref.shape[1]
    tile_n = words_ref.shape[2]

    init_topk_state(best_keys, best_idx)

    w_full = (w // _W_CHUNK) * _W_CHUNK
    acc = jnp.zeros((n_q, _W_CHUNK, tile_n), jnp.int32)
    for w0 in range(0, w_full, _W_CHUNK):
        x = words_ref[:, w0:w0 + _W_CHUNK, :] ^ q_ref[:, w0:w0 + _W_CHUNK, :]
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    counts = jnp.sum(acc, axis=1)  # (Q, T)
    for w0 in range(w_full, w):  # ragged tail (W not a sublane multiple)
        x = words_ref[:, w0:w0 + 1, :] ^ q_ref[:, w0:w0 + 1, :]
        counts = counts + jax.lax.population_count(x).astype(jnp.int32)[:, 0, :]
    keys = -counts  # (Q, T); smaller Hamming = better
    keys, global_idx = masked_global_idx(step, n_q, tile_n, n_rows, keys)
    update_topk(keys, global_idx, best_keys, best_idx, k)

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("k",))
def fused_binary_knn_batch(q_words: jax.Array, corpus_words_t: jax.Array, k: int):
    """Top-k smallest bit-Hamming for a (Q, W) packed query batch against a
    word-major corpus — one kernel launch, one corpus read for all queries.

    Returns ``(counts (Q, k) uint32 ascending, indices (Q, k) int32)``.
    """
    n_q, w = q_words.shape
    _, n = corpus_words_t.shape
    k_pad = round_up(k, _K_LANE)
    tile_n = _pick_tile_n_mq(n, w, n_q, k_pad=k_pad)
    grid = (-(-n // tile_n),)
    corpus_p = corpus_words_t

    keys, idx = pl.pallas_call(
        functools.partial(_binary_kernel_mq, n, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_q, w, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, tile_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_q, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_q, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_q, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_q, k_pad), jnp.int32),
            pltpu.VMEM((n_q, k_pad), jnp.int32),
        ],
        interpret=should_interpret(),
    )(q_words[:, :, None], corpus_p[None, :, :])
    return (-keys[:, :k]).astype(jnp.uint32), idx[:, :k]


def _ternary_kernel(
    n_rows, k, qp_ref, qn_ref, pos_ref, neg_ref, keys_out, idx_out, best_keys, best_idx
):
    step = pl.program_id(0)
    tile_n = pos_ref.shape[1]

    init_topk_state(best_keys, best_idx)

    same = (pos_ref[:] & qp_ref[:]) | (neg_ref[:] & qn_ref[:])
    diff = (pos_ref[:] & qn_ref[:]) | (neg_ref[:] & qp_ref[:])
    dots = jnp.sum(
        jax.lax.population_count(same).astype(jnp.int32)
        - jax.lax.population_count(diff).astype(jnp.int32),
        axis=0,
        keepdims=True,
    )
    keys, global_idx = masked_global_idx(step, 1, tile_n, n_rows, dots)
    update_topk(keys, global_idx, best_keys, best_idx, k)

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("k",))
def fused_ternary_knn(
    qpos: jax.Array, qneg: jax.Array, pos_t: jax.Array, neg_t: jax.Array, k: int
):
    """Top-k largest ternary dots of one packed query against a word-major
    encoded corpus (planes (W, N)).

    Returns ``(dots (k,) int32 descending, indices (k,) int32)``.
    """
    w, n = pos_t.shape
    k_pad = round_up(k, _K_LANE)
    tile_n = _ternary_tile_n(n, w, k_pad)
    grid = (-(-n // tile_n),)
    pos_p, neg_p = pos_t, neg_t

    keys, idx = pl.pallas_call(
        functools.partial(_ternary_kernel, n, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, k_pad), jnp.int32),
            pltpu.VMEM((1, k_pad), jnp.int32),
        ],
        interpret=should_interpret(),
    )(qpos[:, None], qneg[:, None], pos_p, neg_p)
    return keys[0, :k], idx[0, :k]


def _ternary_kernel_mq(
    n_rows, k, qp_ref, qn_ref, pos_ref, neg_ref, keys_out, idx_out, best_keys, best_idx
):
    """Multi-query ternary step: (Q, W, 1) query planes x (1, W, T) corpus
    planes -> (Q, T) sign-agreement dots via AND/OR + popcount, accumulated
    over static 8-word sublane chunks (see ``_pick_tile_n_mq``).

    Deferred sublane reduce, as in the binary/slot mq kernels: chunk
    popcount differences add into a (Q, 8, T) accumulator collapsed once
    per tile (bit-identical dots by integer associativity)."""
    step = pl.program_id(0)
    n_q = qp_ref.shape[0]
    w = pos_ref.shape[1]
    tile_n = pos_ref.shape[2]

    init_topk_state(best_keys, best_idx)

    w_full = (w // _W_CHUNK) * _W_CHUNK
    acc = jnp.zeros((n_q, _W_CHUNK, tile_n), jnp.int32)
    for w0 in range(0, w_full, _W_CHUNK):
        pos_c = pos_ref[:, w0:w0 + _W_CHUNK, :]
        neg_c = neg_ref[:, w0:w0 + _W_CHUNK, :]
        qp_c = qp_ref[:, w0:w0 + _W_CHUNK, :]
        qn_c = qn_ref[:, w0:w0 + _W_CHUNK, :]
        same = (pos_c & qp_c) | (neg_c & qn_c)
        diff = (pos_c & qn_c) | (neg_c & qp_c)
        acc = acc + (
            jax.lax.population_count(same).astype(jnp.int32)
            - jax.lax.population_count(diff).astype(jnp.int32)
        )
    dots = jnp.sum(acc, axis=1)  # (Q, T)
    for w0 in range(w_full, w):  # ragged tail (W not a sublane multiple)
        pos_c, neg_c = pos_ref[:, w0:w0 + 1, :], neg_ref[:, w0:w0 + 1, :]
        qp_c, qn_c = qp_ref[:, w0:w0 + 1, :], qn_ref[:, w0:w0 + 1, :]
        same = (pos_c & qp_c) | (neg_c & qn_c)
        diff = (pos_c & qn_c) | (neg_c & qp_c)
        dots = dots + (
            jax.lax.population_count(same).astype(jnp.int32)
            - jax.lax.population_count(diff).astype(jnp.int32)
        )[:, 0, :]
    keys, global_idx = masked_global_idx(step, n_q, tile_n, n_rows, dots)
    update_topk(keys, global_idx, best_keys, best_idx, k)

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("k",))
def fused_ternary_knn_batch(
    qpos: jax.Array, qneg: jax.Array, pos_t: jax.Array, neg_t: jax.Array, k: int
):
    """Top-k largest ternary dots for a (Q, W) packed query batch — one
    launch, one corpus read for the batch.

    Returns ``(dots (Q, k) int32 descending, indices (Q, k) int32)``.
    """
    n_q, w = qpos.shape
    _, n = pos_t.shape
    k_pad = round_up(k, _K_LANE)
    tile_n = _ternary_tile_n_mq(n, w, n_q, k_pad)
    grid = (-(-n // tile_n),)
    pos_p, neg_p = pos_t, neg_t

    keys, idx = pl.pallas_call(
        functools.partial(_ternary_kernel_mq, n, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_q, w, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, w, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, tile_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, tile_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_q, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_q, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_q, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_q, k_pad), jnp.int32),
            pltpu.VMEM((n_q, k_pad), jnp.int32),
        ],
        interpret=should_interpret(),
    )(qpos[:, :, None], qneg[:, :, None], pos_p[None, :, :], neg_p[None, :, :])
    return keys[:, :k], idx[:, :k]
