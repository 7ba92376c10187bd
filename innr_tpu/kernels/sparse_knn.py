"""Fused sparse-dot kNN: corpus-scale compare-select join + streaming top-k.

The scan-scale sparse retrieval path (`innr_tpu.ops.sparse.sparse_knn`)
originally joined the query into the corpus with a vectorized
``searchsorted`` + verification gathers. Slope-measured on silicon (round
5, launch floor removed): **63 ms of device time per 1M x 32nnz scan vs a
0.5 ms corpus read — roofline 0.007**. Every one of the ~6 binary-search
steps and both verification gathers is a per-element random access, and
TPU has no per-lane gather: XLA serializes them.

The TPU-native join inverts the memory pattern: the query is TINY (tens
of tokens), so its (index, value) pairs sit in SMEM as scalars, and the
join is an unrolled compare-select sweep over the corpus tile — for each
query token ``t``: ``m = where(idx_tile == qi[t], qv[t], m)``. That is
~3 VPU ops per corpus entry per query token, zero gathers, and the MXU
stays free. For Lq <= a few hundred this is compute-bound far above the
gather path (measured ~20x) and the scan pipeline overlaps it with the
HBM stream.

Corpus layout is entry-major ``(L, N)`` (lane = document), the same PDX
inversion as the packed/slot kernels; the (1, k) running best merges via
the shared streaming top-k (:func:`innr_tpu.kernels.knn.update_topk`).

Semantics are exactly :func:`innr_tpu.ops.sparse._join_scores` (reference
``src/sparse.rs:50`` contract): sorted query indices, duplicate query
indices match their FIRST occurrence, sentinel-padded corpus entries
carry value 0.0 and contribute nothing, a NaN value on a *matched* entry
propagates while an unmatched NaN contributes 0.
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
    f32_keys,
    init_topk_state,
    masked_global_idx,
    update_topk,
)
from innr_tpu.utils.padding import pad_axis_to, round_up

# Largest query nnz the unrolled compare-select sweep accepts: ~3*Lq
# vector ops per tile keeps Mosaic compile time and the op count sane;
# longer queries fall back to the XLA join in ops/sparse.py.
MAX_QUERY_NNZ = 256


def _topk_bytes(k_pad: int) -> int:
    return 16 * k_pad  # 2 scratch + 2 output (1, k_pad) i32 buffers


def _pick_tile_n(n: int, l: int, k_pad: int) -> int:
    # Measured scoped-VMEM footprint on silicon: ~130 bytes per (slot,
    # lane) element — far above the naive idx+val+m+matched model (~17),
    # because Mosaic keeps the unrolled compare-select chain's temporaries
    # live across scheduling (a 17L model compiled to 31.9M scoped VMEM at
    # tile 7680, L=32: 2x the 16M limit — compile-time OOM, round 5).
    # Budget 11 MB against the 16 MB scoped limit for headroom.
    budget = max(512 * 1024, 11 * 1024 * 1024 - _topk_bytes(k_pad))
    tile = budget // max(130 * l, 1)
    tile = max(256, min(16384, tile))
    return round_up(min(tile, max(n, 128)), 128)


def _sparse_kernel(n_docs, k, lq, fast, qi_ref, qv_ref, idx_ref, val_ref,
                   keys_out, idx_out, best_keys, best_idx):
    step = pl.program_id(0)
    tile_n = idx_ref.shape[1]

    init_topk_state(best_keys, best_idx)

    # u32 -> i32 is a wrap bijection: equality against the (also wrapped)
    # query indices is unchanged, and i32 is the VPU's native compare.
    idx_tile = idx_ref[:].astype(jnp.int32)  # (L, T)
    val_tile = val_ref[:]                    # (L, T) f32
    m = jnp.zeros_like(val_tile)
    matched = None if fast else jnp.zeros(idx_tile.shape, dtype=jnp.bool_)
    # Reverse sweep: on duplicate query indices the LOWEST t wins (last
    # write), matching _join_scores' leftmost-searchsorted semantics.
    for t in range(lq - 1, -1, -1):
        qi = qi_ref[t]
        qv = qv_ref[t]
        eq = idx_tile == qi
        m = jnp.where(eq, qv, m)
        if not fast:
            matched = matched | eq
    if fast:
        # All-finite corpus (checked once per container): unmatched
        # entries contribute val * 0 == exact 0, so the `matched` tracker
        # — one third of the sweep's VPU ops — is dropped. Measured
        # on-chip at 10M x 32nnz: 42.6 -> ~34 ms (roofline 0.63 -> 0.79).
        scores = jnp.sum(val_tile * m, axis=0, keepdims=True)  # (1, T)
    else:
        # Unmatched entries contribute exactly 0 even for NaN/inf values
        # (the where(matched, ...) of the XLA join); matched entries
        # propagate val * qv including NaN.
        scores = jnp.sum(
            jnp.where(matched, val_tile * m, 0.0), axis=0, keepdims=True
        )  # (1, T)

    keys = f32_keys(scores)
    keys, gidx = masked_global_idx(step, 1, tile_n, n_docs, keys)
    update_topk(keys, gidx, best_keys, best_idx, k)

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "fast"))
def fused_sparse_knn(q_idx: jax.Array, q_val: jax.Array,
                     corpus_idx_t: jax.Array, corpus_val_t: jax.Array,
                     k: int, fast: bool = False):
    """Top-k largest sparse dots of one sorted (Lq,) query against an
    entry-major sparse corpus.

    ``q_idx``: (Lq,) uint32 sorted ascending; ``q_val``: (Lq,) f32;
    ``corpus_idx_t``/``corpus_val_t``: (L, N) uint32 / f32 (the transposed
    :class:`~innr_tpu.ops.sparse.SparseCorpus` arrays). Returns
    ``(scores (k,) f32 descending under IEEE total order, indices (k,)
    int32)`` — identical to the XLA join + ``top_k_total``.

    ``fast=True`` (caller-asserted all-finite corpus values) drops the
    per-token ``matched`` tracker — exact for finite values because
    unmatched entries then contribute ``val * 0 == 0``; a non-finite
    corpus value on an UNMATCHED entry would wrongly poison its document
    score, which is why :func:`innr_tpu.ops.sparse.sparse_knn` gates it
    on the container's cached finiteness check.
    """
    lq = int(q_idx.shape[0])
    l, n = corpus_idx_t.shape
    k_pad = round_up(k, _K_LANE)
    tile_n = _pick_tile_n(n, l, k_pad)
    grid = (-(-n // tile_n),)

    # Query (index, value) scalars ride SMEM whole (f32 SMEM blocks are
    # supported); indices wrap u32 -> i32 to match the tile compare.
    qi = q_idx.astype(jnp.int32)
    qv = q_val.astype(jnp.float32)

    keys, idx = pl.pallas_call(
        functools.partial(_sparse_kernel, n, k, lq, fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((l, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
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
    )(qi, qv, corpus_idx_t, corpus_val_t)

    from innr_tpu.kernels.knn import _invert_total_key

    return _invert_total_key(keys[0, :k]), idx[0, :k]
