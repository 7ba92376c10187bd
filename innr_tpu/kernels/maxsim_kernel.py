"""Fused streaming MaxSim scorer: late-interaction retrieval over a
multi-vector doc corpus without materializing the pair tensor.

``batch_maxsim``'s einsum materializes (Q, N, Tq, Td) — fine for rerank
shortlists, quadratic-memory for corpus-wide scoring. This kernel streams
doc tiles: per grid step it computes the (docs, Td, Tq) token-interaction
block on the MXU, reduces max-over-doc-tokens then sum-over-query-tokens in
VMEM, and writes only the (N,) scores. The IO shape of FLASH-style fused
MaxSim scoring, built from the same streaming discipline as the kNN kernels.

Masking: padded doc tokens are pinned to -inf before the row-max via a
(N, Td) boolean mask streamed alongside the tile, so ragged documents are
exact, not approximated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from innr_tpu.kernels import should_interpret
from innr_tpu.utils.order import top_k_total
from innr_tpu.utils.padding import LANE, SUBLANE, pad_axis_to, round_up


def _pick_tile_docs(n: int, td: int, d: int) -> int:
    """Doc-tile height. ``td``/``d`` are the PADDED token/dim counts; the
    kernel's live scoped VMEM is ~6x the raw doc tile (tile + pipelining
    copy + the (T, Td, Tq) interaction block and its masked copy — 24.8 MB
    measured at a 4 MB raw tile on v5e), so budget 2 MB of raw tile."""
    budget = 2 * 1024 * 1024
    tile = budget // max(td * d * 4, 1)
    tile = max(8, min(512, tile))
    return round_up(min(tile, max(n, 8)), 8)


def _maxsim_kernel(tq_true, use_mask, q_ref, docs_ref, *rest):
    if use_mask:
        mask_ref, out_ref = rest
    else:
        mask_ref = None
        out_ref = rest[0]

    from innr_tpu import config

    docs = docs_ref[:]  # (TILE_DOCS, Td, D)
    qs_tile = q_ref[:]
    precision = config.matmul_precision()
    if docs.dtype == jnp.bfloat16:
        # bf16 docs: native MXU bf16 with f32 accumulation (Mosaic rejects
        # multi-pass precision on bf16 inputs).
        qs_tile = qs_tile.astype(jnp.bfloat16)
        precision = jax.lax.Precision.DEFAULT
    # Token interactions on the MXU: (TILE_DOCS, Td, Tq).
    pair = jax.lax.dot_general(
        docs,
        qs_tile,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if use_mask:
        # Mask streams as f32: Mosaic cannot reshape i1 vectors
        # (measured on v5e: 'unsupported shape cast' for (T, Td) bool).
        pair = jnp.where(mask_ref[:][:, :, None] > 0.0, pair, -jnp.inf)
    best = jnp.max(pair, axis=1)  # (TILE_DOCS, Tq): per query token best doc token
    # Zero out padded query tokens (q rows beyond tq_true are zero anyway,
    # but a fully-masked doc would give -inf; clamp those to 0 like the
    # reference's empty-doc -> 0.0 contract).
    tq_pad = best.shape[1]
    q_lane = jax.lax.broadcasted_iota(jnp.int32, (1, tq_pad), 1)
    best = jnp.where(q_lane < tq_true, best, 0.0)
    # Clamp ONLY the -inf a fully-masked doc produces (empty-doc -> 0.0
    # contract). NaN and +inf scores propagate, matching batch_maxsim.
    best = jnp.where(best == -jnp.inf, 0.0, best)
    out_ref[:] = jnp.sum(best, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def fused_maxsim_scores(q_tokens: jax.Array, docs: jax.Array, doc_mask=None):
    """MaxSim scores of one token-matrix query against an (N, Td, D) doc
    corpus -> (N,) f32, one streamed pass.

    ``doc_mask``: optional (N, Td) boolean; masked (padded) doc tokens are
    excluded exactly. A document with no valid tokens scores 0.0 (the
    empty-doc contract).
    """
    q_tokens = jnp.asarray(q_tokens, dtype=jnp.float32)
    if getattr(docs, "dtype", None) != jnp.bfloat16:
        docs = jnp.asarray(docs, dtype=jnp.float32)
    tq, d = q_tokens.shape
    n, td, _ = docs.shape

    tile_docs = _pick_tile_docs(n, round_up(td, SUBLANE), round_up(d, LANE))
    # No doc-axis padding: an XLA pad of the corpus is a full HBM copy;
    # Pallas runs a ragged final block and rows past n are sliced away.
    n_pad = round_up(n, tile_docs)
    d_pad = round_up(d, LANE)
    tq_pad = round_up(tq, SUBLANE)
    td_pad = round_up(td, SUBLANE)

    docs_p = pad_axis_to(pad_axis_to(docs, 1, td_pad), 2, d_pad)
    q_p = pad_axis_to(pad_axis_to(q_tokens, 0, tq_pad), 1, d_pad)
    use_mask = doc_mask is not None
    inputs = [q_p, docs_p]
    in_specs = [
        pl.BlockSpec((tq_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (tile_docs, td_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    if use_mask:
        mask = jnp.asarray(doc_mask, dtype=bool)
        mask_p = pad_axis_to(mask, 1, td_pad).astype(jnp.float32)
        inputs.append(mask_p)
        in_specs.append(
            pl.BlockSpec((tile_docs, td_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    elif td_pad != td:
        # Padded doc tokens are zero rows; their dot with any query token is
        # 0, which can only win a max when all real scores are negative.
        # Supply an implicit mask in that case for exactness.
        mask = jnp.ones((n, td), dtype=bool)
        mask_p = pad_axis_to(mask, 1, td_pad).astype(jnp.float32)
        inputs.append(mask_p)
        in_specs.append(
            pl.BlockSpec((tile_docs, td_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        use_mask = True

    out = pl.pallas_call(
        functools.partial(_maxsim_kernel, tq, use_mask),
        grid=(-(-n // tile_docs),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_docs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=should_interpret(),
    )(*inputs)
    return out[:n, 0]


def fused_maxsim_knn(q_tokens: jax.Array, docs: jax.Array, k: int, doc_mask=None):
    """Top-k docs by MaxSim against a token-matrix query — fused scoring
    plus total-order selection. Returns (scores descending, indices)."""
    scores = fused_maxsim_scores(q_tokens, docs, doc_mask)
    return top_k_total(scores, k, largest=True)


def _pick_tile_docs_mq(n: int, td: int, d: int, b: int, tq: int) -> int:
    # Live VMEM per doc (PADDED dims): the (Td, D) token tile plus the
    # (Td, B*Tq) interaction block, each with ~2-3 live copies in the
    # pipeline — same 6x discipline as _pick_tile_docs.
    budget = 2 * 1024 * 1024
    per_doc = 4 * td * (d + b * tq)
    tile = budget // max(per_doc, 1)
    tile = max(8, min(256, tile))
    return round_up(min(tile, max(n, 8)), 8)


def _maxsim_kernel_mq(tq_true, tq_pad, n_b, use_mask, q_ref, docs_ref, *rest):
    """Multi-query step with a FLATTENED (B*Tq, D) query-token matrix —
    the interaction tensor stays 3-D ((TILE, Td, B*Tq); Mosaic rejects 4-D
    dot_general outputs) and the per-query sum is an MXU matmul against a
    group-indicator matrix built from iotas."""
    if use_mask:
        mask_ref, out_ref = rest
    else:
        mask_ref = None
        out_ref = rest[0]

    from innr_tpu import config

    docs = docs_ref[:]  # (TILE_DOCS, Td, D)
    qs_tile = q_ref[:]  # (B*Tq_pad, D)
    precision = config.matmul_precision()
    if docs.dtype == jnp.bfloat16:
        qs_tile = qs_tile.astype(jnp.bfloat16)
        precision = jax.lax.Precision.DEFAULT
    pair = jax.lax.dot_general(
        docs,
        qs_tile,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TILE_DOCS, Td, B*Tq_pad)
    if use_mask:
        pair = jnp.where(mask_ref[:][:, :, None] > 0.0, pair, -jnp.inf)
    best = jnp.max(pair, axis=1)  # (TILE_DOCS, B*Tq_pad)
    btq = best.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, btq), 1)
    best = jnp.where(col % tq_pad < tq_true, best, 0.0)
    best = jnp.where(best == -jnp.inf, 0.0, best)
    # Per-query sum as (TILE, B*Tq) @ (B*Tq, B) group-indicator matmul.
    r = jax.lax.broadcasted_iota(jnp.int32, (btq, n_b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (btq, n_b), 1)
    sel = (r // tq_pad == c).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        best, sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )  # (TILE_DOCS, B)


@functools.partial(jax.jit, static_argnames=())
def fused_maxsim_scores_batch(q_batch: jax.Array, docs: jax.Array, doc_mask=None):
    """MaxSim scores of a (B, Tq, D) query batch against an (N, Td, D) doc
    corpus -> (B, N) f32 in ONE streamed corpus pass (all queries share the
    doc-token HBM read — the multi-query serving shape).

    All queries must share one true token count Tq (pad queries to a
    rectangle; padded all-zero token rows contribute max(0, ...) >= 0 to
    the sum exactly as zero rows do in ``batch_maxsim`` without a query
    mask — pass pre-trimmed queries or equal-length queries for exactness).
    """
    q_batch = jnp.asarray(q_batch, dtype=jnp.float32)
    if getattr(docs, "dtype", None) != jnp.bfloat16:
        docs = jnp.asarray(docs, dtype=jnp.float32)
    b, tq, d = q_batch.shape
    n, td, _ = docs.shape

    tile_docs = _pick_tile_docs_mq(
        n, round_up(td, SUBLANE), round_up(d, LANE), b, round_up(tq, SUBLANE)
    )
    d_pad = round_up(d, LANE)
    tq_pad = round_up(tq, SUBLANE)
    td_pad = round_up(td, SUBLANE)

    docs_p = pad_axis_to(pad_axis_to(docs, 1, td_pad), 2, d_pad)
    # Flatten the query batch into one (B*Tq_pad, D) token matrix so the
    # in-kernel interaction tensor stays 3-D (Mosaic constraint).
    q_p = pad_axis_to(pad_axis_to(q_batch, 1, tq_pad), 2, d_pad).reshape(
        b * tq_pad, d_pad
    )
    use_mask = doc_mask is not None or td_pad != td
    inputs = [q_p, docs_p]
    in_specs = [
        pl.BlockSpec(
            (b * tq_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (tile_docs, td_pad, d_pad), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if use_mask:
        if doc_mask is None:
            mask = jnp.ones((n, td), dtype=bool)
        else:
            mask = jnp.asarray(doc_mask, dtype=bool)
        mask_p = pad_axis_to(mask, 1, td_pad).astype(jnp.float32)
        inputs.append(mask_p)
        in_specs.append(
            pl.BlockSpec(
                (tile_docs, td_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        )

    grid = (-(-n // tile_docs),)
    out = pl.pallas_call(
        functools.partial(_maxsim_kernel_mq, tq, tq_pad, b, use_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_docs, b), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (round_up(n, tile_docs), b), jnp.float32
        ),
        interpret=should_interpret(),
    )(*inputs)
    return out[:n, :].T


def fused_maxsim_knn_batch(
    q_batch: jax.Array, docs: jax.Array, k: int, doc_mask=None
):
    """Top-k docs by MaxSim for a (B, Tq, D) query batch — one corpus pass,
    one launch. Returns ``(scores (B, k) descending, indices (B, k))``."""
    scores = fused_maxsim_scores_batch(q_batch, docs, doc_mask)
    return top_k_total(scores, k, largest=True)
