"""Tile-skipping fused kNN scan: the HBM-level early exit.

Realizes the survey's hard part ("blockwise threshold masking with
block-level skip inside the Pallas grid", SURVEY.md §7) as an actual
bandwidth win — the semantics of the reference's pruning scans
(``src/batch.rs:320-365``, ``:439-558``) made exact:

1. :mod:`innr_tpu.prune` plans a survivor tile list from per-tile
   centroid/radius bounds (sound — no true neighbor can be lost);
2. the grid here walks ``n_tiles`` steps, but the corpus BlockSpec's
   index map reads the *prefetched* survivor list: step ``i`` visits
   ``order[i]``. Dead slots repeat the last survivor's tile index, and
   the Pallas pipeline does not re-issue a DMA when the block index is
   unchanged between consecutive steps — so pruned tiles are never read
   from HBM at all. The merge is additionally gated on ``i < n_surv`` so
   repeated slots contribute nothing.

Survivors are listed in ascending tile order, preserving the streaming
merge's "first occurrence = lowest corpus index" tie-break, so results are
bit-identical to the full fused scan.

On a tile-coherent (clustered/IVF-ordered) corpus the scan reads only the
competitive fraction of HBM and finishes *below* the full-corpus read time
— the only lever past roofline 1.0. On an incoherent corpus nothing
prunes and it degrades to the ordinary full scan plus a negligible bound
pass (n_tiles x D matmul).

Test-surface map (round-5 verdict item 6): the DYNAMIC variants
(``_pruned_raw_dynamic``, ``_threshold_raw_dynamic``, their
``_*_outer_kernel`` bodies) are **silicon-only** — ``pltpu.emit_pipeline``
queries the TPU device kind at trace time, so the CPU interpreter cannot
execute them. Their value semantics are carried in CI by the static-grid
twins (``_pruned_raw``, ``_threshold_raw``), which share the scoring body
(``_pruned_body_scores`` / ``_tile_dists``) line-for-line; the
bandwidth claim itself ("dead tiles are never DMA'd") is asserted
mechanically on hardware by ``scripts/validate_elision.py`` (rc=2 when
measured time is inconsistent with survivor-bytes/bandwidth), run from
``scripts/onchip_validation.sh``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from innr_tpu.kernels import should_interpret
from innr_tpu.kernels.knn import (
    _INT_MIN,
    _K_LANE,
    _LANE,
    _Q_TILE,
    _invert_total_key,
    f32_keys,
    init_topk_state,
    single_pass_k,
    update_topk,
)
from innr_tpu.utils.padding import pad_axis_to, round_up


def pruned_tile_n(n: int, d: int, dtype=jnp.float32) -> int:
    """Corpus tile height for the pruned scan — the tiling a
    :class:`~innr_tpu.prune.TileSummary` must be built with.

    Fixed per (n, d, dtype) so the summary matches every query batch; the
    multi-query VMEM terms are budgeted for batches up to ~32 queries
    (larger batches still run, with Mosaic spilling the score tile)."""
    bytes_el = 2 if dtype == jnp.bfloat16 else 4
    budget = 4 * 1024 * 1024
    per_row = d * bytes_el + 12 * 32
    tile = budget // max(per_row, 1)
    tile = max(512, min(8192, tile))
    return round_up(min(tile, max(n, 128)), 128)


def _pruned_kernel(n_rows, tile_n, k, mode, order_ref, nsurv_ref, q_ref,
                   rows_ref, *rest):
    """One grid step over survivor slot ``i``: tile ``order[i]``. Steps at
    or beyond ``n_surv`` revisit the last survivor's block (no DMA) and
    skip the merge."""
    rest = list(rest)
    norms_ref = rest.pop(0) if mode != "dot" else None
    keys_out, idx_out, best_keys, best_idx = rest

    i = pl.program_id(0)
    tile_id = order_ref[i]
    n_q = q_ref.shape[0]

    init_topk_state(best_keys, best_idx)

    @pl.when(i < nsurv_ref[0])
    def _scan():
        norms_tile = norms_ref[:] if mode != "dot" else None
        _scan_tile_into(
            q_ref[:], rows_ref[:], norms_tile, mode, tile_id, tile_n,
            n_rows, best_keys, best_idx, k,
        )

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


def _scan_tile_into(q_tile, rows, norms_tile, mode, tile_id, tile_n,
                    n_rows, best_keys, best_idx, k):
    """Score one survivor tile and merge into the running best — the ONE
    body both the static (CPU-testable interpret) and dynamic
    (emit_pipeline, real hardware) pruned kernels execute, so the CPU
    differential suite covers exactly the math the silicon runs."""
    keys = _pruned_body_scores(q_tile, rows, norms_tile, mode)
    n_q = q_tile.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_q, rows.shape[0]), 1)
    global_idx = tile_id * tile_n + lane
    keys = jnp.where(global_idx < n_rows, keys, _INT_MIN)
    update_topk(keys, global_idx, best_keys, best_idx, k)


_MASKED_MODES = ("l2m", "dotm", "cosinem")


def _pruned_body_scores(qs_tile, rows, norms_tile, mode):
    """Shared score computation for one survivor tile (dot, l2, or
    cosine — cosine streams per-row inverse norms like the full fused
    scan and expects pre-normalized queries). The masked modes
    ("l2m"/"dotm"/"cosinem") carry a validity predicate as the LAST aux
    row (the only row for "dotm") and pin non-passing rows to the worst
    key — how :class:`innr_tpu.ivf.IVFIndex`'s tile-aligned padding rows
    are kept out of every top-k."""
    from innr_tpu import config

    precision = config.matmul_precision()
    if rows.dtype == jnp.bfloat16:
        qs_tile = qs_tile.astype(jnp.bfloat16)
        precision = jax.lax.Precision.DEFAULT
    scores = jax.lax.dot_general(
        qs_tile,
        rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if mode == "l2":
        scores = norms_tile - 2.0 * scores
    elif mode == "l2m":
        scores = norms_tile[0:1, :] - 2.0 * scores
    elif mode == "cosine":
        scores = scores * norms_tile
    elif mode == "cosinem":
        scores = scores * norms_tile[0:1, :]
    keys = f32_keys(scores)
    if mode in ("l2", "l2m"):
        keys = ~keys
    if mode in _MASKED_MODES:
        mask_row = norms_tile[0:1, :] if mode == "dotm" else norms_tile[1:, :]
        keys = jnp.where(mask_row > 0.0, keys, _INT_MIN)
    return keys


def _pruned_outer_kernel(n_rows, tile_n, k, mode, d_pad, order_ref,
                         nsurv_ref, q_ref, rows_hbm, *rest):
    """Single-invocation outer kernel: runs a *dynamic-length* inner
    pipeline over exactly ``n_surv`` survivor tiles via
    ``pltpu.emit_pipeline`` (its grid accepts a traced array — the
    pipeline loops a data-dependent number of steps, so pruned tiles are
    simply never DMA'd, with no recompilation per survivor count)."""
    rest = list(rest)
    norms_hbm = rest.pop(0) if mode != "dot" else None
    keys_out, idx_out = rest

    keys_out[:] = jnp.full_like(keys_out, _INT_MIN)
    idx_out[:] = jnp.zeros_like(idx_out)
    n_q = q_ref.shape[0]

    def inner(rows_vmem, *maybe_norms):
        step = pl.program_id(0)
        tile_id = order_ref[step]
        norms_tile = maybe_norms[0][:] if mode != "dot" else None
        _scan_tile_into(
            q_ref[:], rows_vmem[:], norms_tile, mode, tile_id, tile_n,
            n_rows, keys_out, idx_out, k,
        )

    in_specs = [
        pl.BlockSpec((tile_n, d_pad), lambda i: (order_ref[i], 0)),
    ]
    refs = [rows_hbm]
    if mode != "dot":
        in_specs.append(
            pl.BlockSpec(
                (norms_hbm.shape[0], tile_n), lambda i: (0, order_ref[i])
            )
        )
        refs.append(norms_hbm)
    pltpu.emit_pipeline(
        inner,
        grid=(nsurv_ref[0],),
        in_specs=in_specs,
    )(*refs)


@functools.partial(jax.jit, static_argnames=("k", "mode", "tile_n"))
def _pruned_raw_dynamic(qs, rows, aux, order, n_surv, k: int, mode: str,
                        tile_n: int):
    """Dynamic-grid pruned scan (real hardware): one pallas_call, rows
    stay in HBM (ANY), the inner pipeline fetches only survivor tiles."""
    n_q, d = qs.shape
    n = rows.shape[0]
    d_pad = round_up(d, _LANE)
    q_pad = round_up(n_q, _Q_TILE)
    k_pad = round_up(k, _K_LANE)
    # No row-axis padding (an XLA pad of the corpus is a full HBM copy —
    # the round-2 lesson): emit_pipeline clamps the ragged final block
    # itself, and the stale tail lanes of the reused VMEM buffer are
    # pinned to INT_MIN by the global-index mask.
    rows_p = pad_axis_to(rows, 1, d_pad)
    qs_p = pad_axis_to(pad_axis_to(qs, 0, q_pad), 1, d_pad)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    inputs = [
        order,
        n_surv[None].astype(jnp.int32),
        qs_p,
        rows_p,
    ]
    if mode != "dot":
        aux2 = aux if aux.ndim == 2 else aux[None, :]
        # Lane-dim tiling is 128: pad the (n_aux, N) norm/mask stream so
        # the clamped final block never reads past the allocation (cheap
        # — 4 bytes/row/stream).
        aux2 = pad_axis_to(aux2, 1, round_up(aux2.shape[1], _LANE))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(aux2)

    kernel = functools.partial(
        _pruned_outer_kernel, n, tile_n, k, mode, d_pad
    )
    keys, idx = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
        ),
    )(*inputs)
    return keys[:n_q, :k], idx[:n_q, :k]


@functools.partial(jax.jit, static_argnames=("k", "mode", "tile_n"))
def _pruned_raw(qs, rows, aux, order, n_surv, k: int, mode: str, tile_n: int):
    n_q, d = qs.shape
    n = rows.shape[0]
    n_tiles = -(-n // tile_n)
    d_pad = round_up(d, _LANE)
    q_pad = round_up(n_q, _Q_TILE)
    k_pad = round_up(k, _K_LANE)
    rows_p = pad_axis_to(rows, 1, d_pad)
    qs_p = pad_axis_to(pad_axis_to(qs, 0, q_pad), 1, d_pad)

    in_specs = [
        pl.BlockSpec((q_pad, d_pad), lambda i, o, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d_pad), lambda i, o, s: (o[i], 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [qs_p, rows_p]
    if mode != "dot":
        aux2 = aux if aux.ndim == 2 else aux[None, :]
        in_specs.append(
            pl.BlockSpec(
                (aux2.shape[0], tile_n), lambda i, o, s: (0, o[i]),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(aux2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((q_pad, k_pad), lambda i, o, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, k_pad), lambda i, o, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
        ],
    )
    kernel = functools.partial(_pruned_kernel, n, tile_n, k, mode)
    keys, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
        ),
        interpret=should_interpret(),
    )(order, n_surv[None].astype(jnp.int32), *inputs)
    return keys[:n_q, :k], idx[:n_q, :k]


def fused_knn_dot_pruned_batch(qs, rows, summary, k: int):
    """Exact top-k MIPS for a (Q, D) batch with tile-skip pruning.

    ``summary``: :class:`innr_tpu.prune.TileSummary` built at
    ``pruned_tile_n(n, d, rows.dtype)``. Returns ``(scores (Q, k),
    indices (Q, k))`` — bit-identical to
    :func:`innr_tpu.kernels.knn.fused_knn_dot_batch`, reading only
    surviving tiles from HBM.
    """
    return _pruned_run(qs, rows, None, summary, k, "dot")


def fused_knn_l2_pruned_batch(qs, rows, summary, k: int, norms2=None):
    """Exact top-k smallest L2^2 with tile-skip pruning (see
    :func:`fused_knn_dot_pruned_batch`)."""
    if norms2 is None:
        r = rows.astype(jnp.float32)
        norms2 = jnp.sum(r * r, axis=1)
    return _pruned_run(qs, rows, norms2, summary, k, "l2")


def fused_knn_cosine_pruned_batch(qs, rows, summary_norm, k: int, inv=None):
    """Exact top-k cosine with tile-skip pruning. ``summary_norm``: a
    :class:`~innr_tpu.prune.TileSummary` built with ``normalized=True``
    (unit rows) — cosine over the raw corpus equals dot over the unit
    corpus, so the survivor plan is the dot plan against the normalized
    queries. The scan itself streams per-row inverse norms (``inv``)
    like the full fused cosine kernel; zero-norm rows/queries score
    exactly 0.0 (the reference guard)."""
    from innr_tpu.kernels.knn import _unit_queries, inv_norms

    if inv is None:
        inv = inv_norms(rows)
    qs_n = _unit_queries(jnp.asarray(qs, jnp.float32))
    return _pruned_run(qs_n, rows, inv, summary_norm, k, "cosine")


def _fast_plan_ok(k: int, summary) -> bool:
    """Perf-only plan selection: the masked-max fast threshold (no
    per-query argsort; it dominated plan cost at serving batch sizes) is
    worthwhile when some tile statically holds >= k rows (every non-final
    tile holds exactly tile_n). EITHER choice is sound —
    ``plan_survivors``'s eligible-count mask degrades the fast threshold
    to "prune nothing" when no tile qualifies — so this function is a
    pure performance knob (excluded from mutation like the tile pickers).
    """
    return k <= summary.tile_n or summary.n_tiles == 1


def routed_raw(qs, rows, aux, order, n_surv, k: int, mode: str,
               tile_n: int, dynamic: bool):
    """Self-routing pruned scan: one device-side ``lax.cond`` picks the
    tile-skipping pipeline when the plan elides at least
    ``config.prune_route_min_elide()`` of the corpus tiles, and the plain
    full fused scan otherwise. No host sync — ``n_surv`` never leaves the
    device. Both routes return the identical raw-key contract (the full
    scan and the pruned scan are bit-identical by construction), so the
    router is purely a performance decision: it kills the measured
    ~7-14% dynamic-pipeline overhead on corpora where nothing prunes
    (PERF_PRUNE_ENVELOPE.md pathology rows) while keeping the full HBM
    win when pruning pays."""
    from innr_tpu import config
    from innr_tpu.kernels.knn import _fused_knn_raw

    n_tiles = order.shape[0]
    min_elide = max(1, int(round(config.prune_route_min_elide() * n_tiles)))
    raw = _pruned_raw_dynamic if dynamic else _pruned_raw

    def pruned_branch(_):
        return raw(qs, rows, aux, order, n_surv, k, mode, tile_n)

    def full_branch(_):
        return _fused_knn_raw(qs, rows, aux, k, mode, None)

    return jax.lax.cond(
        n_surv <= n_tiles - min_elide, pruned_branch, full_branch, None
    )


@functools.partial(jax.jit, static_argnames=("k", "mode", "plan_mode",
                                              "tile_n", "fast", "dynamic"))
def _planned_routed(qs_plan, qs, rows, aux, cents, radii, counts, k: int,
                    mode: str, plan_mode: str, tile_n: int, fast: bool,
                    dynamic: bool):
    """Plan + route + scan in ONE jitted dispatch. Fusing the survivor
    plan into the same computation as the scan removes the second kernel
    launch the eager path used to pay (the single-launch envelope rows
    charged a whole dispatch floor to the tiny bound pass)."""
    from innr_tpu.prune import plan_survivors

    order, n_surv = plan_survivors(
        qs_plan, cents, radii, counts, k, plan_mode, fast=fast
    )
    return routed_raw(qs, rows, aux, order, n_surv, k, mode, tile_n, dynamic)


def _pruned_run(qs, rows, aux, summary, k: int, mode: str):
    if summary.tile_n * summary.n_tiles < rows.shape[0]:
        raise ValueError("TileSummary does not cover the corpus")
    cap = single_pass_k(qs.shape[0])
    if k > cap:
        # Large k falls back to the multi-pass full scan (exclusion
        # bounds + pruning don't compose yet); correctness first. The
        # L2 post-processing below must be replicated here — the raw
        # fused values are norms^2 - 2 q.r (round-5 regression: the
        # early return used to skip the +||q||^2 add-back).
        from innr_tpu.kernels.knn import _fused_knn

        vals, idx = _fused_knn(qs, rows, aux, k, mode)
        if mode in ("l2", "l2m"):
            qq = jnp.sum(qs * qs, axis=1, keepdims=True)
            vals = jnp.maximum(vals + qq, 0.0)
        return vals, idx
    fast = _fast_plan_ok(k, summary)
    # Cosine plans as DOT against the unit-row summary with the already
    # pre-normalized queries (|q_hat| = 1 folds into the dot bounds);
    # masked modes plan as their base mode (the summary's COUNTS cover
    # valid rows only — see build_tile_summary's ``valid`` — so the
    # threshold guarantee "at least k valid rows beat t0" stays sound).
    plan_mode = {
        "cosine": "dot", "cosinem": "dot", "dotm": "dot", "l2m": "l2",
    }.get(mode, mode)
    if rows.dtype == jnp.bfloat16:
        # The scan kernels score bf16(q) . r (the same cast the full
        # fused scan makes — bit-identity demands it), a 2^-9 relative
        # query perturbation that PRUNE_BOUND_EPS's f32 slack cannot
        # absorb. Plan against the SAME rounded query (exact in f32) so
        # the tile bounds apply to the scores the kernel actually
        # computes; only f32-accumulation rounding remains for the slack.
        qs_plan = qs.astype(jnp.bfloat16).astype(jnp.float32)
    else:
        qs_plan = qs
    # Real hardware: dynamic-grid inner pipeline (only survivor tiles are
    # ever DMA'd). Interpreter (CPU tests): the static-grid variant —
    # identical results, no bandwidth claim. Either way the plan, the
    # route, and the scan are one dispatch.
    keys, idx = _planned_routed(
        qs_plan, qs, rows, aux, summary.centroids, summary.radii,
        summary.counts, k, mode, plan_mode, summary.tile_n, fast,
        not should_interpret(),
    )
    if mode in ("l2", "l2m"):
        keys = ~keys
    vals = _invert_total_key(keys)
    if mode in ("l2", "l2m"):
        qq = jnp.sum(qs * qs, axis=1, keepdims=True)
        vals = jnp.maximum(vals + qq, 0.0)
    return vals, idx


def _tile_dists(q_row, rows, norms_tile, tile_id, tile_n, n_rows):
    """L2^2 distances (sans ||q||^2) for one tile — shared by the static
    (interpret-tested) and dynamic threshold kernels; out-of-range lanes
    pinned to +inf."""
    from innr_tpu import config

    scores = jax.lax.dot_general(
        q_row, rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    dists = norms_tile - 2.0 * scores
    lane = jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
    return jnp.where(tile_id * tile_n + lane < n_rows, dists, jnp.inf)


def _threshold_outer_kernel(n_rows, tile_n, d_pad, order_ref, nsurv_ref,
                            q_ref, rows_hbm, norms_hbm, out_hbm):
    """Dynamic-grid threshold scan: distances written tile-by-tile for
    survivors only; dead tiles' output blocks are never touched (caller
    masks them)."""

    def inner(rows_vmem, norms_vmem, out_vmem):
        step = pl.program_id(0)
        tile_id = order_ref[step]
        out_vmem[:] = _tile_dists(
            q_ref[0:1, :], rows_vmem[:], norms_vmem[:], tile_id, tile_n,
            n_rows,
        )

    pltpu.emit_pipeline(
        inner,
        grid=(nsurv_ref[0],),
        in_specs=[
            pl.BlockSpec((tile_n, d_pad), lambda i: (order_ref[i], 0)),
            pl.BlockSpec((1, tile_n), lambda i: (0, order_ref[i])),
        ],
        out_specs=[pl.BlockSpec((1, tile_n), lambda i: (0, order_ref[i]))],
    )(rows_hbm, norms_hbm, out_hbm)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def _threshold_raw_dynamic(q, rows, norms2, order, n_surv, tile_n: int):
    d = q.shape[0]
    n = rows.shape[0]
    n_tiles = -(-n // tile_n)
    d_pad = round_up(d, _LANE)
    rows_p = pad_axis_to(rows, 1, d_pad)
    q_p = pad_axis_to(pad_axis_to(q[None, :], 1, d_pad), 0, _Q_TILE)
    norms_p = pad_axis_to(norms2[None, :], 1, n_tiles * tile_n)

    out = pl.pallas_call(
        functools.partial(_threshold_outer_kernel, n, tile_n, d_pad),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * tile_n), jnp.float32),
    )(order, n_surv[None].astype(jnp.int32), q_p, rows_p, norms_p)
    return out[0]


@functools.partial(jax.jit, static_argnames=("tile_n",))
def _threshold_raw(q, rows, norms2, order, n_surv, tile_n: int):
    d = q.shape[0]
    n = rows.shape[0]
    n_tiles = -(-n // tile_n)
    d_pad = round_up(d, _LANE)
    rows_p = pad_axis_to(rows, 1, d_pad)
    q_p = pad_axis_to(q[None, :], 1, d_pad)
    q_p = pad_axis_to(q_p, 0, _Q_TILE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_Q_TILE, d_pad), lambda i, o, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i, o, s: (o[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, o, s: (0, o[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n), lambda i, o, s: (0, o[i]),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_threshold_kernel_1q, n, tile_n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * tile_n), jnp.float32),
        interpret=should_interpret(),
    )(order, n_surv[None].astype(jnp.int32), q_p, rows_p, norms2[None, :])
    return out[0]


def _threshold_kernel_1q(n_rows, tile_n, order_ref, nsurv_ref, q_ref,
                         rows_ref, norms_ref, out_ref):
    i = pl.program_id(0)
    tile_id = order_ref[i]
    out_ref[:] = _tile_dists(
        q_ref[0:1, :], rows_ref[:], norms_ref[:], tile_id, tile_n, n_rows
    )


def l2_squared_pruning_scan(q, rows, norms2, summary, threshold: float):
    """Tile-skipping threshold scan: squared L2 distances for rows in
    tiles whose lower bound can beat ``threshold``; +inf elsewhere.

    The reference's ``batch_l2_squared_pruning`` survivor set is exactly
    ``{i : dist[i] <= threshold}`` (src/batch.rs:320-365); tiles whose
    centroid/radius lower bound exceeds the threshold contain no survivor
    and are never read from HBM. Returns an (N,) f32 distance array
    (+inf for rows in skipped tiles — all provably above threshold).
    """
    import numpy as np

    from innr_tpu.prune import plan_threshold_survivors

    order, n_surv, alive = plan_threshold_survivors(
        q[None, :], summary.centroids, summary.radii, jnp.float32(threshold)
    )
    raw = _threshold_raw if should_interpret() else _threshold_raw_dynamic
    padded = raw(q, rows, norms2, order, n_surv, summary.tile_n)
    qq = jnp.sum(q * q)
    n = rows.shape[0]
    dists = padded[:n] + qq
    # Mask rows of skipped tiles: their blocks were never written.
    row_alive = jnp.repeat(alive, summary.tile_n)[:n]
    return jnp.where(row_alive, dists, jnp.inf)
