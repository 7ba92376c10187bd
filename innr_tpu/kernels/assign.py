"""Fused nearest-centroid assignment kernel (the k-means/IVF build hot op).

The XLA formulation of a full-corpus nearest-centroid pass
(``argmin_c ||x - c||^2`` via ``sum(c^2) - 2 x @ c.T`` then ``argmin``)
schedules the (N, KC) distance matrix between the matmul and the
reduction; this kernel keeps the running best in VMEM scratch instead so
the distance tile never leaves the core. Measured at 10M x 128 x 256
on-chip: 37.5 ms (XLA — its argmin-consumer fusion is already good) ->
33.8 ms (kernel), both near the ~33 ms MXU floor for the 6.5 Tflop
matmul; the kernel's value is holding that floor as kc grows past what
XLA fuses cleanly, up to the tile cap below. Structure:

- the grid walks (row tile, centroid tile); centroid tiles iterate
  fastest, so each row tile's running best lives in VMEM scratch across
  all centroid tiles (the same resident-scratch pattern as the streaming
  top-k in :mod:`innr_tpu.kernels.knn`);
- scores are computed TRANSPOSED, ``(C, T) = cent @ rows.T`` on the MXU,
  so the per-row max and argmax are sublane-axis reductions with the row
  axis on lanes — no relayout between the matmul and the reduce;
- ``argmin_c ||x-c||^2`` is evaluated as ``argmax_c (x.c - ||c||^2/2)``
  (the ``||x||^2`` term is constant per row); ``||c||^2/2`` is recomputed
  per tile from the resident centroid block (C*D flops — cheaper than
  streaming a second operand);
- ties break to the LOWEST centroid index, like ``jnp.argmin`` /
  ``jnp.argmax``: within a tile by a masked min-index reduce, across
  tiles by strict-greater merge.

HBM traffic: ``n_cent_tiles`` corpus reads and one (N,) i32 write — for
kc <= the single-tile cap (2048) exactly ONE corpus read, the roofline
for this op when the matmul doesn't dominate. Rows of NaN get assignment
0 (NaN scores never beat the -inf init; callers only use assignments for
layout, never correctness — innr_tpu/prune.py module doc).

Reference anchor: the reference has no k-means (its pruning is per-row
early exit, ``src/batch.rs:320-365``); this kernel exists for the
TPU-native IVF layout passes (``prune.cluster_reorder``, ``ivf.IVFIndex``)
that make tile pruning effective (SURVEY.md section 2.4 mandate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from innr_tpu.kernels import should_interpret
from innr_tpu.utils.padding import pad_axis_to, round_up

_INT_MAX = jnp.iinfo(jnp.int32).max
_LANE = 128


def _plan(n: int, d: int, kc_pad: int) -> tuple[int, int]:
    """(row_tile, cent_tile): the centroid tile is as tall as the VMEM
    budget allows (each extra centroid tile costs a FULL corpus re-read),
    then the row tile fills the remaining budget. ~6 MB scoped target:
    cent (C, D) f32 + rows (T, D) + scores (C, T) f32."""
    budget = 6 * 1024 * 1024
    c_tile = min(kc_pad, 2048)
    while c_tile > 256 and c_tile * d * 4 > budget // 3:
        c_tile //= 2
    per_row = (d + c_tile) * 4
    t = max(256, min(4096, (budget - c_tile * d * 4) // per_row))
    t = round_up(min(t, max(n, 8)), _LANE)
    return t, c_tile


def _nearest_kernel(n_cent, n_cent_tiles, rows_ref, cent_ref, out_ref,
                    best_val, best_idx):
    j = pl.program_id(1)
    c_tile = cent_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        best_val[:] = jnp.full_like(best_val, -jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    cent = cent_ref[:].astype(jnp.float32)
    rows = rows_ref[:]
    if rows.dtype != jnp.float32:
        # bf16 corpora join at bf16-input precision (layout quality only);
        # u8 widens via i32 as in the kNN kernel (Mosaic has no u8->f32).
        if rows.dtype == jnp.bfloat16:
            rows = rows.astype(jnp.float32)
        else:
            rows = rows.astype(jnp.int32).astype(jnp.float32)
    # (C, T) transposed scores: row axis on lanes, centroid axis on
    # sublanes, so the argmax is a cheap cross-sublane reduce.
    scores = jax.lax.dot_general(
        cent,
        rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores - 0.5 * jnp.sum(cent * cent, axis=1, keepdims=True)
    sub = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    gidx = j * c_tile + sub
    # Padded centroid rows are all-zero with half-norm 0 -> score 0.0,
    # which would WIN whenever every real score is negative; pin them to
    # -inf by index before the max so a padded centroid can never be
    # selected (there is at least one real centroid in every tile —
    # kc_pad - kc < c_tile by construction).
    valid = gidx < n_cent
    scores = jnp.where(valid, scores, -jnp.inf)
    m = jnp.max(scores, axis=0, keepdims=True)                    # (1, T)
    cand = jnp.min(
        jnp.where(scores == m, gidx, _INT_MAX),
        axis=0,
        keepdims=True,
    )                                                             # (1, T)
    better = m > best_val[:]
    best_idx[:] = jnp.where(better, cand, best_idx[:])
    best_val[:] = jnp.where(better, m, best_val[:])

    @pl.when(j == n_cent_tiles - 1)
    def _out():
        out_ref[:] = best_idx[:]


@jax.jit
def nearest_centroid(rows: jax.Array, cent: jax.Array) -> jax.Array:
    """``(N,) int32`` index of each row's nearest centroid (squared-L2,
    ties to the lowest index). ``rows``: (N, D) f32/bf16; ``cent``:
    (KC, D) f32. One fused pass — the (N, KC) distance matrix never
    exists."""
    n, d = rows.shape
    kc = cent.shape[0]
    t_tile, c_tile = _plan(int(n), int(d), round_up(int(kc), 256))
    if int(kc) > 4 * c_tile:
        # Many centroid tiles: the kernel re-reads the corpus once per
        # tile and pays ~2-3 us of grid-step overhead x (n/t * kc/c)
        # steps — measured SLOWER than XLA's fused matmul+argmin past
        # ~4 tiles (500 ms vs 478 ms at 10M x 16896; the win at kc<=2048
        # is 37.5 -> 33.8 ms). Let XLA have the big-kc regime.
        cent32 = cent.astype(jnp.float32)
        d2 = jnp.sum(cent32 * cent32, axis=1)[None, :] - 2.0 * jnp.matmul(
            rows.astype(jnp.float32), cent32.T,
            preferred_element_type=jnp.float32,
        )
        return jnp.argmin(d2, axis=1).astype(jnp.int32)
    d_pad = round_up(int(d), _LANE)
    kc_pad = round_up(int(kc), c_tile)
    n_cent_tiles = kc_pad // c_tile
    # Padding centroids are all-zero; the kernel masks them by index.
    # The PHYSICAL centroid pad must sort after every real one, which
    # index masking guarantees regardless of the pad value.
    cent_p = pad_axis_to(pad_axis_to(cent.astype(jnp.float32), 0, kc_pad),
                         1, d_pad)
    # Row axis stays ragged (an XLA pad of the corpus is a full HBM
    # copy — innr_tpu/kernels/knn.py:379); the output IS padded (40 MB
    # at 10M rows, sliced after).
    rows_p = pad_axis_to(rows, 1, d_pad)
    n_pad = round_up(int(n), t_tile)
    grid = (n_pad // t_tile, n_cent_tiles)

    out = pl.pallas_call(
        functools.partial(_nearest_kernel, int(kc), n_cent_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_tile, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, t_tile), jnp.float32),
            pltpu.VMEM((1, t_tile), jnp.int32),
        ],
        interpret=should_interpret(),
    )(rows_p, cent_p)
    return out[0, :n]
