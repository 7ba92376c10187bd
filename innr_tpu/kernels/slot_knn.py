"""Fused slot-sketch kNN: streaming compare-count scans with the shared
streaming top-k merge.

The MinHash retrieval analog of the packed kernels: the reference ships
only the *pairwise* slot-Hamming primitives (``src/slot.rs:95-264``,
SIMD cmpeq + movemask popcount); a corpus-scale sketch scan is their
natural TPU batch form. Like the packed kernels, the corpus streams
**slot-major** — ``(S, N)`` uint32 with one corpus sketch per VPU lane —
so the per-sketch differing-slot count is a sublane compare-reduce, and
the (Q, k) running-best selection (:func:`innr_tpu.kernels.knn.update_topk`)
is fused into the same pass: one HBM read of the sketch corpus per query
batch, no (Q, N) count matrix.

Counts are small exact integers; negated counts serve directly as int32
selection keys (smaller differing-count = better).
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
    """Scoped-VMEM bytes of the top-k state: best_keys/best_idx scratch
    plus the two output blocks — four (Q, k_pad) int32 buffers (mirrors
    kernels/knn.py plan_geometry's budget subtraction; advisor r3)."""
    return 16 * n_q * k_pad


def _pick_tile_n(n: int, s: int, itemsize: int = 4,
                 k_pad: int = _K_LANE) -> int:
    # u16 tiles widen to i32 in-kernel, so their live footprint is raw
    # (2s) + widened (4s) per lane — budget 3 bytes/slot instead of 2
    # (a 2-bytes/slot budget measured 2% over the 16 MB scoped-VMEM
    # limit at S=128 on v5e).
    eff = 4 if itemsize == 4 else 3
    budget = max(1024 * 1024, 4 * 1024 * 1024 - _topk_bytes(1, k_pad))
    tile = budget // max(s * eff, 1)
    tile = max(512, min(16384, tile))
    return round_up(min(tile, max(n, 128)), 128)


_S_CHUNK = 8  # sublane-aligned slot chunk for the mq accumulation


def _pick_tile_n_mq(n: int, s: int, n_q: int,
                    k_pad: int = _K_LANE) -> int:
    """Corpus tile for the multi-query kernel. The kernel keeps a
    (Q, 8, T) i32 differing-count accumulator plus one in-flight (Q, 8, T)
    chunk compare, so live scoped VMEM per corpus lane is the slot column
    (4s bytes) + 2 * 4 * 8q + the (Q, T) reduced counts (4q) —
    independent of Q x S, unlike a one-shot broadcast whose (Q, S, T)
    intermediate starves the tile size. Dynamic per-query lane slicing is
    NOT an option: Mosaic requires lane indices provably 128-aligned
    (found on real silicon). Budget tuned on silicon (round 5): tiles of
    ~1-2K lanes ran fastest (46 ms vs 50+ at 5-8K over 10M x 128 slots,
    Q=16) — a small working set double-buffers more deeply."""
    budget = max(
        1 * 1024 * 1024,
        int(2.5 * 1024 * 1024) - _topk_bytes(n_q, k_pad),
    )
    per_lane = 4 * (s + (2 * _S_CHUNK + 1) * n_q)
    tile = budget // max(per_lane, 1)
    tile = max(256, min(8192, tile))
    return round_up(min(tile, max(n, 128)), 128)



def _slot_kernel(n_rows, k, q_ref, slots_ref, keys_out, idx_out, best_keys, best_idx):
    step = pl.program_id(0)
    tile_n = slots_ref.shape[1]

    init_topk_state(best_keys, best_idx)

    # (S, T) tile vs (S, 1) query -> per-sketch differing-slot counts (1, T).
    # u16 sketches widen to i32 on-chip: Mosaic's VPU has no 16-bit vector
    # compare ("Target does not support this comparison", found on
    # silicon) — the HBM read stays 2 bytes/slot, which is the u16 win.
    # Widen UNCONDITIONALLY to i32 for the vector compare: u16 has no
    # 16-bit VPU compare on silicon, and u32 -> i32 is a wrap bijection,
    # so (tile != qv) is unchanged. One code path for every slot width.
    tile = slots_ref[:].astype(jnp.int32)
    qv = q_ref[:].astype(jnp.int32)
    diff = (tile != qv).astype(jnp.int32)
    counts = jnp.sum(diff, axis=0, keepdims=True)
    keys = -counts  # fewer differing slots = better
    keys, global_idx = masked_global_idx(step, 1, tile_n, n_rows, keys)
    update_topk(keys, global_idx, best_keys, best_idx, k)

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("k",))
def fused_slot_knn(q_slots: jax.Array, corpus_slots_t: jax.Array, k: int):
    """Top-k smallest differing-slot counts of one u32 sketch against a
    slot-major sketch corpus.

    ``q_slots``: (S,) uint32; ``corpus_slots_t``: (S, N) uint32.
    Returns ``(counts (k,) uint32 ascending, indices (k,) int32)``.
    """
    s, n = corpus_slots_t.shape
    k_pad = round_up(k, _K_LANE)
    tile_n = _pick_tile_n(n, s, corpus_slots_t.dtype.itemsize, k_pad)
    grid = (-(-n // tile_n),)

    keys, idx = pl.pallas_call(
        functools.partial(_slot_kernel, n, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
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
    )(q_slots[:, None], corpus_slots_t)
    return (-keys[0, :k]).astype(jnp.uint32), idx[0, :k]


def _slot_kernel_mq(
    n_rows, k, q_ref, slots_ref, keys_out, idx_out, best_keys, best_idx,
):
    """Multi-query step: (Q, S, 1) queries x (1, S, T) tile -> (Q, T)
    differing-slot counts, accumulated over static 8-slot sublane chunks
    so only a (Q, 8, T) compare is ever live (a one-shot (Q, S, T)
    broadcast starves the tile size; dynamic per-query lane slicing fails
    Mosaic's 128-aligned lane-index rule on real silicon).

    The sublane reduce is DEFERRED: chunks add into a (Q, 8, T) i32
    accumulator (compare + widen + add, ~3 VPU ops/element/query) and
    collapse to (Q, T) once per tile — reducing every chunk as it was
    compared cost ~5-6 ops/element/query and held this kernel at 69 ms
    vs 46 ms for the same 10M x 128 x 16q scan (round-5 silicon A/B;
    bit-identical counts by integer associativity)."""
    step = pl.program_id(0)
    n_q = q_ref.shape[0]
    s = slots_ref.shape[1]
    tile_n = slots_ref.shape[2]

    init_topk_state(best_keys, best_idx)

    s_full = (s // _S_CHUNK) * _S_CHUNK
    acc = jnp.zeros((n_q, _S_CHUNK, tile_n), jnp.int32)
    for s0 in range(0, s_full, _S_CHUNK):
        # Unconditional i32 widen: see the single-query kernel note.
        tile = slots_ref[:, s0:s0 + _S_CHUNK, :].astype(jnp.int32)
        qv = q_ref[:, s0:s0 + _S_CHUNK, :].astype(jnp.int32)
        acc = acc + (tile != qv).astype(jnp.int32)
    counts = jnp.sum(acc, axis=1)  # (Q, T)
    for s0 in range(s_full, s):  # ragged tail (S not a sublane multiple)
        tile = slots_ref[:, s0:s0 + 1, :].astype(jnp.int32)
        qv = q_ref[:, s0:s0 + 1, :].astype(jnp.int32)
        counts = counts + (tile != qv).astype(jnp.int32)[:, 0, :]
    keys = -counts
    keys, global_idx = masked_global_idx(step, n_q, tile_n, n_rows, keys)
    update_topk(keys, global_idx, best_keys, best_idx, k)

    keys_out[:] = best_keys[:]
    idx_out[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("k",))
def fused_slot_knn_batch(q_slots: jax.Array, corpus_slots_t: jax.Array, k: int):
    """Top-k smallest differing-slot counts for a (Q, S) sketch batch —
    one kernel launch, one corpus read for all queries.

    Returns ``(counts (Q, k) uint32 ascending, indices (Q, k) int32)``.
    """
    n_q, s = q_slots.shape
    _, n = corpus_slots_t.shape
    k_pad = round_up(k, _K_LANE)
    tile_n = _pick_tile_n_mq(n, s, n_q, k_pad)
    grid = (-(-n // tile_n),)

    keys, idx = pl.pallas_call(
        functools.partial(_slot_kernel_mq, n, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_q, s, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, tile_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
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
    )(q_slots[:, :, None], corpus_slots_t[None, :, :])
    return (-keys[:, :k]).astype(jnp.uint32), idx[:, :k]
