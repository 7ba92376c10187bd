"""Pallas batch kernels over packed words: XOR+popcount Hamming and ternary
sign-agreement dot.

The TPU analog of the reference's popcount kernels
(``src/arch/x86_64.rs:1160-1271`` AVX2 nibble-LUT / AVX-512 VPOPCNTDQ, and
the ternary extraction pipeline ``src/ternary.rs:225-256``). TPU has a
native vector popcount (``lax.population_count``), so the kernel's job is
purely streaming: walk corpus word tiles, fuse XOR/AND + popcount + row
reduction in VMEM, and write only the (N,) counts — one HBM read of the
packed corpus, no intermediate arrays.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from innr_tpu.kernels import should_interpret
from innr_tpu.utils.padding import pad_axis_to, round_up


def _pick_tile_n(n: int, w: int) -> int:
    budget = 4 * 1024 * 1024
    tile = budget // max(w * 4, 1)
    tile = max(256, min(8192, tile))
    return round_up(min(tile, max(n, 8)), 8)


def _hamming_kernel(q_ref, rows_ref, out_ref):
    x = rows_ref[:] ^ q_ref[:]
    pc = jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = jnp.sum(pc, axis=1, keepdims=True)


@jax.jit
def batch_hamming_words(query: jax.Array, corpus: jax.Array) -> jax.Array:
    """Bit-Hamming counts of one packed query against a packed corpus.

    ``query``: (W,) uint32; ``corpus``: (N, W) uint32 -> (N,) uint32.
    """
    n, w = corpus.shape
    tile_n = _pick_tile_n(n, w)
    n_pad = round_up(n, tile_n)
    corpus_p = pad_axis_to(corpus, 0, n_pad)
    out = pl.pallas_call(
        _hamming_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=should_interpret(),
    )(query[None, :], corpus_p)
    return out[:n, 0].astype(jnp.uint32)


def _ternary_kernel(qp_ref, qn_ref, pos_ref, neg_ref, out_ref):
    same = (pos_ref[:] & qp_ref[:]) | (neg_ref[:] & qn_ref[:])
    diff = (pos_ref[:] & qn_ref[:]) | (neg_ref[:] & qp_ref[:])
    counts = jax.lax.population_count(same).astype(jnp.int32) - jax.lax.population_count(
        diff
    ).astype(jnp.int32)
    out_ref[:] = jnp.sum(counts, axis=1, keepdims=True)


@jax.jit
def batch_ternary_dot_words(
    qpos: jax.Array, qneg: jax.Array, pos_corpus: jax.Array, neg_corpus: jax.Array
) -> jax.Array:
    """Ternary dots (same-sign minus diff-sign popcounts) of one query
    against an encoded corpus. Planes: (W,) query, (N, W) corpus uint32.
    Returns (N,) int32."""
    n, w = pos_corpus.shape
    tile_n = _pick_tile_n(n, w)
    n_pad = round_up(n, tile_n)
    pos_p = pad_axis_to(pos_corpus, 0, n_pad)
    neg_p = pad_axis_to(neg_corpus, 0, n_pad)
    out = pl.pallas_call(
        _ternary_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=should_interpret(),
    )(qpos[None, :], qneg[None, :], pos_p, neg_p)
    return out[:n, 0]
