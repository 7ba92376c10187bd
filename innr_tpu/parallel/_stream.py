"""Per-shard streaming ingestion for sharded containers.

`jax.make_array_from_callback` asks each device for exactly its shard's
index range, so a host-side row source (np.memmap slice, decoder, network
fetch) streams disk -> that device's HBM one shard at a time — the corpus
is never materialized on the host. This module is the shared plumbing
behind every container's ``from_*_source`` constructor
(:meth:`ShardedCorpus.from_row_source` established the pattern).
"""

from __future__ import annotations

import numpy as np
import jax

from innr_tpu.utils.asserts import ContractError


def streamed_array(
    get_rows, n_true: int, n_pad: int, width: int, np_dtype,
    sharding, column_major: bool, name: str,
):
    """Build a sharded device array from a host row source.

    ``get_rows(start, stop)`` returns rows ``[start, stop)`` as a
    ``(stop - start, width)`` array. ``column_major=True`` stores the
    transpose — the ``(width, N)`` streaming layout of the packed/slot
    kernels — while the source still speaks row-major. Padding rows
    beyond ``n_true`` are zeros (they are additionally masked out of
    every merge by the ``n_total`` guard).
    """
    shape = (width, n_pad) if column_major else (n_pad, width)

    def fetch(index):
        sl = index[1] if column_major else index[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else n_pad
        # Clamp below by start: a wholly-padded shard (start >= n_true,
        # possible whenever the pad count reaches a full shard) must fetch
        # zero rows, not a negative count.
        real_stop = max(start, min(stop, n_true))
        if real_stop > start:
            block = np.asarray(get_rows(start, real_stop), dtype=np_dtype)
        else:
            block = np.zeros((0, width), np_dtype)
        if block.shape != (real_stop - start, width):
            raise ContractError(
                f"{name}: get_rows({start}, {real_stop}) returned shape "
                f"{block.shape}, want ({real_stop - start}, {width})"
            )
        pad = (stop - start) - block.shape[0]
        if pad:
            block = np.concatenate([block, np.zeros((pad, width), np_dtype)])
        return np.ascontiguousarray(block.T) if column_major else block

    return jax.make_array_from_callback(shape, sharding, fetch)
