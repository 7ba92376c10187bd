"""Sharded corpus container and distributed kNN merge.

Corpus rows are sharded along the vector axis over a 1-D device mesh
(axis ``"shards"``). A kNN query runs as:

1. per-shard local scan (MXU matvec + total-order top-k over the local
   rows, with global indices carried alongside) under ``shard_map``;
2. all-gather of the per-shard (score, global index) top-k pairs — k values
   per device, a few hundred bytes over ICI;
3. final top-k merge over the ``num_devices * k`` candidates.

Step 1's selection is the same integer total-order top-k the single-chip
path uses, so the distributed result is bit-identical to a single-chip scan
of the concatenated corpus (both pick the same winners; scores are computed
shard-locally from identical row data).

Padding: the row axis is padded to a multiple of the mesh size; padded rows
are masked to the INT32_MIN sentinel key inside the local scan and can
never win.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from innr_tpu.utils.asserts import ContractError
from innr_tpu.utils.order import total_order_key_f32
from innr_tpu.utils.padding import pad_axis_to, round_up

__all__ = ["ShardedCorpus", "default_mesh", "sharded_knn_dot", "sharded_knn_l2"]

_INT_MIN = jnp.iinfo(jnp.int32).min

AXIS = "shards"


def default_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``"shards"``."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (AXIS,))


def _invert_total_key(keys: jax.Array) -> jax.Array:
    mask = jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(keys, 31), 1
    )
    return jax.lax.bitcast_convert_type(keys ^ mask, jnp.float32)


def _local_topk(qs, rows_shard, n_total, k, l2):
    """Per-shard body under shard_map: (Q, shard) local scores -> per-query
    local top-k with global indices, padded rows masked out."""
    shard_rows = rows_shard.shape[0]
    if l2:
        d = rows_shard[None, :, :] - qs[:, None, :]
        scores = jnp.sum(d * d, axis=2)
    else:
        from innr_tpu import config

        scores = jnp.matmul(
            qs, rows_shard.T,
            preferred_element_type=jnp.float32,
            precision=config.matmul_precision(),
        )
    keys = total_order_key_f32(scores)  # (Q, shard)
    if l2:
        keys = ~keys  # smaller distance = better
    base = jax.lax.axis_index(AXIS) * shard_rows
    gidx = base + jnp.arange(shard_rows, dtype=jnp.int32)
    keys = jnp.where(gidx[None, :] < n_total, keys, _INT_MIN)
    top_keys, tidx = jax.lax.top_k(keys, k)  # (Q, k)
    return top_keys, gidx[tidx]


@partial(jax.jit, static_argnames=("k", "l2", "n_total", "mesh"))
def _sharded_knn(qs, rows_sharded, k: int, l2: bool, n_total: int, mesh: Mesh):
    single = qs.ndim == 1
    if single:
        qs = qs[None, :]
    local = jax.shard_map(
        partial(_local_topk, n_total=n_total, k=k, l2=l2),
        mesh=mesh,
        in_specs=(P(), P(AXIS, None)),
        out_specs=(P(None, AXIS), P(None, AXIS)),
    )
    keys, gidx = local(qs, rows_sharded)  # (Q, num_devices * k) each
    # Final merge over the gathered candidates (tiny).
    merged_keys, pos = jax.lax.top_k(keys, k)
    if l2:
        merged_keys = ~merged_keys
    vals = _invert_total_key(merged_keys)
    idx = jnp.take_along_axis(gidx, pos, axis=1)
    if single:
        return vals[0], idx[0]
    return vals, idx


class ShardedCorpus:
    """An (N, D) corpus sharded row-wise across a device mesh.

    The multi-chip analog of :class:`innr_tpu.batch.VerticalBatch`: rows
    live distributed in per-device HBM; queries broadcast; results merge
    over ICI. ``num_vectors``/``dimension`` report the true (unpadded)
    corpus shape.
    """

    def __init__(self, rows, mesh: Mesh | None = None):
        rows = jnp.asarray(rows, dtype=jnp.float32)
        if rows.ndim != 2:
            raise ContractError("ShardedCorpus: rows must be 2-D (N, D)")
        self.mesh = mesh if mesh is not None else default_mesh()
        n_devices = self.mesh.devices.size
        self.n_true = int(rows.shape[0])
        n_pad = round_up(max(self.n_true, n_devices), n_devices)
        rows = pad_axis_to(rows, 0, n_pad)
        sharding = NamedSharding(self.mesh, P(AXIS, None))
        self.rows = jax.device_put(rows, sharding)

    @property
    def num_vectors(self) -> int:
        return self.n_true

    @property
    def dimension(self) -> int:
        return int(self.rows.shape[1])

    def knn_dot(self, query, k: int):
        """Distributed MIPS top-k: returns (scores, global indices),
        scores descending (total order)."""
        return sharded_knn_dot(query, self, k)

    def knn_l2(self, query, k: int):
        """Distributed L2 top-k: returns (distances, global indices),
        ascending."""
        return sharded_knn_l2(query, self, k)


def _check(query, corpus: ShardedCorpus, k: int, op: str):
    q = jnp.asarray(query, dtype=jnp.float32)
    if q.ndim not in (1, 2) or q.shape[-1] != corpus.dimension:
        raise ContractError(
            f"innr_tpu::{op}: query shape {q.shape} != dimension "
            f"{corpus.dimension}"
        )
    if k <= 0 or corpus.num_vectors == 0:
        return q, 0
    return q, min(int(k), corpus.num_vectors)


def sharded_knn_dot(query, corpus: ShardedCorpus, k: int):
    """Distributed batch_knn_dot over a :class:`ShardedCorpus`.

    ``query`` may be (D,) or a (Q, D) batch — all queries share the
    per-shard scan and one collective merge.
    """
    q, k = _check(query, corpus, k, "sharded_knn_dot")
    if k == 0:
        return jnp.zeros((0,), jnp.float32), jnp.zeros((0,), jnp.int32)
    return _sharded_knn(q, corpus.rows, k, False, corpus.n_true, corpus.mesh)


def sharded_knn_l2(query, corpus: ShardedCorpus, k: int):
    """Distributed batch_knn (L2^2) over a :class:`ShardedCorpus`.
    Accepts (D,) or (Q, D) queries."""
    q, k = _check(query, corpus, k, "sharded_knn_l2")
    if k == 0:
        return jnp.zeros((0,), jnp.float32), jnp.zeros((0,), jnp.int32)
    return _sharded_knn(q, corpus.rows, k, True, corpus.n_true, corpus.mesh)
