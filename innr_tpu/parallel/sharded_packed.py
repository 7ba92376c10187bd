"""Distributed search over sharded packed (binary) corpora.

Extends the distributed kNN merge to 1-bit corpora: packed words shard
row-wise across the mesh, each device runs a local XOR+popcount scan plus
integer top-k, and the (count, global index) candidates merge over ICI —
32x less HBM and ICI traffic than the f32 path for the same corpus.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from innr_tpu.ops.binary import PackedBinary, _mask_padding, _num_words, _pack_bits
from innr_tpu.parallel.sharded import AXIS, default_mesh
from innr_tpu.utils.asserts import ContractError
from innr_tpu.utils.padding import pad_axis_to, round_up

__all__ = ["ShardedPackedBinary"]

_INT_MIN = jnp.iinfo(jnp.int32).min


def _local_binary_topk(q_words, words_shard, n_total, k):
    shard_rows = words_shard.shape[0]
    counts = jnp.sum(
        jax.lax.population_count(words_shard ^ q_words[None, :]).astype(jnp.int32),
        axis=1,
    )
    keys = -counts  # smaller Hamming = better
    base = jax.lax.axis_index(AXIS) * shard_rows
    gidx = base + jnp.arange(shard_rows, dtype=jnp.int32)
    keys = jnp.where(gidx < n_total, keys, _INT_MIN)
    top_keys, tidx = jax.lax.top_k(keys, k)
    return top_keys, gidx[tidx]


@partial(jax.jit, static_argnames=("k", "n_total", "mesh"))
def _sharded_binary_knn(q_words, words_sharded, k: int, n_total: int, mesh: Mesh):
    local = jax.shard_map(
        partial(_local_binary_topk, n_total=n_total, k=k),
        mesh=mesh,
        in_specs=(P(), P(AXIS, None)),
        out_specs=(P(AXIS), P(AXIS)),
    )
    keys, gidx = local(q_words, words_sharded)
    merged_keys, pos = jax.lax.top_k(keys, k)
    return (-merged_keys).astype(jnp.uint32), gidx[pos]


class ShardedPackedBinary:
    """A packed binary corpus sharded row-wise across a device mesh."""

    def __init__(self, words, dimension: int, mesh: Mesh | None = None):
        words = jnp.asarray(words, dtype=jnp.uint32)
        if words.ndim != 2 or words.shape[1] != _num_words(dimension):
            raise ContractError(
                f"ShardedPackedBinary: words shape {words.shape} doesn't "
                f"match dimension {dimension}"
            )
        words = _mask_padding(words, dimension)
        self.mesh = mesh if mesh is not None else default_mesh()
        n_devices = self.mesh.devices.size
        self.n_true = int(words.shape[0])
        self._dimension = int(dimension)
        n_pad = round_up(max(self.n_true, n_devices), n_devices)
        words = pad_axis_to(words, 0, n_pad)
        self.words = jax.device_put(words, NamedSharding(self.mesh, P(AXIS, None)))

    @classmethod
    def encode(cls, rows, threshold: float = 0.0, mesh: Mesh | None = None):
        rows = jnp.asarray(rows, dtype=jnp.float32)
        return cls(
            _pack_bits(rows > jnp.float32(threshold)), int(rows.shape[1]), mesh
        )

    @property
    def num_vectors(self) -> int:
        return self.n_true

    @property
    def dimension(self) -> int:
        return self._dimension

    def memory_bytes(self) -> int:
        return int(self.words.size) * 4

    def knn(self, query: PackedBinary, k: int):
        """Distributed top-k smallest Hamming: returns
        ``(counts ascending, global indices)``."""
        if query.dimension != self._dimension:
            raise ContractError(
                f"ShardedPackedBinary.knn: dimension mismatch "
                f"({query.dimension} vs {self._dimension})"
            )
        if k <= 0 or self.n_true == 0:
            return (
                jnp.zeros((0,), jnp.uint32),
                jnp.zeros((0,), jnp.int32),
            )
        k = min(int(k), self.n_true)
        return _sharded_binary_knn(query.words, self.words, k, self.n_true, self.mesh)
