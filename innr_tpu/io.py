"""Persistence helpers for the corpus/quantized containers.

The reference's only persistence surface is raw-data accessors
(``VerticalBatch::data`` src/batch.rs:212, ``PackedBinary::data``
src/binary.rs:71, ...) — callers own serialization. innr_tpu preserves the
accessors and additionally provides explicit npz save/load, since a serving
framework needs restartable indexes. Formats are plain numpy archives; no
framework lock-in.
"""

from __future__ import annotations

import numpy as np

from innr_tpu.batch import VerticalBatch
from innr_tpu.ops.binary import PackedBinary, PackedBinaryBatch
from innr_tpu.ops.scalar import QuantizationParams, QuantizedU8Batch
from innr_tpu.ops.slot import SketchCorpus
from innr_tpu.ops.sparse import SparseCorpus
from innr_tpu.ops.ternary import PackedTernary, PackedTernaryBatch
from innr_tpu.segmented import SegmentedCorpus
from innr_tpu.utils.asserts import ContractError

__all__ = ["save_npz", "load_npz"]

_KINDS = {
    "VerticalBatch",
    "PackedBinary",
    "PackedBinaryBatch",
    "PackedTernary",
    "PackedTernaryBatch",
    "QuantizedU8Batch",
    "SketchCorpus",
    "SparseCorpus",
    "SegmentedCorpus",
}


def save_npz(path: str, obj) -> None:
    """Serialize a container to an npz archive."""
    if isinstance(obj, VerticalBatch):
        rows = np.asarray(obj.rows)
        if rows.dtype == np.float32:
            np.savez(path, kind="VerticalBatch", rows=rows)
        else:
            # bf16 corpora: npz has no bfloat16 — store the raw bit pattern.
            np.savez(
                path, kind="VerticalBatch", rows_bf16=rows.view(np.uint16)
            )
    elif isinstance(obj, PackedBinary):
        np.savez(
            path,
            kind="PackedBinary",
            words=np.asarray(obj.words),
            dimension=obj.dimension,
        )
    elif isinstance(obj, PackedBinaryBatch):
        np.savez(
            path,
            kind="PackedBinaryBatch",
            words=np.asarray(obj.words),
            dimension=obj.dimension,
        )
    elif isinstance(obj, PackedTernary):
        np.savez(
            path,
            kind="PackedTernary",
            pos=np.asarray(obj.pos),
            neg=np.asarray(obj.neg),
            dimension=obj.dimension,
        )
    elif isinstance(obj, PackedTernaryBatch):
        np.savez(
            path,
            kind="PackedTernaryBatch",
            pos=np.asarray(obj.pos),
            neg=np.asarray(obj.neg),
            dimension=obj.dimension,
        )
    elif isinstance(obj, QuantizedU8Batch):
        np.savez(path, kind="QuantizedU8Batch", codes=np.asarray(obj.codes))
    elif isinstance(obj, SketchCorpus):
        np.savez(path, kind="SketchCorpus", sketches=np.asarray(obj.sketches))
    elif isinstance(obj, SparseCorpus):
        np.savez(
            path,
            kind="SparseCorpus",
            indices=np.asarray(obj.indices),
            values=np.asarray(obj.values),
        )
    elif isinstance(obj, SegmentedCorpus):
        # Compacted view: alive rows + permanent ids + the id counter, so
        # a restored index keeps returning the same ids and never reuses
        # deleted ones.
        segs = obj._segments
        rows = (
            np.concatenate([np.asarray(s_.vb.rows)[s_.alive] for s_ in segs])
            if segs else np.zeros((0, obj.dimension), np.float32)
        )
        ids = (
            np.concatenate([s_.ids[s_.alive] for s_ in segs])
            if segs else np.zeros(0, np.int64)
        )
        np.savez(
            path,
            kind="SegmentedCorpus",
            rows=rows,
            ids=ids,
            dimension=obj.dimension,
            next_id=obj._next_id,
        )
    else:
        raise ContractError(f"save_npz: unsupported container {type(obj).__name__}")


def load_npz(path: str):
    """Load a container previously written by :func:`save_npz`.

    ``QuantizationParams`` travel separately (they are shared corpus-level
    scalars, reference src/scalar.rs:44); persist them as plain floats.
    """
    with np.load(path) as z:
        kind = str(z["kind"])
        if kind not in _KINDS:
            raise ContractError(f"load_npz: unknown container kind {kind!r}")
        if kind == "VerticalBatch":
            if "rows_bf16" in z:
                import jax.numpy as jnp
                import ml_dtypes

                return VerticalBatch(
                    z["rows_bf16"].view(ml_dtypes.bfloat16),
                    dtype=jnp.bfloat16,
                )
            return VerticalBatch(z["rows"])
        if kind == "PackedBinary":
            return PackedBinary(z["words"], int(z["dimension"]))
        if kind == "PackedBinaryBatch":
            return PackedBinaryBatch(z["words"], int(z["dimension"]))
        if kind == "PackedTernary":
            return PackedTernary(z["pos"], z["neg"], int(z["dimension"]))
        if kind == "PackedTernaryBatch":
            return PackedTernaryBatch(z["pos"], z["neg"], int(z["dimension"]))
        if kind == "SketchCorpus":
            return SketchCorpus(z["sketches"])
        if kind == "SparseCorpus":
            return SparseCorpus((z["indices"], z["values"]))
        if kind == "SegmentedCorpus":
            from innr_tpu.segmented import _Segment

            sc = SegmentedCorpus(int(z["dimension"]))
            ids = z["ids"]
            if len(ids):
                sc._segments.append(
                    _Segment(VerticalBatch.from_rows(z["rows"]), ids)
                )
            sc._next_id = int(z["next_id"])
            return sc
        return QuantizedU8Batch(z["codes"])
