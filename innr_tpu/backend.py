"""Kernel-selection introspection: which execution path will actually run.

TPU port of reference ``src/backend.rs``: dispatch is derived from shape,
platform, and the force-reference knob, and is invisible to callers; these
functions report the decision so perf work and bug reports don't re-derive
it. Display strings are stable (they appear in logs and bug reports —
renaming is a breaking change, reference ``src/backend.rs:114-120``).
"""

from __future__ import annotations

import enum

from innr_tpu import config

__all__ = ["Backend", "dense_backend", "batch_backend", "slot_backend"]


class Backend(enum.Enum):
    """An execution path the dispatchers can select."""

    # Fused Pallas kernel (the hand-written native layer).
    PALLAS = "pallas"
    # XLA matmul on the systolic array (batch scores).
    MXU = "mxu"
    # XLA elementwise/reduction code on the vector unit.
    VPU = "vpu"
    # Forced jnp/NumPy reference path (the portable-layer analog).
    REFERENCE = "reference"

    def __str__(self) -> str:
        return self.value


def dense_backend(length: int) -> Backend:
    """Path the single-pair dense f32 ops take for ``length``-dim vectors.

    Single pairs are always VPU reductions on TPU — there is no length
    threshold because there is no dispatch overhead to amortize (the
    reference's MIN_DIM_SIMD exists to pay for ISA dispatch; XLA pays it at
    compile time).
    """
    if config.reference_forced():
        return Backend.REFERENCE
    return Backend.VPU


def batch_backend(num_rows: int) -> Backend:
    """Path the batch kNN scans take for a ``num_rows``-vector corpus:
    the fused Pallas streaming kernel above ``MIN_ROWS_PALLAS``, otherwise
    an MXU matmul + total-order top-k."""
    if config.reference_forced():
        return Backend.REFERENCE
    if num_rows >= config.MIN_ROWS_PALLAS:
        return Backend.PALLAS
    return Backend.MXU


def slot_backend(length: int) -> Backend:
    """Path the slot-Hamming ops take for ``length``-slot sketches."""
    if config.reference_forced():
        return Backend.REFERENCE
    return Backend.VPU
