"""Pallas TPU kernels — innr_tpu's native layer.

The reference's native layer is ~3,000 lines of hand-written AVX-512 / NEON
intrinsics (``src/arch/``). The TPU analog is this package: Mosaic/Pallas
kernels for the ops where fusion or streaming semantics beat what XLA emits
from the jnp layer:

- :mod:`innr_tpu.kernels.knn` — fused score + streaming top-k over corpus
  tiles (replaces score materialization + sort).
- :mod:`innr_tpu.kernels.hamming` — XOR + popcount batch Hamming over packed
  words.
- :mod:`innr_tpu.kernels.ternary` — sign-agreement popcount batch dot.

Every kernel has a jnp reference implementation as fallback and oracle; on
non-TPU backends kernels run in interpreter mode so the differential tests
execute everywhere (the analog of the reference testing AVX-512 under Intel
SDE emulation, ``.github/workflows/ci.yml:94-115``).
"""

import jax


def should_interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (CPU tests, SDE analog)."""
    return jax.default_backend() != "tpu"
