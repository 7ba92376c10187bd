"""Op modules (the safe public kernel layer, reference L2)."""

from innr_tpu.ops import (  # noqa: F401
    binary,
    dense,
    dense_f64,
    fast_math,
    maxsim,
    quant,
    reference,
    scalar,
    slot,
    sparse,
    sparse_ext,
    ternary,
    topk,
)
