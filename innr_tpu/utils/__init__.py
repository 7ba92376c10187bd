"""Shared utilities: contract checks, IEEE total ordering, tile padding."""

from innr_tpu.utils.asserts import (
    ContractError,
    check_same_length,
    check_rank,
)
from innr_tpu.utils.order import (
    total_order_key_f32,
    argsort_total,
    top_k_total,
)
from innr_tpu.utils.padding import round_up, pad_axis_to

__all__ = [
    "ContractError",
    "check_same_length",
    "check_rank",
    "total_order_key_f32",
    "argsort_total",
    "top_k_total",
    "round_up",
    "pad_axis_to",
]
