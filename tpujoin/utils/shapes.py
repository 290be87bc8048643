"""Shape/tile math helpers (the analogue of @calculateNumberOfBlocks,
reference join_v1.mlir:43-52)."""
from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round x up to a multiple of m (m >= 1). Used to bucket dynamic result
    sizes into a small set of static capacities so XLA recompiles rarely."""
    if x <= 0:
        return m
    return cdiv(x, m) * m


def next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()
