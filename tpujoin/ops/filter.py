"""Selection / filter with stream compaction.

Capability parity with the reference's selection kernel
(reference Experiments/selection.mlir:32-157): evaluate a predicate over a
column and densely compact the passing rows.

The reference's 3-step SIMT pattern — per-thread count over strided elements
(:71-80), single-threaded in-block prefix sum (:88-122), atomic global block
offset (:115), then a scatter pass (:139-153) — collapses on TPU into:
mask -> one cumsum over the whole column -> one dense scatter. No atomics,
no block decomposition: the prefix sum that the reference builds from two
levels of cooperation is a single vectorized ``jnp.cumsum``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.core.table import Table
from tpujoin.utils.shapes import round_up


@jax.jit
def filter_count(mask: jax.Array) -> jax.Array:
    """Count phase: exact number of passing rows (the selection analogue of
    the reference's count+prefix pass)."""
    return jnp.sum(mask.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("capacity",))
def filter_materialize(mask: jax.Array, capacity: int):
    """Compact the row ids of passing rows into [capacity] (pad = -1).

    pos = exclusive cumsum of mask gives each passing row its dense output
    slot; failing rows are routed to an out-of-range slot and dropped by the
    scatter — race-free by construction, every slot written at most once.
    """
    n = mask.shape[0]
    mask_i = mask.astype(jnp.int32)
    pos = jnp.cumsum(mask_i) - mask_i
    total = jnp.sum(mask_i)
    ids = jnp.arange(n, dtype=jnp.int32)
    slot = jnp.where(mask, pos, capacity)  # capacity = out-of-range -> dropped
    out = jnp.full((capacity,), -1, dtype=jnp.int32)
    out = out.at[slot].set(ids, mode="drop")
    return out, total


def filter_table(
    table: Table,
    predicate,
    column: str,
    *,
    pad_multiple: int = 1 << 16,
    return_numpy: bool = False,
):
    """Filter driver (replaces @main of selection.mlir:159-195): returns the
    passing rows of ``table`` as a new exact-size Table.

    ``predicate`` is an elementwise jnp function over the column, e.g.
    ``lambda v: v < 80.0`` (the reference's hard-coded predicate at
    selection.mlir:61).
    """
    mask = predicate(table[column])
    total = int(filter_count(mask))
    if total == 0:
        empty = Table({n: jnp.empty((0,), c.dtype) for n, c in table.columns.items()})
        return (empty.to_numpy() if return_numpy else empty)
    cap = round_up(total, pad_multiple)
    ids, _ = filter_materialize(mask, cap)
    out = table.gather(ids[:total])
    if return_numpy:
        return {n: np.asarray(c) for n, c in out.columns.items()}
    return out


@functools.partial(jax.jit, static_argnames=("capacity",))
def filter_device(values: jax.Array, threshold, capacity: int):
    """Single-jit fixed-capacity filter: ids of rows with value < threshold
    (the reference's exact workload, selection.mlir:61) + exact count."""
    mask = values < threshold
    return filter_materialize(mask, capacity)
