"""Columnar Table: the engine's relation representation.

The reference keeps each relation as bare i32 device buffers handled one
memref at a time (reference join_v1.mlir:546-561 allocates host columns and
gpu.allocs device copies; Experiments/passing-memrefs.mlir:3-30 prototypes a
generic N-column table ABI). Here a relation is a named dict of fixed-width
device arrays of equal length — the idiomatic JAX representation: a pytree
that passes transparently through jit / shard_map.
"""
from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Table:
    """A columnar relation: equal-length 1-D columns keyed by name.

    Columns are device arrays (or numpy arrays pre-placement). All columns
    must share the same length (the row count).
    """

    columns: dict

    def __post_init__(self):
        lengths = {name: int(col.shape[0]) for name, col in self.columns.items()}
        if len(set(lengths.values())) > 1:
            raise ValueError(f"ragged columns: {lengths}")

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        names = tuple(sorted(self.columns))
        return tuple(self.columns[n] for n in names), names

    @classmethod
    def tree_unflatten(cls, names, children):
        obj = cls.__new__(cls)
        obj.columns = dict(zip(names, children))
        return obj

    # -- convenience --------------------------------------------------------
    @property
    def num_rows(self) -> int:
        if not self.columns:
            return 0
        return int(next(iter(self.columns.values())).shape[0])

    @property
    def column_names(self) -> tuple:
        return tuple(self.columns)

    def __getitem__(self, name: str):
        return self.columns[name]

    def select(self, *names: str) -> "Table":
        return Table({n: self.columns[n] for n in names})

    def with_column(self, name: str, col) -> "Table":
        new = dict(self.columns)
        new[name] = col
        return Table(new)

    def gather(self, row_ids) -> "Table":
        """Materialize the given rows of every column (device gather)."""
        return Table({n: jnp.take(c, row_ids, axis=0) for n, c in self.columns.items()})

    def to_numpy(self) -> Mapping[str, np.ndarray]:
        return {n: np.asarray(c) for n, c in self.columns.items()}

    def device_put(self, sharding=None) -> "Table":
        return Table(
            {n: jax.device_put(c, sharding) for n, c in self.columns.items()}
        )

    @classmethod
    def from_numpy(cls, cols: Mapping[str, np.ndarray]) -> "Table":
        return cls({n: jnp.asarray(c) for n, c in cols.items()})

    @classmethod
    def arange_index(cls, n: int, name: str = "rowid") -> "Table":
        """0..n-1 index column (reference shared.cpp:35-41 initRelationIndex)."""
        return cls({name: jnp.arange(n, dtype=jnp.int32)})
