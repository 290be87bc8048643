"""Table persistence and ingestion.

The reference generates data in-process and keeps nothing (its relations
die with the run; SURVEY.md §2.2). An engine needs a storage boundary:
columnar save/load in two formats —

- ``.npz``: one compressed archive per table (portable, self-describing)
- raw column directory: one little-endian binary file per column plus a
  tiny JSON schema — the memory-mappable layout for large tables (loads
  are zero-copy on the host; device transfer happens on first use).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from tpujoin.core.table import Table

def save_table_npz(table: Table, path) -> None:
    np.savez_compressed(path, **table.to_numpy())


def load_table_npz(path) -> Table:
    with np.load(path) as z:
        return Table.from_numpy({k: z[k] for k in z.files})


def save_table_dir(table: Table, path) -> None:
    """One raw binary file per column + schema.json."""
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    schema = {}
    for name, col in table.to_numpy().items():
        arr = np.ascontiguousarray(col)
        arr.tofile(p / f"{name}.bin")
        schema[name] = {"dtype": str(arr.dtype), "rows": int(arr.shape[0])}
    (p / "schema.json").write_text(json.dumps(schema, indent=2))


def load_table_dir(path, *, mmap: bool = True) -> Table:
    """Load a raw column directory; ``mmap`` keeps columns memory-mapped on
    the host until first device use (no upfront copy for large tables)."""
    p = Path(path)
    schema = json.loads((p / "schema.json").read_text())
    cols = {}
    for name, meta in schema.items():
        dtype = np.dtype(meta["dtype"])  # any numpy dtype string roundtrips
        f = p / f"{name}.bin"
        if mmap:
            cols[name] = np.memmap(f, dtype=dtype, mode="r",
                                   shape=(meta["rows"],))
        else:
            cols[name] = np.fromfile(f, dtype=dtype, count=meta["rows"])
    # numpy/memmap columns are fine pre-device-placement; the constructor
    # still validates equal lengths against a corrupted schema
    return Table(cols)
