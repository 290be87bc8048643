"""Table-level join API: the engine-user surface over the id-pair drivers.

The reference materializes full result rows in its nested-loop path
(reference nested-loop.mlir:170-183: every column of both tables minus the
duplicated key) but its hash join only emits rowID pairs
(join_v1.mlir:498-500). Here every join materializes Tables: ids from the
fast sort-merge pipeline, columns gathered per the nested-loop convention
(r_* columns, s_* columns, S's key column dropped).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpujoin.core.table import Table
from tpujoin.ops.merge_join import (
    anti_join,
    left_outer_join,
    merge_join,
    semi_join,
)
from tpujoin.ops.multi_join import hash_join_multi
from tpujoin.ops.nested_loop_join import materialize_join_rows


def join_tables(
    r: Table,
    s: Table,
    on: str | list[str] = "key",
    *,
    how: str = "inner",
    result_pad_multiple: int = 1 << 16,
) -> Table:
    """Join two Tables on one or more key columns; returns the materialized
    result Table. ``how`` in {'inner', 'left', 'semi', 'anti'}:

    - inner: all matching row pairs, columns r_* + s_* (minus S's key copy)
    - left: inner plus unmatched R-side... note: 'left' here keeps every
      PROBE (s) row, matching the probe-side outer join of the id driver;
      unmatched s rows carry r_* columns from row 0 with r_matched = False
    - semi/anti: the filtered S rows themselves (no column prefixing)
    """
    keys = [on] if isinstance(on, str) else list(on)
    key0 = keys[0]

    if how == "semi":
        ids = semi_join(np.asarray(r[key0]), np.asarray(s[key0]),
                        row_pad_multiple=result_pad_multiple) \
            if len(keys) == 1 else _multi_semi(r, s, keys, result_pad_multiple)
        return s.gather(jnp.asarray(ids))
    if how == "anti":
        if len(keys) != 1:
            matched = _multi_semi(r, s, keys, result_pad_multiple)
            mask = np.ones(s.num_rows, bool)
            mask[matched] = False
            ids = np.nonzero(mask)[0].astype(np.int32)
        else:
            ids = anti_join(np.asarray(r[key0]), np.asarray(s[key0]),
                            row_pad_multiple=result_pad_multiple)
        return s.gather(jnp.asarray(ids))

    if len(keys) > 1:
        r_ids, s_ids = hash_join_multi(r, s, keys,
                                       result_pad_multiple=result_pad_multiple)
        if how == "inner":
            return materialize_join_rows(r, s, r_ids, s_ids, key_column=key0)
        if how == "left":
            # probe-side outer: inner pairs plus every unmatched s row,
            # same convention as the single-key path below (r_* columns
            # from row 0 with r_matched = False)
            mask = np.ones(s.num_rows, bool)
            mask[np.unique(s_ids)] = False
            unmatched = np.nonzero(mask)[0].astype(np.int32)
            r_full = np.concatenate(
                [r_ids, np.zeros(len(unmatched), np.int32)])
            s_full = np.concatenate([s_ids, unmatched])
            matched = np.concatenate(
                [np.ones(len(r_ids), bool), np.zeros(len(unmatched), bool)])
            out = materialize_join_rows(r, s, r_full, s_full,
                                        key_column=key0)
            return out.with_column("r_matched", jnp.asarray(matched))
        raise ValueError(f"unknown how={how!r}")

    rk = np.asarray(r[key0])
    sk = np.asarray(s[key0])
    if how == "inner":
        r_ids, s_ids = merge_join(rk, sk,
                                  result_pad_multiple=result_pad_multiple)
        return materialize_join_rows(r, s, r_ids, s_ids, key_column=key0)
    if how == "left":
        r_ids, s_ids = left_outer_join(rk, sk,
                                       result_pad_multiple=result_pad_multiple)
        matched = r_ids >= 0
        out = materialize_join_rows(
            r, s, np.where(matched, r_ids, 0).astype(np.int32), s_ids,
            key_column=key0)
        return out.with_column("r_matched", jnp.asarray(matched))
    raise ValueError(f"unknown how={how!r}")


def _multi_semi(r, s, keys, pad):
    r_ids, s_ids = hash_join_multi(r, s, keys, result_pad_multiple=pad)
    return np.unique(s_ids)
