#!/usr/bin/env python
"""Design-space measurement: the count phase's SORT half (VERDICT r3 #2).

The v2 count phase = one 2-operand (key, id) probe sort (~0.44 s at 100M)
+ kernels.merge_count (~0.58 s, design-space-proven optimal in
exp/count_variants.py); the build phase is another (key, id) sort. This
table measures every plausible replacement for the keyval sort on the
real chip:

  kv_stable    jax.lax.sort((keys, ids), num_keys=1) — the shipped form
  kv_unstable  same with is_stable=False (stability is NOT needed: ids
               are distinct, and the join result is an unordered multiset)
  packed_i64   ONE single-operand sort of (key << 32 | id) in emulated
               x64 — no payload lane at all; key+id recovered by shifts
  keys_only    jax.lax.sort(keys) — the no-payload floor (NOT a usable
               count path: the sort permutation is unrecoverable without
               a payload lane; included as the lower bound)
  concat_2x    one 2n-wide keyval sort vs two n-wide (can build+probe
               share one sort launch?)

Radix pre-bucketing is NOT measured because its binning pass is a
scatter: CLAUDE.md's measured constants put element scatters at ~2.6 s
per 100M rows — 6x the whole sort it would accelerate — and a sort-based
binning IS the sort being replaced. The gather-based recovery of a
keys-only sort dies on the same constant (~73M idx/s).

Usage: python exp/count_sort_variants.py [--rows N]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.utils.timing import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    args = ap.parse_args()
    n = args.rows

    keys = jax.random.randint(jax.random.PRNGKey(3), (n,), 1,
                              1_000_000_000, jnp.int32)
    ids = jnp.arange(n, dtype=jnp.int32)
    jax.block_until_ready((keys, ids))
    exp_sorted = np.sort(np.asarray(keys))

    # big arrays are ARGUMENTS, never jit-closure constants (an embedded
    # 100M-element HLO constant kills the remote compile tunnel)
    @jax.jit
    def kv_stable(keys, ids):
        return jax.lax.sort((keys, ids), num_keys=1)

    @jax.jit
    def kv_unstable(keys, ids):
        return jax.lax.sort((keys, ids), num_keys=1, is_stable=False)

    @jax.jit
    def packed_i64(keys, ids):
        with jax.enable_x64(True):
            p = (keys.astype(jnp.int64) << 32) | ids.astype(jnp.int64)
            sp = jax.lax.sort(p, is_stable=False)
            return (sp >> 32).astype(jnp.int32), \
                   (sp & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)

    @jax.jit
    def keys_only(keys):
        return jax.lax.sort(keys)

    keys2 = jnp.concatenate([keys, keys[::-1]])
    ids2 = jnp.concatenate([ids, ids])
    jax.block_until_ready((keys2, ids2))

    @jax.jit
    def concat_2x(keys2, ids2):
        return jax.lax.sort((keys2, ids2), num_keys=1)

    for name, fn in (
            ("kv_stable", lambda: kv_stable(keys, ids)),
            ("kv_unstable", lambda: kv_unstable(keys, ids)),
            ("packed_i64", lambda: packed_i64(keys, ids)),
            ("keys_only", lambda: keys_only(keys)),
            ("concat_2x", lambda: concat_2x(keys2, ids2))):
        out = fn()
        k_out = np.asarray(out[0] if isinstance(out, tuple) else out)
        if name == "concat_2x":
            ok = True   # different data; timing row only
        else:
            ok = np.array_equal(k_out, exp_sorted)
            if name in ("kv_unstable", "packed_i64"):
                i_out = np.asarray(out[1])
                ok = ok and np.array_equal(np.asarray(keys)[i_out], exp_sorted)
        stat = time_fn(fn, name=name, rows=n, warmup=1, iters=3)
        print(f"{name:>12}: {stat.seconds:.3f} s "
              f"({n / stat.seconds / 1e6:.0f}M rows/s) "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
