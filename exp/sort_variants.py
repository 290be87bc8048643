#!/usr/bin/env python
"""Measure sort-phase design variants on TPU (the remaining ~1.5 s of the
low-selectivity total is three 100M-row XLA sorts).

Variants:
  keyval2     lax.sort((key_i32, id_i32), num_keys=1)       [shipped]
  packed64    lax.sort(key_i32 << 27 | id) as ONE i64 array (keys < 2^30,
              ids < 2^27 at 100M rows; unpack = shift/mask)
  compact4    lax.sort((z, lo, cnt, sid), num_keys=1)       [shipped]
  compact3    lax.sort((masked_lo, cnt, sid), num_keys=1) — z folded into
              the key: matched rows already carry ascending lo, so a
              STABLE sort on where(cnt>0, lo, INT_MAX) is the same stable
              partition with 4 fewer payload bytes/row.

Usage: python exp/sort_variants.py [--rows N]
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
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(1, 1_000_000_000, n).astype(np.int32))
    ids = jnp.arange(n, dtype=jnp.int32)
    # compaction-shaped inputs: ~10% matched, counts small
    cnt = jnp.asarray((rng.random(n) < 0.1).astype(np.int32)
                      * rng.integers(1, 4, n).astype(np.int32))
    lo = jnp.asarray(np.sort(rng.integers(0, n, n).astype(np.int32)))

    @jax.jit
    def keyval2(k, i):
        return jax.lax.sort((k, i), num_keys=1)

    @jax.jit
    def packed64(k, i):
        with jax.enable_x64(True):
            p = (k.astype(jnp.int64) << 27) | i.astype(jnp.int64)
            s = jax.lax.sort(p)
            return (s >> 27).astype(jnp.int32), \
                (s & jnp.int64((1 << 27) - 1)).astype(jnp.int32)

    @jax.jit
    def compact4(lo_, cnt_, sid_):
        z = (cnt_ == 0).astype(jnp.int32)
        _, a, b, c = jax.lax.sort((z, lo_, cnt_, sid_), num_keys=1)
        return a, b, c

    @jax.jit
    def compact3(lo_, cnt_, sid_):
        big = jnp.int32(0x7FFFFFFF)
        mlo = jnp.where(cnt_ > 0, lo_, big)
        a, b, c = jax.lax.sort((mlo, cnt_, sid_), num_keys=1)
        return a, b, c

    for name, fn, a in (
            ("keyval2", keyval2, (keys, ids)),
            ("packed64", packed64, (keys, ids)),
            ("compact4", compact4, (lo, cnt, ids)),
            ("compact3", compact3, (lo, cnt, ids))):
        stat = time_fn(lambda: fn(*a), iters=3, name=name)
        print(f"{name:10s} {stat.seconds:.3f} s")

    # equivalence check at small n
    m = 1 << 16
    k2 = keys[:m]
    i2 = ids[:m]
    sk1, si1 = keyval2(k2, i2)
    sk2, si2 = packed64(k2, i2)
    assert bool(jnp.all(sk1 == sk2)) and bool(jnp.all(si1 == si2))
    a4 = compact4(lo[:m], cnt[:m], ids[:m])
    a3 = compact3(lo[:m], cnt[:m], ids[:m])
    nz = int(jnp.sum(cnt[:m] > 0))
    for x4, x3 in zip(a4, a3):
        assert bool(jnp.all(x4[:nz] == x3[:nz]))
    print("equivalence OK")


if __name__ == "__main__":
    main()
