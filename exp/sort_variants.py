#!/usr/bin/env python
"""Measure sort-phase design variants on TPU (the three 100M-row sorts —
build keyval, probe keyval, materialize compaction — are the non-kernel
half of the low-selectivity total).

Count/build-phase variants (sort (key, id) -> sorted keys + permutation):
  keyval2     lax.sort((key_i32, id_i32), num_keys=1)       [shipped r2]
  packed64    ONE i64 array sort of key*2^b + id, b = ceil_log2(n); unpack
              = arithmetic shift / mask. Same bytes per row as keyval2 but
              a single sorted stream instead of key+payload.
  keys_only   lax.sort(key_i32) — no permutation; lower bound on any
              variant (what the sort costs when ids are not carried).

Compaction variants (stable partition of ~10%-matched rows to the front):
  compact4    lax.sort((z, lo, cnt, sid), num_keys=1)       [shipped r2]
  compact3    z folded into the key: matched rows already carry
              non-decreasing lo (sorted-probe order), so a STABLE sort on
              where(cnt>0, lo, SENTINEL) is the same partition with one
              fewer operand.
  compact2g   2-ary sort (masked_lo, row_idx); cnt/sid recovered by TWO
              O(k_cap) gathers instead of riding the 100M-wide sort.
  compactp    ONE i64 sort of masked_lo*2^b + row_idx, then the same two
              O(k_cap) gathers. The minimum possible sorted bytes.

All packed variants derive the id shift from n and assert the packing is
lossless (key_max * 2^b + n < 2^63); ids never spill into key bits.

Usage: python exp/sort_variants.py [--rows N] [--kcap N]
"""
from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.utils.timing import time_fn


def id_bits(n: int) -> int:
    return max(int(n - 1).bit_length(), 1)


@functools.partial(jax.jit, static_argnames=("bits",))
def _packed_sort(k, i, bits: int):
    with jax.enable_x64(True):
        p = (k.astype(jnp.int64) << bits) | i.astype(jnp.int64)
        s = jax.lax.sort(p)
        return (s >> bits).astype(jnp.int32), \
            (s & jnp.int64((1 << bits) - 1)).astype(jnp.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--kcap", type=int, default=16 << 20,
                    help="compacted-width cap for the gather variants")
    args = ap.parse_args()
    n, k_cap = args.rows, args.kcap
    bits = id_bits(n)
    assert (1_000_000_000 << bits) < (1 << 63), "packing would be lossy"
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(1, 1_000_000_000, n).astype(np.int32))
    ids = jnp.arange(n, dtype=jnp.int32)
    # compaction-shaped inputs: ~10% matched, counts small
    cnt = jnp.asarray((rng.random(n) < 0.1).astype(np.int32)
                      * rng.integers(1, 4, n).astype(np.int32))
    lo = jnp.asarray(np.sort(rng.integers(0, n, n).astype(np.int32)))
    sent = jnp.int32(n)  # > any matched lo (matched rows have lo < n)

    @jax.jit
    def keyval2(k, i):
        return jax.lax.sort((k, i), num_keys=1)

    def packed64(k, i):
        return _packed_sort(k, i, bits)

    @jax.jit
    def keys_only(k):
        return jax.lax.sort(k)

    @jax.jit
    def compact4(lo_, cnt_, sid_):
        z = (cnt_ == 0).astype(jnp.int32)
        _, a, b, c = jax.lax.sort((z, lo_, cnt_, sid_), num_keys=1)
        return a, b, c

    @jax.jit
    def compact3(lo_, cnt_, sid_):
        # NOTE on adoption: the tail (unmatched rows) carries SENTINEL in
        # the lo column; any consumer using lo as a DMA/slab offset must
        # clamp the tail first (the gather variants below rebuild a clean
        # lo_c = where(matched, lo, 0) instead).
        mlo = jnp.where(cnt_ > 0, lo_, sent)
        a, b, c = jax.lax.sort((mlo, cnt_, sid_), num_keys=1)
        return a, b, c

    @jax.jit
    def compact2g(lo_, cnt_, sid_):
        mlo = jnp.where(cnt_ > 0, lo_, sent)
        row = jnp.arange(n, dtype=jnp.int32)
        mlo_s, perm = jax.lax.sort((mlo, row), num_keys=1)
        pc = jax.lax.slice_in_dim(perm, 0, k_cap)
        lo_c = jnp.where(jax.lax.slice_in_dim(mlo_s, 0, k_cap) >= sent, 0,
                         jax.lax.slice_in_dim(mlo_s, 0, k_cap))
        return lo_c, jnp.take(cnt_, pc), jnp.take(sid_, pc)

    def compactp(lo_, cnt_, sid_):
        mlo = jnp.where(cnt_ > 0, lo_, sent)
        row = jnp.arange(n, dtype=jnp.int32)
        mlo_s, perm = _packed_sort(mlo, row, bits)
        pc = jax.lax.slice_in_dim(perm, 0, k_cap)
        mlo_c = jax.lax.slice_in_dim(mlo_s, 0, k_cap)
        lo_c = jnp.where(mlo_c >= sent, 0, mlo_c)
        return lo_c, jnp.take(cnt_, pc), jnp.take(sid_, pc)

    for name, fn, a in (
            ("keyval2", keyval2, (keys, ids)),
            ("packed64", packed64, (keys, ids)),
            ("keys_only", keys_only, (keys,)),
            ("compact4", compact4, (lo, cnt, ids)),
            ("compact3", compact3, (lo, cnt, ids)),
            ("compact2g", compact2g, (lo, cnt, ids)),
            ("compactp", compactp, (lo, cnt, ids))):
        stat = time_fn(lambda: fn(*a), iters=3, name=name)
        print(f"{name:10s} {stat.seconds:.3f} s", flush=True)

    # equivalence check at small n (k_cap > nonzero so gather variants
    # cover the whole matched prefix)
    m = 1 << 16
    kc = 1 << 14
    k2, i2 = keys[:m], ids[:m]
    sk1, si1 = keyval2(k2, i2)
    sk2, si2 = _packed_sort(k2, i2, id_bits(m))
    assert bool(jnp.all(sk1 == sk2)) and bool(jnp.all(si1 == si2))
    lo_m = jnp.minimum(lo[:m], m - 1)
    nz = int(jnp.sum(cnt[:m] > 0))
    assert nz < kc
    a4 = compact4(lo_m, cnt[:m], ids[:m])
    sent_m = jnp.int32(m)

    @jax.jit
    def compact2g_m(lo_, cnt_, sid_):
        mlo = jnp.where(cnt_ > 0, lo_, sent_m)
        row = jnp.arange(m, dtype=jnp.int32)
        mlo_s, perm = jax.lax.sort((mlo, row), num_keys=1)
        pc = perm[:kc]
        mlo_c = mlo_s[:kc]
        return (jnp.where(mlo_c >= sent_m, 0, mlo_c),
                jnp.take(cnt_, pc), jnp.take(sid_, pc))

    def compactp_m(lo_, cnt_, sid_):
        mlo = jnp.where(cnt_ > 0, lo_, sent_m)
        row = jnp.arange(m, dtype=jnp.int32)
        mlo_s, perm = _packed_sort(mlo, row, id_bits(m))
        pc = perm[:kc]
        mlo_c = mlo_s[:kc]
        return (jnp.where(mlo_c >= sent_m, 0, mlo_c),
                jnp.take(cnt_, pc), jnp.take(sid_, pc))

    for variant in (compact2g_m, compactp_m):
        ag = variant(lo_m, cnt[:m], ids[:m])
        for x4, xg in zip(a4, ag):
            assert bool(jnp.all(x4[:nz] == xg[:nz])), variant
    print("equivalence OK")


if __name__ == "__main__":
    main()
