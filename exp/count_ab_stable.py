#!/usr/bin/env python
"""A/B: probe_count with a stable vs unstable probe sort, in one process
on the real chip. The standalone 2-operand sort measures 0.59 s stable /
0.42 s unstable (exp/count_sort_variants.py), but the round-4 bench saw
count_seconds go 1.02 -> 1.155 after flipping the engine to unstable —
this isolates whether the composite (sort -> merge_count) actually
prefers the stable sort and why.

Usage: python exp/count_ab_stable.py [--rows N]
"""
from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.core import datagen
from tpujoin.kernels.merge_count import merge_count
from tpujoin.ops.hash_join import build
from tpujoin.utils.timing import time_fn


@functools.partial(jax.jit, static_argnames=("stable",))
def count_variant(sorted_build_keys, probe_keys, stable: bool):
    m = probe_keys.shape[0]
    ids = jnp.arange(m, dtype=jnp.int32)
    psk, pid = jax.lax.sort((probe_keys, ids), num_keys=1,
                            is_stable=stable)
    lo, cnt = merge_count(sorted_build_keys, psk)
    return pid, lo, cnt


@functools.partial(jax.jit, static_argnames=("stable",))
def sort_only(probe_keys, stable: bool):
    m = probe_keys.shape[0]
    ids = jnp.arange(m, dtype=jnp.int32)
    return jax.lax.sort((probe_keys, ids), num_keys=1, is_stable=stable)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    args = ap.parse_args()
    n = args.rows

    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(7))
    bk = datagen.make_keys(rng_r, n, 1, 1_000_000_000)
    pk = datagen.make_keys(rng_s, n, 1, 1_000_000_000)
    jax.block_until_ready((bk, pk))
    ht = build(bk)
    jax.block_until_ready(ht.sorted_keys)

    for rep in range(2):
        for stable in (True, False):
            st = time_fn(lambda s=stable: sort_only(pk, s),
                         name=f"sort_only[stable={stable}]", rows=n,
                         warmup=1 if rep == 0 else 0, iters=3)
            print(f"rep{rep} sort_only  stable={stable}: "
                  f"{st.seconds:.3f} s", flush=True)
        for stable in (True, False):
            st = time_fn(lambda s=stable: count_variant(
                ht.sorted_keys, pk, s),
                name=f"count[stable={stable}]", rows=n,
                warmup=1 if rep == 0 else 0, iters=3)
            print(f"rep{rep} sort+merge stable={stable}: "
                  f"{st.seconds:.3f} s", flush=True)


if __name__ == "__main__":
    main()
