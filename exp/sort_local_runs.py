#!/usr/bin/env python
"""Design-space: batched lax.sort cost vs run length (VERDICT r4 #2).

The planned Pallas sort is hybrid: XLA's lax.sort produces sorted RUNS of
length L (a batched (N/L, L) sort — row sorts are independent, so XLA pays
only the intra-row network), then Pallas bitonic merge passes (one HBM
round trip per doubling) take L -> N. This table measures the XLA half:
how much of the full-sort cost does lax.sort shed when the sort is
row-local?  The full (key, id) unstable sort at N=2^27 is the 0.42 s bar
(exp/count_sort_variants.py); each halving of per-pass count saves
~15 ms modeled, so L is chosen to minimize
    t_batched(L) + n_passes(L) * t_merge_pass.

Usage: python exp/sort_local_runs.py [--n LOG2N]
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp

from tpujoin.utils.timing import time_fn


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=27, help="log2 total rows")
    args = ap.parse_args()
    n = 1 << args.n

    keys = jax.random.randint(jax.random.PRNGKey(3), (n,), 1,
                              1_000_000_000, jnp.int32)
    ids = jnp.arange(n, dtype=jnp.int32)
    jax.block_until_ready((keys, ids))

    @jax.jit
    def full(keys, ids):
        return jax.lax.sort((keys, ids), num_keys=1, is_stable=False)

    rows = []
    st = time_fn(full, keys, ids, name="full_2^%d" % args.n, rows=n)
    eprint(json.dumps(st.as_dict()))
    rows.append({"L": n, "seconds": st.seconds})

    for logl in (24, 22, 20, 18, 16, 14, 12):
        L = 1 << logl
        if L >= n:
            continue

        @jax.jit
        def batched(keys, ids, L=L):
            k2 = keys.reshape(n // L, L)
            i2 = ids.reshape(n // L, L)
            ks, is_ = jax.lax.sort((k2, i2), num_keys=1, is_stable=False)
            return ks.reshape(n), is_.reshape(n)

        st = time_fn(batched, keys, ids, name=f"runs_2^{logl}", rows=n)
        eprint(json.dumps(st.as_dict()))
        rows.append({"L": L, "seconds": st.seconds,
                     "passes_to_full": args.n - logl})
    print(json.dumps({"exp": "sort_local_runs", "n": n, "rows": rows}))


if __name__ == "__main__":
    main()
