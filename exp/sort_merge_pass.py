#!/usr/bin/env python
"""Design-space: Pallas merge sort vs lax.sort at 100M (VERDICT r4 #2).

Measures on the real chip:
  - lax.sort (key,id) unstable at n (the 0.42 s bar) and at the padded
    power of two,
  - sort_pairs_pow2 for a grid of (run_len0, t_out),
  - the per-pass marginal cost (difference between consecutive run_len0).

Every timed variant is verified DEVICE-SIDE first (sorted-key equality
against lax.sort's keys + keys[ids] == sorted — full coverage, no host
readback of 500 MB columns over the sub-MB/s tunnel).

Usage: python exp/sort_merge_pass.py [--logn 27]
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp

from tpujoin.kernels import merge_sort as ms
from tpujoin.utils.timing import time_fn


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=27)
    ap.add_argument("--grid", default="16:16,18:16,20:16,18:17,20:17",
                    help="comma list of logrun:logtout variants")
    args = ap.parse_args()
    n = 1 << args.logn

    keys = jax.random.randint(jax.random.PRNGKey(3), (n,), 1,
                              1_000_000_000, jnp.int32)
    ids = jnp.arange(n, dtype=jnp.int32)
    jax.block_until_ready((keys, ids))

    @jax.jit
    def ref_sort(keys, ids):
        return jax.lax.sort((keys, ids), num_keys=1, is_stable=False)

    k_ref = ref_sort(keys, ids)[0]
    jax.block_until_ready(k_ref)

    @jax.jit
    def check(k, i, keys):
        ok_keys = jnp.array_equal(k, k_ref)
        ok_ids = jnp.all(jnp.take(keys, i) == k)
        return ok_keys & ok_ids

    st = time_fn(ref_sort, keys, ids, name="lax_sort", rows=n)
    eprint(json.dumps(st.as_dict()))
    results = [{"variant": "lax_sort", "seconds": st.seconds}]

    for spec in args.grid.split(","):
        logrun, logt = (int(x) for x in spec.split(":"))
        run_len0, t_out = 1 << logrun, 1 << logt
        name = f"pallas_r{logrun}_t{logt}"
        try:
            k, i = ms.sort_pairs_pow2(keys, ids, run_len0=run_len0,
                                      t_out=t_out, interpret=False)
            ok = bool(check(k, i, keys))
            eprint(f"{name}: verified={ok}")
            if not ok:
                results.append({"variant": name, "verified": False})
                continue
            st = time_fn(lambda: ms.sort_pairs_pow2(
                keys, ids, run_len0=run_len0, t_out=t_out,
                interpret=False), name=name, rows=n)
            eprint(json.dumps(st.as_dict()))
            results.append({"variant": name, "seconds": st.seconds,
                            "passes": args.logn - logrun,
                            "verified": True})
        except Exception as e:  # Mosaic lowering gaps are data, not crashes
            eprint(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results.append({"variant": name, "error": str(e)[:200]})
    print(json.dumps({"exp": "sort_merge_pass", "n": n,
                      "results": results}))


if __name__ == "__main__":
    main()
