#!/usr/bin/env python
"""Design-space: Pallas merge sort vs lax.sort (VERDICT r4 #2).

Measures on the real chip, at the engine's actual 100M-row shape by
default (the earlier power-of-two-only form padded 100M -> 2^27 = 1.34x
work, which alone flipped the comparison):

  lax_sort        the rented bar: 2-operand unstable lax.sort
  pallas_rX_tY    kernels.merge_sort.sort_pairs with run_len0=2^X local
                  tiles (in-VMEM bitonic sort kernel) and t_out=2^Y
                  merge-pass tiles (co-ranked ragged runs, double-
                  buffered slab DMA, half-buffer network)
  local_only      the local-runs kernel alone (the floor of the local
                  phase)
  xla_local_rX    sort_pairs with local="xla" (batched lax.sort runs)

Every timed variant is verified DEVICE-SIDE first (sorted-key equality
against lax.sort's keys + keys[ids] == sorted — full coverage, no host
readback of 500 MB columns over the sub-MB/s tunnel).

Timing: MIN of --iters synced runs. This platform's device/tunnel
injects multi-second stalls at random (measured: identical lax.sort
calls ranging 0.48..8.1 s within one process; the min is tight across
processes — 0.4178/0.4075 on consecutive sessions); medians of 3 are
routinely contaminated, minima are reproducible.

Usage: python exp/sort_merge_pass.py [--rows N] [--iters K]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

from tpujoin.kernels import merge_sort as ms
from tpujoin.utils.timing import _sync


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--grid", default="16:16,15:16,18:16")
    args = ap.parse_args()
    n = args.rows

    keys = jax.random.randint(jax.random.PRNGKey(3), (n,), 1,
                              1_000_000_000, jnp.int32)
    ids = jnp.arange(n, dtype=jnp.int32)
    jax.block_until_ready((keys, ids))

    @jax.jit
    def ref_sort(keys, ids):
        return jax.lax.sort((keys, ids), num_keys=1, is_stable=False)

    # k_ref is an ARGUMENT, never a closure constant (a 100M-element
    # constant embedded in the HLO exceeds the remote compile tunnel's
    # request size limit — CLAUDE.md)
    @jax.jit
    def check(k, i, keys, k_ref):
        ok_keys = jnp.array_equal(k, k_ref)
        ok_ids = jnp.all(jnp.take(keys, i) == k)
        return ok_keys & ok_ids

    k_ref = ref_sort(keys, ids)[0]
    jax.block_until_ready(k_ref)

    def minof(fn):
        _sync(fn())
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _sync(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    results = []

    def run(name, fn, verify=True):
        try:
            if verify:
                k, i = fn()
                ok = bool(check(k, i, keys, k_ref))
                eprint(f"{name}: verified={ok}")
                if not ok:
                    results.append({"variant": name, "verified": False})
                    return
            m, ts = minof(fn)
            eprint(json.dumps({"phase": name, "min_seconds": m,
                               "all": [round(t, 3) for t in sorted(ts)]}))
            results.append({"variant": name, "seconds": m,
                            "verified": verify or None})
        except Exception as e:  # Mosaic lowering gaps are data
            eprint(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results.append({"variant": name, "error": str(e)[:200]})

    run("lax_sort", lambda: ref_sort(keys, ids))
    for spec in args.grid.split(","):
        logrun, logt = (int(x) for x in spec.split(":"))
        run(f"pallas_r{logrun}_t{logt}",
            lambda lr=logrun, lt=logt: ms.sort_pairs(
                keys, ids, run_len0=1 << lr, t_out=1 << lt,
                interpret=False))
    run("xla_local_r16",
        lambda: ms.sort_pairs(keys, ids, run_len0=1 << 16,
                              t_out=1 << 16, local="xla",
                              interpret=False))
    m_loc = (n // (1 << 16)) * (1 << 16)
    run("local_only_r16",
        lambda: ms.local_sort(keys[:m_loc], ids[:m_loc], tile=1 << 16,
                              interpret=False), verify=False)
    print(json.dumps({"exp": "sort_merge_pass", "n": n,
                      "results": results}))


if __name__ == "__main__":
    main()
