#!/usr/bin/env python
"""Design-space measurement: stream compaction at HIGH selectivity.

VERDICT r3 weak #3 traced the slow filter pushdown to its kept-row
compaction: at ~50% selectivity the compact kernel's fixed 65536-row slab
(tuned for the ~10% join-materialize regime) re-reads and re-shifts ~4x
the useful span per grid step, and the packed-sort fallback needs an
O(kept) key gather afterwards. This table measures the alternatives on
the real chip at n=100M:

  sort1+gather  filter_materialize (1-ary packed sort) + jnp.take of the
                payload at kept rows — the old pushdown fallback shape
  sort2         2-ary sort (packed flag|id, payload) — no gather at all
  k<out>/<slab> kernels.compact.compact3 at (out_step, slab)

Each variant is timed device-resident (utils.timing.time_fn) and
checksum-verified against numpy. Results feed pick_out_config and the
docs/ROOFLINE.md compaction design-space table.

Usage: python exp/compact_hisel.py [--rows N] [--sel 0.5 [0.1 ...]]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.kernels import compact as ck
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn


def _variants(sel: float):
    v = [("k4096/65536", 4096, 65536)]  # pick_out_step's fixed-slab choice
    for out in (16384, 8192, 4096):
        need = int(out * ck.COVER_SLACK / sel) + 3 * ck.ALIGN
        slab = round_up(max(need, out + 2 * ck.ALIGN), ck.ALIGN)
        if slab <= ck.MAX_SLAB:
            v.append((f"k{out}/{slab}", out, slab))
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--sel", type=float, nargs="+", default=[0.095, 0.5])
    args = ap.parse_args()
    n = args.rows

    key = jax.random.PRNGKey(11)
    payload = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32)
    u = jax.random.uniform(jax.random.PRNGKey(12), (n,))
    ids = jnp.arange(n, dtype=jnp.int32)
    jax.block_until_ready((payload, u, ids))

    for sel in args.sel:
        mask = u < sel
        mask_np = np.asarray(mask)
        kept = int(mask_np.sum())
        cap = round_up(kept, 1 << 16)
        exp_ids = np.flatnonzero(mask_np)
        exp_pay = np.asarray(payload)[exp_ids]
        print(f"--- sel {sel} (kept {kept}) ---", flush=True)

        # NOTE every jitted fn takes the big arrays as ARGUMENTS — a jit
        # over a closure would embed the 100M-element arrays as HLO
        # constants and crash the remote compile tunnel (observed: broken
        # pipe at exactly this call).
        import functools

        # sort1 + payload gather (the old pushdown fallback shape)
        @functools.partial(jax.jit, static_argnames=("cap",))
        def sort1(mask, payload, cap):
            from tpujoin.ops.filter import filter_materialize
            out_ids, total = filter_materialize(mask, cap)
            safe = jnp.clip(out_ids, 0, n - 1)
            pay = jnp.where(out_ids >= 0, jnp.take(payload, safe), -1)
            return out_ids, pay, total

        # sort2: payload rides the sort, no gather
        @functools.partial(jax.jit, static_argnames=("cap",))
        def sort2(mask, payload, ids, cap):
            packed = jnp.where(mask, ids, ids + jnp.int32(1 << 30))
            sp, pay_s = jax.lax.sort((packed, payload), num_keys=1)
            sp = jax.lax.slice_in_dim(sp, 0, cap)
            pay_s = jax.lax.slice_in_dim(pay_s, 0, cap)
            total = jnp.sum(mask.astype(jnp.int32))
            t = jnp.arange(cap, dtype=jnp.int32)
            out_ids = jnp.where(t < total,
                                sp & jnp.int32((1 << 30) - 1), -1)
            pay = jnp.where(t < total, pay_s, -1)
            return out_ids, pay, total

        runs = [("sort1+gather", lambda: sort1(mask, payload, cap)),
                ("sort2", lambda: sort2(mask, payload, ids, cap))]
        for name, out_step, slab in _variants(sel):
            def krun(out_step=out_step, slab=slab):
                return ck.compact3(payload, mask.astype(jnp.int32), ids,
                                   cap, out_step=out_step, slab=slab)
            runs.append((name, krun))

        for name, fn in runs:
            out = fn()
            if name.startswith("k"):
                pay_c, m_c, ids_c, fits = out
                assert bool(fits), f"{name}: coverage miss"
                ok = (np.array_equal(np.asarray(ids_c[:kept]), exp_ids)
                      and np.array_equal(np.asarray(pay_c[:kept]), exp_pay))
            else:
                out_ids, pay, total = out
                ok = (int(total) == kept
                      and np.array_equal(np.asarray(out_ids[:kept]), exp_ids)
                      and np.array_equal(np.asarray(pay[:kept]), exp_pay))
            # a wrong-result variant must NOT contribute a timing row —
            # these tables set the shipped pick_out_config policy
            assert ok, f"{name}[sel{sel}]: result mismatch"
            stat = time_fn(fn, name=f"{name}[sel{sel}]", rows=n, warmup=1,
                           iters=3)
            print(f"{name:>16}: {stat.seconds:.3f} s "
                  f"({n / stat.seconds / 1e6:.0f}M rows/s) OK", flush=True)


if __name__ == "__main__":
    main()
