#!/usr/bin/env python
"""Design-space: the aggregate VALUE path (VERDICT r4 #6).

group_by_agg ran at 43.6M rows/s in round 4 — one third of
group-by-count — attributed to the 2-key sort plus FIVE O(G) boundary
gathers at the ~73M idx/s element-gather constant (BASELINE.md). This
table measures every plausible materialize form on the real chip at the
BASELINE config-3 shape (100M rows, ~10M groups):

  sort_path    compact_step=None: packed-sort boundary compaction +
               5 gathers (the always-available fallback)
  r4_form      boundary positions via the compact_ids kernel + 5 gathers
               (round 4's shipped form, re-created inline here)
  kernel_cols  ONE variadic 6-column boundary compaction
               (kernels.compact.compact_cols), zero O(G) gathers —
               round 5's shipped form
  sort half    2-operand (key, value) i32 sort vs packed i64 single sort
               (key*2^20+value fits 44 bits): does a 1-operand wide sort
               beat the 2-key sort? (count_sort_variants said no for the
               join's (key,id); re-measured for this shape)

Variants are cross-checked for exact equality (keys, counts, sums, min,
max) before timing. Usage: python exp/agg_value_variants.py [--rows N]
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.core import datagen
from tpujoin.ops import aggregate as agg
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    args = ap.parse_args()
    n = args.rows
    key_max = max(n // 10, 100)

    keys = datagen.make_keys(jax.random.PRNGKey(0), n, 1, key_max)
    vals = datagen.make_keys(jax.random.PRNGKey(1), n, 0, 1_000_000)
    jax.block_until_ready((keys, vals))
    ngroups = int(agg.group_count(keys))
    cap = round_up(ngroups, 1 << 20)
    from tpujoin.kernels.compact import pick_out_step
    cstep = pick_out_step(n, ngroups)
    eprint(f"rows {n}, groups {ngroups}, cap {cap}, compact_step {cstep}")

    # ---- r4 form, inline: boundary kernel + 5 gathers ----
    import functools

    @functools.partial(jax.jit, static_argnames=("capacity", "step"))
    def r4_form(keys, values, capacity: int, step: int):
        from tpujoin.ops.filter import filter_materialize_kernel
        n = keys.shape[0]
        sk, sv = jax.lax.sort((keys, values), num_keys=2, is_stable=False)
        is_boundary = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]])
        starts, num_groups, cfits = filter_materialize_kernel(
            is_boundary, capacity, step)
        valid = starts >= 0
        safe_starts = jnp.where(valid, starts, 0)
        group_keys = jnp.where(valid, jnp.take(sk, safe_starts), -1)
        next_start = jnp.concatenate(
            [starts[1:], jnp.full((1,), -1, jnp.int32)])
        is_last = (jnp.arange(capacity, dtype=jnp.int32)
                   == (num_groups - 1))
        ends = jnp.where(is_last, n, next_start)
        safe_ends = jnp.where(valid, jnp.clip(ends, 1, n), 1)
        counts = jnp.where(valid, safe_ends - safe_starts, 0)
        blk = 4096
        m_main = (n // blk) * blk
        vm = jax.lax.slice_in_dim(sv, 0, m_main).reshape(-1, blk)
        chi = jnp.cumsum(jax.lax.shift_right_arithmetic(vm, jnp.int32(16)),
                         axis=1)
        clo = jnp.cumsum(vm & jnp.int32(0xFFFF), axis=1)
        with jax.enable_x64(True):
            btot = ((chi[:, -1].astype(jnp.int64) << 16)
                    + clo[:, -1].astype(jnp.int64))
            boff = jnp.cumsum(btot) - btot
            cs_main = (boff[:, None] + (chi.astype(jnp.int64) << 16)
                       + clo.astype(jnp.int64)).reshape(-1)
            tail = jax.lax.slice_in_dim(sv, m_main, n).astype(jnp.int64)
            tail_base = cs_main[-1] if m_main else jnp.int64(0)
            cs = jnp.concatenate([cs_main, tail_base + jnp.cumsum(tail)])
            hi64 = jnp.take(cs, (safe_ends - 1).astype(jnp.int64))
            lo64 = jnp.where(
                safe_starts > 0,
                jnp.take(cs, (safe_starts - 1).astype(jnp.int64)),
                jnp.int64(0))
            sums64 = jnp.where(valid, hi64 - lo64, jnp.int64(0))
            sums_hi = (sums64 >> 32).astype(jnp.int32)
            sums_lo = (sums64 & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        mins = jnp.where(valid, jnp.take(sv, safe_starts), 0)
        maxs = jnp.where(valid, jnp.take(sv, safe_ends - 1), 0)
        return (group_keys, counts, (sums_hi, sums_lo), mins, maxs,
                num_groups, cfits)

    variants = {
        "sort_path": lambda: agg.group_agg_materialize(keys, vals,
                                                       cap)[:6],
        "kernel_cols": lambda: agg.group_agg_materialize(
            keys, vals, cap, compact_step=cstep)[:6],
    }
    if cstep is not None:
        variants["r4_form"] = lambda: r4_form(keys, vals, cap, cstep)[:6]

    # cross-check all variants bitwise before timing
    ref = None
    results = []
    for name, fn in variants.items():
        gk, gc, (sh, sl), mn, mx, ng = fn()
        if name == "kernel_cols":
            fits = agg.group_agg_materialize(keys, vals, cap,
                                             compact_step=cstep)[-1]
            assert bool(fits), "kernel coverage miss"
        cur = (np.asarray(gk[:ngroups]), np.asarray(gc[:ngroups]),
               np.asarray(sh[:ngroups]), np.asarray(sl[:ngroups]),
               np.asarray(mn[:ngroups]), np.asarray(mx[:ngroups]))
        if ref is None:
            ref = cur
        else:
            for a, b in zip(ref, cur):
                assert np.array_equal(a, b), f"{name} mismatch"
        eprint(f"{name}: parity OK ({int(ng)} groups)")
        st = time_fn(fn, name=name, rows=n, iters=7, reduce="min")
        eprint(json.dumps(st.as_dict()))
        results.append({"variant": name, "seconds": st.seconds,
                        "rows_per_sec": n / st.seconds})

    # ---- sort half on its own ----
    @jax.jit
    def sort2(k, v):
        return jax.lax.sort((k, v), num_keys=2, is_stable=False)

    @jax.jit
    def sort_packed(k, v):
        with jax.enable_x64(True):
            p = k.astype(jnp.int64) * jnp.int64(1 << 20) + v.astype(
                jnp.int64)
            sp = jax.lax.sort(p, is_stable=False)
            return ((sp // (1 << 20)).astype(jnp.int32),
                    (sp % (1 << 20)).astype(jnp.int32))

    for name, fn in (("sort2_kv", lambda: sort2(keys, vals)),
                     ("sort_packed_i64",
                      lambda: sort_packed(keys, vals))):
        st = time_fn(fn, name=name, rows=n, iters=7, reduce="min")
        eprint(json.dumps(st.as_dict()))
        results.append({"variant": name, "seconds": st.seconds})

    print(json.dumps({"exp": "agg_value_variants", "rows": n,
                      "groups": ngroups, "results": results}))


if __name__ == "__main__":
    main()
