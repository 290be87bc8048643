#!/usr/bin/env python
"""Phase attribution for join_with_pushdown at the bench workload
(VERDICT r3 weak #3: pushdown 4.6 s vs 2.9 s unpushed despite 4x fewer
result rows from 2x less data — where does it go?).

Times each stage of the pushdown pipeline (100M rows/side, v < 500 at
~50% selectivity, 2 key columns) as its own synced call, plus the
end-to-end drivers, so the gap between sum-of-stages and wall time
exposes host-driver overhead (scalar readbacks over the axon tunnel,
per-call dispatch) as opposed to device work.

Usage: python exp/pushdown_profile.py [--rows N]
"""
from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.core.table import Table
from tpujoin.core import datagen
from tpujoin.kernels.compact import compact3, pick_out_config
from tpujoin.ops import merge_join as mj
from tpujoin.ops import multi_join as mjn
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    args = ap.parse_args()
    rows = args.rows

    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    r = Table({"k1": datagen.make_keys(ks[0], rows, 1, 100_000),
               "k2": datagen.make_keys(ks[1], rows, 1, 10_000),
               "v": datagen.make_keys(ks[2], rows, 0, 1000)})
    s = Table({"k1": datagen.make_keys(ks[3], rows, 1, 100_000),
               "k2": datagen.make_keys(ks[4], rows, 1, 10_000),
               "v": datagen.make_keys(ks[5], rows, 0, 1000)})
    jax.block_until_ready((r.columns, s.columns))

    # --- stage timings ---
    hk_r = mjn.combined_key(r, ["k1", "k2"])
    hk_s = mjn.combined_key(s, ["k1", "k2"])
    st = time_fn(lambda: (mjn.combined_key(r, ["k1", "k2"]),
                          mjn.combined_key(s, ["k1", "k2"])),
                 name="combined_key_x2", rows=rows)
    print(f"combined_key x2:   {st.seconds:.3f} s", flush=True)

    mask_r = r["v"] < 500
    mask_s = s["v"] < 500
    kept_r = int(jnp.sum(mask_r.astype(jnp.int32)))
    kept_s = int(jnp.sum(mask_s.astype(jnp.int32)))
    cap_r = round_up(kept_r, 1 << 16)
    cap_s = round_up(kept_s, 1 << 16)
    cfg = pick_out_config(rows, kept_r)
    print(f"kept {kept_r}/{kept_s}, push cfg {cfg}", flush=True)

    @functools.partial(jax.jit, static_argnames=("cap", "ostep", "slab"))
    def push_k(hk, mask, cap, ostep, slab):
        ids = jnp.arange(hk.shape[0], dtype=jnp.int32)
        return compact3(hk, mask.astype(jnp.int32), ids, cap,
                        out_step=ostep, slab=slab)

    st = time_fn(lambda: (push_k(hk_r, mask_r, cap_r, *cfg),
                          push_k(hk_s, mask_s, cap_s, *cfg)),
                 name="push_compact_x2", rows=rows)
    print(f"push compact x2:   {st.seconds:.3f} s", flush=True)

    hk_rc, _, ids_rc, _ = push_k(hk_r, mask_r, cap_r, *cfg)
    hk_sc, _, ids_sc, _ = push_k(hk_s, mask_s, cap_s, *cfg)
    slot_r = jnp.arange(cap_r, dtype=jnp.int32)
    slot_s = jnp.arange(cap_s, dtype=jnp.int32)
    hk_rc = jnp.where(slot_r < kept_r, hk_rc, jnp.int32(0x7FFFFFFF))
    hk_sc = jnp.where(slot_s < kept_s, hk_sc, jnp.int32(0x7FFFFFFE))

    st = time_fn(mj.build, hk_rc, name="build_kept", rows=kept_r)
    print(f"build(kept_r):     {st.seconds:.3f} s", flush=True)
    ht = mj.build(hk_rc)

    st = time_fn(mj.probe_count, ht, hk_sc, name="count_kept", rows=kept_s)
    print(f"count(kept_s):     {st.seconds:.3f} s", flush=True)
    state, total_a, nonzero_a = mj.probe_count(ht, hk_sc)
    total_c, nonzero = int(total_a), int(nonzero_a)
    print(f"candidates {total_c}, nonzero {nonzero}", flush=True)

    cap2 = round_up(total_c, 1 << 16)
    k_cap = round_up(nonzero, 1 << 13)
    kname, _, mat = mj.plan_materialize(ht, state, k_cap, cap2,
                                        total=total_c, nonzero=nonzero)
    st = time_fn(mat, name="materialize", rows=total_c)
    print(f"materialize[{kname}]: {st.seconds:.3f} s", flush=True)

    cand_r, cand_s, _ = mat()

    @jax.jit
    def finish(cand_r, cand_s, ids_rc, ids_sc):
        def take_pad(full, ids, pad):
            valid = ids >= 0
            v = jnp.take(full, jnp.clip(ids, 0, full.shape[0] - 1))
            return jnp.where(valid, v, pad)
        cr = take_pad(ids_rc, cand_r, jnp.int32(-1))
        cs = take_pad(ids_sc, cand_s, jnp.int32(-1))
        return cr, cs

    st = time_fn(finish, cand_r, cand_s, ids_rc, ids_sc,
                 name="remap", rows=total_c)
    print(f"remap ids:         {st.seconds:.3f} s", flush=True)
    cr, cs = finish(cand_r, cand_s, ids_rc, ids_sc)

    r_cols = tuple(r[c] for c in ("k1", "k2"))
    s_cols = tuple(s[c] for c in ("k1", "k2"))
    st = time_fn(lambda: mjn._exact_filter(r_cols, s_cols, cr, cs, cap2, 2),
                 name="exact_filter", rows=total_c)
    print(f"exact filter:      {st.seconds:.3f} s", flush=True)

    # --- end-to-end drivers for reference ---
    st = time_fn(lambda: mjn.join_with_pushdown(
        r, s, ["k1", "k2"], r_pred=lambda v: v < 500, r_pred_col="v",
        s_pred=lambda v: v < 500, s_pred_col="v", return_numpy=False),
        name="join_with_pushdown", rows=rows)
    print(f"pushdown e2e:      {st.seconds:.3f} s", flush=True)
    st = time_fn(lambda: mjn.hash_join_multi(r, s, ["k1", "k2"],
                                             return_numpy=False),
                 name="hash_join_multi", rows=rows)
    print(f"unpushed e2e:      {st.seconds:.3f} s", flush=True)


if __name__ == "__main__":
    main()
