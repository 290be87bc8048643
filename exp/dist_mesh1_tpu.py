#!/usr/bin/env python
"""Single-device-mesh run of the distributed v2 join on the real chip:
the full shuffle-join shard program (splitter stats pre-pass -> send
packing -> all_to_all(P=1) -> local v2 Pallas join) at the
low-selectivity reference scale, timed DEVICE-RESIDENT against the
single-chip headline pipeline.

Round 5 (VERDICT r4 #3/#7): the DEFAULT driver path is what gets timed —
send caps auto-derived from the splitter-stats pre-pass (no slack
guessing), and the result is verified with FULL COVERAGE: the exact
global count plus the order-invariant multiset checksum reduced on
device over every valid result slot, compared against a host
ground-truth join (pairs_checked == result_rows — the reference's
every-pair gate, shared.cpp:167-171; the r4 capture checked a 262k
prefix).

Timing methodology: jitted programs are timed through utils.timing's
readback-synced time_fn — the same device-resident convention as every
other ledger number. The bulk result readback is NOT timed (sub-MB/s
tunnel; the reference's own result memcpy sits outside its timers,
join_v1.mlir:614-615). The default-path time is stats_pass + join_pass:
both run on every cold query.

Usage: python exp/dist_mesh1_tpu.py [--rows N]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from tpujoin.core import datagen
from tpujoin.parallel.mesh import ROW_AXIS, make_mesh
from tpujoin.parallel.shuffle_join import (
    local_compact_step,
    make_shuffle_join_presorted_fn,
    make_splitter_stats_fn,
)
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn
from tpujoin.utils.verify import device_multiset_sum, host_join_expectation


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    args = ap.parse_args()
    n = args.rows

    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(7))
    bk = np.asarray(datagen.make_keys(rng_r, n, 1, 1_000_000_000))
    pk = np.asarray(datagen.make_keys(rng_s, n, 1, 1_000_000_000))

    mesh = make_mesh(1)
    shard = NamedSharding(mesh, P(ROW_AXIS))
    rk = jax.device_put(jnp.asarray(bk), shard)
    ri = jax.device_put(jnp.arange(n, dtype=jnp.int32), shard)
    sk = jax.device_put(jnp.asarray(pk), shard)
    si = jax.device_put(jnp.arange(n, dtype=jnp.int32), shard)

    expected = n // 10 + n // 50   # ~10% match rate at this key domain

    # ---- DEFAULT driver path: stats pre-pass -> exact caps -> join ----
    stats_fn = make_splitter_stats_fn(mesh)
    rk_s, ri_s, sk_s, si_s, spl, maxes = stats_fn(rk, ri, sk, si)
    maxes_h = np.asarray(maxes)
    granule = 1 << 16
    cap_r = round_up(int(maxes_h[0]) + 64, granule)
    cap_s = round_up(int(maxes_h[1]) + 64, granule)
    cap_res = round_up(int(expected * 1.25) + 64, 64)
    cstep = local_compact_step(cap_s, expected)
    print(f"auto caps: send_r {cap_r} send_s {cap_s} (exact maxes "
          f"{maxes_h.tolist()}), result {cap_res}, compact_step {cstep}",
          flush=True)
    join_fn = make_shuffle_join_presorted_fn(mesh, cap_r, cap_s, cap_res,
                                             compact_step=cstep)

    r_out, s_out, totals, ovf = join_fn(rk_s, ri_s, sk_s, si_s, spl)
    ovf_h = np.asarray(ovf)
    assert (ovf_h[0] <= cap_r and ovf_h[1] <= cap_s
            and ovf_h[2] <= cap_res), ovf_h
    if ovf_h[3] != 1:   # kernel coverage miss -> the driver's sort
        # fallback (small/emulated shapes; the 100M capture stays on the
        # kernel path and the assert below documents which ran)
        print(f"compaction coverage miss {ovf_h} -> sort fallback",
              flush=True)
        cstep = None
        join_fn = make_shuffle_join_presorted_fn(mesh, cap_r, cap_s,
                                                 cap_res, compact_step=None)
        r_out, s_out, totals, ovf = join_fn(rk_s, ri_s, sk_s, si_s, spl)
        ovf_h = np.asarray(ovf)
        assert ovf_h[3] == 1, ovf_h

    st_stats = time_fn(lambda: stats_fn(rk, ri, sk, si)[5],
                       name="dist_mesh1_stats_pass", rows=n,
                       warmup=1, iters=5, reduce="min")
    st_join = time_fn(lambda: join_fn(rk_s, ri_s, sk_s, si_s, spl)[3],
                      name="dist_mesh1_join_pass", rows=n,
                      warmup=1, iters=5, reduce="min")
    secs = st_stats.seconds + st_join.seconds
    total = int(np.asarray(totals).sum())
    print(f"mesh=1 distributed join (device-resident, DEFAULT auto-caps "
          f"path): {secs:.3f} s = stats {st_stats.seconds:.3f} + join "
          f"{st_join.seconds:.3f} ({n / secs / 1e6:.1f}M probe rows/s), "
          f"result {total}", flush=True)

    # ---- full-coverage verification: exact count + device multiset
    # checksum over EVERY valid result slot vs host ground truth ----
    got_msum = device_multiset_sum(r_out.reshape(-1), s_out.reshape(-1),
                                   total)
    exp_total, exp_msum = host_join_expectation(bk, pk)
    assert total == exp_total, (total, exp_total)
    assert got_msum == exp_msum, (got_msum, exp_msum)
    print(f"full-coverage verification: count exact ({exp_total}); "
          f"multiset checksum over pairs_checked == {total} result rows "
          f"PASS", flush=True)


if __name__ == "__main__":
    main()
