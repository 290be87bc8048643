#!/usr/bin/env python
"""Real-chip capture of the heavy-hitter SPLIT program (VERDICT r4 #4:
BASELINE.json config 5's skew machinery had hardware numbers only for the
RLE program, which absorbs skew without splitting).

Workload: build side Zipf(1.0) over [1, key_max] (head key ~7% of rows),
probe side uniform over the same domain — the asymmetric shape where
splitting is the answer (symmetric Zipf x Zipf explodes the pair count
and is served by the RLE program instead). ``heavy_factor`` is set below
one device-share so detect/replicate/spray actually ROUTE at mesh-1
(at P=1 the default threshold of one full shard can never trigger); the
capture asserts the replica buffers are non-trivially occupied and
reports how many rows routed through each path.

Measured against the PLAIN range-partition program on the same input:
at mesh-1 the split cannot show its balance benefit (nothing to
balance), so the delta IS the detect+replicate overhead — the cost side
of the trade; the emulated-mesh tests (tests/test_skew.py) demonstrate
the balance side.

Verification (full coverage, utils.verify): exact global count + device
multiset checksum over every valid result slot vs the host ground-truth
join. Usage: python exp/dist_skew_tpu.py [--rows N]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from tpujoin.core import datagen
from tpujoin.parallel.mesh import ROW_AXIS, make_mesh
from tpujoin.parallel.skew import make_skew_join_fn
from tpujoin.parallel.shuffle_join import (
    make_shuffle_join_presorted_fn,
    make_splitter_stats_fn,
)
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn
from tpujoin.utils.verify import device_multiset_sum, host_join_expectation


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000,
                    help="build rows (Zipf side)")
    ap.add_argument("--probe-rows", type=int, default=3_000_000)
    ap.add_argument("--key-max", type=int, default=1_000_000)
    ap.add_argument("--heavy-factor", type=float, default=0.001,
                    help="heavy threshold as a fraction of the per-device "
                         "share (sub-1 so mesh-1 routes the split path)")
    ap.add_argument("--top-h", type=int, default=64)
    args = ap.parse_args()
    n, m = args.rows, args.probe_rows

    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(11))
    bk = np.asarray(datagen.make_keys(rng_r, n, 1, args.key_max, "zipf",
                                      1.0))
    pk = np.asarray(datagen.make_keys(rng_s, m, 1, args.key_max))

    exp_total, exp_msum = host_join_expectation(bk, pk)
    print(f"workload: zipf build {n} x uniform probe {m}, key_max "
          f"{args.key_max}, ground-truth pairs {exp_total}", flush=True)

    mesh = make_mesh(1)
    shard = NamedSharding(mesh, P(ROW_AXIS))
    rk = jax.device_put(jnp.asarray(bk), shard)
    ri = jax.device_put(jnp.arange(n, dtype=jnp.int32), shard)
    sk = jax.device_put(jnp.asarray(pk), shard)
    si = jax.device_put(jnp.arange(m, dtype=jnp.int32), shard)

    cap_res = round_up(int(exp_total * 1.3) + 64, 1 << 16)

    # ---- skew-split program ----
    cap_r = round_up(n + 64, 1 << 16)
    cap_s = round_up(m + 64, 1 << 16)
    rep_cap = round_up(args.top_h * 2 * args.top_h, 64)
    fn = make_skew_join_fn(mesh, cap_r, cap_s, rep_cap, rep_cap, cap_res,
                           top_h=args.top_h,
                           heavy_factor=args.heavy_factor)
    r_out, s_out, totals, ovf = fn(rk, ri, sk, si)
    ovf_h = np.asarray(ovf)
    assert ovf_h[0] <= cap_r and ovf_h[1] <= cap_s, ovf_h
    assert ovf_h[2] <= cap_res, ovf_h
    assert ovf_h[3] <= rep_cap and ovf_h[4] <= rep_cap, ovf_h
    rep_rows = int(ovf_h[3]) + int(ovf_h[4])
    assert rep_rows > 0, (
        f"replicate path did not route (rep counts {ovf_h[3:]}) — raise "
        f"--heavy-factor sensitivity")
    print(f"split routing: replica rows r={int(ovf_h[3])} "
          f"s={int(ovf_h[4])} (caps {rep_cap}), max normal segment "
          f"r={int(ovf_h[0])} s={int(ovf_h[1])}", flush=True)

    st_skew = time_fn(lambda: fn(rk, ri, sk, si)[3],
                      name="dist_skew_mesh1", rows=m, warmup=1, iters=5, reduce="min")
    total = int(np.asarray(totals).sum())
    print(f"mesh=1 SKEW-SPLIT join (device-resident): "
          f"{st_skew.seconds:.3f} s, result {total}", flush=True)

    # full-coverage verification
    got_msum = device_multiset_sum(r_out.reshape(-1), s_out.reshape(-1),
                                   total)
    assert total == exp_total, (total, exp_total)
    assert got_msum == exp_msum, (got_msum, exp_msum)
    print(f"full-coverage verification: count exact; multiset checksum "
          f"over pairs_checked == {total} result rows PASS", flush=True)

    # ---- plain program, same input (the overhead comparison) ----
    stats_fn = make_splitter_stats_fn(mesh)
    outs = stats_fn(rk, ri, sk, si)
    rk_s, ri_s, sk_s, si_s, spl, maxes = outs
    maxes_h = np.asarray(maxes)
    pcap_r = round_up(int(maxes_h[0]) + 64, 1 << 16)
    pcap_s = round_up(int(maxes_h[1]) + 64, 1 << 16)
    pfn = make_shuffle_join_presorted_fn(mesh, pcap_r, pcap_s, cap_res)
    r2, s2, totals2, ovf2 = pfn(rk_s, ri_s, sk_s, si_s, spl)
    st_stats = time_fn(lambda: stats_fn(rk, ri, sk, si)[5],
                       name="dist_plain_stats", rows=m, warmup=1, iters=5, reduce="min")
    st_plain = time_fn(lambda: pfn(rk_s, ri_s, sk_s, si_s, spl)[3],
                       name="dist_plain_join", rows=m, warmup=1, iters=5, reduce="min")
    total2 = int(np.asarray(totals2).sum())
    assert total2 == exp_total, (total2, exp_total)
    got2 = device_multiset_sum(r2.reshape(-1), s2.reshape(-1), total2)
    assert got2 == exp_msum
    plain = st_stats.seconds + st_plain.seconds
    print(f"mesh=1 PLAIN join, same input (device-resident): "
          f"{plain:.3f} s (stats {st_stats.seconds:.3f} + join "
          f"{st_plain.seconds:.3f}); split overhead at P=1: "
          f"{st_skew.seconds - plain:+.3f} s "
          f"({(st_skew.seconds / plain - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
