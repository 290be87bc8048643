#!/usr/bin/env python
"""Single-device-mesh sanity run of the distributed v2 join on the real
chip: the full shuffle-join shard program (partition -> send buffers ->
all_to_all(P=1) -> local v2 Pallas join) at the low-selectivity reference
scale, timed DEVICE-RESIDENT against the single-chip headline pipeline.
Validates that the distributed local join IS the v2 engine (VERDICT r2
weak #1) and measures the per-device constant term of the weak-scaling
model in docs/ROOFLINE.md.

Timing methodology: the jitted shard program is timed through
utils.timing.time_fn synced on its small overflow-telemetry output — the
same device-resident convention as every other ledger number. The bulk
result readback is NOT timed: this platform's device->host tunnel runs at
sub-MB/s (a ~190 MB result pull costs ~2 minutes of pure tunnel time,
measured), and the reference's own result memcpy likewise sits outside
its timers (join_v1.mlir:614-615). Verification (exact global count +
sampled pair equality) runs outside the timer on small slices.

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
from tpujoin.parallel.shuffle_join import make_shuffle_join_fn
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--verify-sample", type=int, default=1 << 18)
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
    # two capacity regimes: the driver's default (1.25x slack — splitter
    # partitioning balances rows to ~1%, so the old 2x hash-partition
    # default is obsolete) and a tuned production setting (1.05x — what a
    # deployment with known row stats uses; the driver's overflow-retry
    # makes undersizing safe anyway). Local compaction runs on the Pallas
    # stream-compaction kernel picked from the expected selectivity, with
    # the psum'd coverage flag asserted (sort fallback is the driver's
    # job; this capture documents the fast path).
    from tpujoin.parallel.shuffle_join import local_compact_step

    results = {}
    for slack_name, slk in (("slack1.25", 1.25), ("slack1.05", 1.05)):
        cap_r = round_up(int(slk * n) + 64, 64)
        cap_s = round_up(int(slk * n) + 64, 64)
        cap_res = round_up(int(slk * expected) + 64, 64)
        cstep = local_compact_step(cap_s, expected)
        fn = make_shuffle_join_fn(mesh, cap_r, cap_s, cap_res,
                                  compact_step=cstep)

        r_out, s_out, totals, ovf = fn(rk, ri, sk, si)
        ovf_h = np.asarray(ovf)
        assert (ovf_h[0] <= cap_r and ovf_h[1] <= cap_s
                and ovf_h[2] <= cap_res), ovf_h
        assert ovf_h[3] == 1, f"compaction coverage miss {ovf_h}"

        stat = time_fn(lambda: fn(rk, ri, sk, si)[3],
                       name=f"dist_mesh1_device[{slack_name}]", rows=n,
                       warmup=1, iters=3)
        total = int(np.asarray(totals).sum())
        results[slack_name] = stat.seconds
        print(f"mesh=1 distributed join (device-resident, {slack_name}): "
              f"{stat.seconds:.3f} s ({n / stat.seconds / 1e6:.1f}M probe "
              f"rows/s), result {total}", flush=True)

    # exact global count vs the host recompute; pair equality on a sample
    # (bulk readback over the tunnel is the one thing NOT measured here)
    srk = np.sort(bk)
    exp_total = int((np.searchsorted(srk, pk, "right")
                     - np.searchsorted(srk, pk, "left")).sum())
    assert total == exp_total, (total, exp_total)
    m = min(args.verify_sample, total)
    r_s = np.asarray(r_out.reshape(-1)[:m])
    s_s = np.asarray(s_out.reshape(-1)[:m])
    ok = (r_s >= 0).all() and (bk[r_s] == pk[s_s]).all()
    assert ok
    print(f"count exact ({exp_total}); {m} sampled pairs key-equal",
          flush=True)


if __name__ == "__main__":
    main()
