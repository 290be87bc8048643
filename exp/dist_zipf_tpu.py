#!/usr/bin/env python
"""Mesh-1 real-chip run of the distributed FACTORIZED (RLE) join on the
Zipf-skew workload (BASELINE.json config 5's distribution): the scale-out
answer for shards whose materialized pairs (~5e11 at 10M x 10M,
Zipf s=1.0) fit no per-device result buffer. The RLE program carries NO
pair capacity at all — per-device run-length columns plus an exact
128-bit-safe global pair count.

Timed device-resident on the shard program (utils.timing convention);
verified by exact global pair count vs a host searchsorted recompute.
Single-chip comparison: the v2 RLE path does this workload in ~1.28 s
(bench zipf_skew); the distributed program's overhead is the splitter
exchange + received-side re-sorts.

Usage: python exp/dist_zipf_tpu.py [--rows N] [--zipf-s S]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from tpujoin.core import datagen
from tpujoin.parallel.mesh import ROW_AXIS, make_mesh
from tpujoin.parallel.shuffle_join import make_shuffle_join_rle_fn
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--zipf-s", type=float, default=1.0)
    ap.add_argument("--key-max", type=int, default=1_000_000)
    args = ap.parse_args()
    n = args.rows

    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(5))
    bk = np.asarray(datagen.make_keys(rng_r, n, 1, args.key_max, "zipf",
                                      args.zipf_s))
    pk = np.asarray(datagen.make_keys(rng_s, n, 1, args.key_max, "zipf",
                                      args.zipf_s))

    mesh = make_mesh(1)
    shard = NamedSharding(mesh, P(ROW_AXIS))
    rk = jax.device_put(jnp.asarray(bk), shard)
    ri = jax.device_put(jnp.arange(n, dtype=jnp.int32), shard)
    sk = jax.device_put(jnp.asarray(pk), shard)
    si = jax.device_put(jnp.arange(n, dtype=jnp.int32), shard)

    # Zipf rows are range-partitioned by quantile splitters, so send
    # segments stay row-balanced; heavy keys only widen ONE segment when
    # they exceed a device share (mesh-1: no sharing at all)
    cap = round_up(int(1.25 * n) + 64, 64)
    fn = make_shuffle_join_rle_fn(mesh, cap, cap)

    ppid, lo, cnt, bid, pl, ph, ovf = fn(rk, ri, sk, si)
    ovf_h = np.asarray(ovf)
    assert ovf_h[0] <= cap and ovf_h[1] <= cap, ovf_h

    stat = time_fn(lambda: fn(rk, ri, sk, si)[6],
                   name="dist_zipf_rle_mesh1", rows=n, warmup=1, iters=5, reduce="min")
    pairs = int((np.asarray(ph).astype(np.int64).sum() << 30)
                + np.asarray(pl).astype(np.int64).sum())
    print(f"mesh=1 distributed RLE zipf join (device-resident): "
          f"{stat.seconds:.3f} s ({n / stat.seconds / 1e6:.1f}M probe "
          f"rows/s), pairs {pairs}", flush=True)

    srk = np.sort(bk)
    exp_pairs = int((np.searchsorted(srk, pk, "right").astype(np.int64)
                     - np.searchsorted(srk, pk, "left")).sum())
    assert pairs == exp_pairs, (pairs, exp_pairs)
    print(f"exact global pair count verified ({exp_pairs})", flush=True)

    # full-coverage verification (VERDICT r4 #3): the factorized result
    # IS the join — run the native RLE oracle over EVERY run of the
    # device's columns (valid rows: pad probe ids are < 0). The ~160 MB
    # host readback rides the slow tunnel OUTSIDE the timers.
    from tpujoin import oracle

    ppid_h = np.asarray(ppid)
    valid = ppid_h >= 0
    ok = oracle.check_join_rle(
        bk, pk, np.asarray(bid)[:n],
        ppid_h[valid], np.asarray(lo)[valid], np.asarray(cnt)[valid])
    assert ok == 1, "RLE oracle parity FAIL"
    print(f"native RLE oracle over all {int(valid.sum())} runs "
          f"({exp_pairs} pairs): PASS", flush=True)


if __name__ == "__main__":
    main()
