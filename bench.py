#!/usr/bin/env python
"""Benchmark driver: hash-join throughput vs the reference's published bar.

Headline metric (printed as ONE JSON line on stdout): end-to-end hash-join
probe throughput in probe-rows/s on the reference's low-selectivity config
(100M x 100M rows, keys 1..1e9 => ~10M result rows — reference
join-performances.md:8-11, ~12 s total on the author's NVIDIA GPU, i.e.
~8.3M probe rows/s, which is the vs_baseline denominator).

Per-phase detail (build/count/materialize seconds, achieved HBM GB/s and
roofline fraction) goes to stderr.

Usage: python bench.py [--config NAME] [--verify] [--scale F]
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.core.config import PRESETS, JoinConfig
from tpujoin.core import datagen
from tpujoin.ops import hash_join as hj_mod
from tpujoin.utils.hw import hbm_peak_gbps
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import PhaseStat, time_fn

# the reference's probe throughput on this workload (join-performances.md:11:
# 1e8 probe rows / ~12 s)
REFERENCE_PROBE_ROWS_PER_SEC = 8.3e6


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_join(cfg: JoinConfig, verify: bool) -> dict:
    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(cfg.seed))
    bk = datagen.make_keys(rng_r, cfg.build_rows, cfg.key_min, cfg.key_max,
                           cfg.distribution, cfg.zipf_s)
    pk = datagen.make_keys(rng_s, cfg.probe_rows, cfg.key_min, cfg.key_max,
                           cfg.distribution, cfg.zipf_s)
    bk.block_until_ready(), pk.block_until_ready()

    # ---- phase timings (median of 3, fully synchronized) ----
    build_stat = time_fn(hj_mod.build, bk, name="build",
                         rows=cfg.build_rows,
                         bytes_touched=cfg.build_rows * 4 * 4)
    ht = hj_mod.build(bk)
    jax.block_until_ready(ht)

    count_stat = time_fn(hj_mod.probe_count, ht, pk, name="count",
                         rows=cfg.probe_rows,
                         bytes_touched=(cfg.build_rows + cfg.probe_rows) * 4 * 4)
    lo, counts = hj_mod.probe_count(ht, pk)
    total = int(jnp.sum(counts))
    cap = round_up(total, cfg.result_pad_multiple)

    mat_stat = time_fn(
        lambda: hj_mod.probe_materialize(ht, lo, counts, cap),
        name="materialize", rows=total,
        bytes_touched=cfg.probe_rows * 8 + cap * 8 * 3)
    probe_seconds = count_stat.seconds + mat_stat.seconds
    total_seconds = build_stat.seconds + probe_seconds

    for st in (build_stat, count_stat, mat_stat):
        eprint(json.dumps(st.as_dict()))

    verified = None
    if verify:
        from tpujoin import oracle
        r_ids, s_ids, _ = hj_mod.probe_materialize(ht, lo, counts, cap)
        verified = oracle.check_join(
            np.asarray(bk), np.asarray(pk),
            np.asarray(r_ids[:total]), np.asarray(s_ids[:total])) == 1
        eprint(f"oracle multiset parity: {'PASS' if verified else 'FAIL'}")

    dev = jax.devices()[0]
    return {
        "config": cfg.name,
        "device": getattr(dev, "device_kind", str(dev)),
        "build_rows": cfg.build_rows,
        "probe_rows": cfg.probe_rows,
        "result_rows": total,
        "build_seconds": build_stat.seconds,
        "count_seconds": count_stat.seconds,
        "materialize_seconds": mat_stat.seconds,
        "total_seconds": total_seconds,
        "probe_rows_per_sec": cfg.probe_rows / probe_seconds,
        "hbm_peak_gbps": hbm_peak_gbps(dev),
        "verified": verified,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="preset name (default: ref_low_selectivity on TPU, "
                         "a scaled-down variant on CPU)")
    ap.add_argument("--verify", action="store_true",
                    help="full native-oracle multiset check (adds minutes)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="row-count scale factor")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform != "cpu"
    name = args.config or ("ref_low_selectivity" if on_tpu else "baseline_1m")
    if name not in PRESETS:
        sys.exit(f"unknown config {name!r}; available: {', '.join(sorted(PRESETS))}")
    cfg = PRESETS[name]
    if args.scale != 1.0:
        cfg = JoinConfig(
            name=cfg.name,
            build_rows=int(cfg.build_rows * args.scale),
            probe_rows=int(cfg.probe_rows * args.scale),
            key_min=cfg.key_min, key_max=cfg.key_max,
            distribution=cfg.distribution, zipf_s=cfg.zipf_s, seed=cfg.seed,
        )

    detail = bench_join(cfg, args.verify)
    eprint(json.dumps(detail))

    value = detail["probe_rows_per_sec"]
    print(json.dumps({
        "metric": "hash_join_probe_rows_per_sec",
        "value": value,
        "unit": "rows/s",
        "vs_baseline": value / REFERENCE_PROBE_ROWS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
