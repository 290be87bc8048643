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


def bench_join_dense(cfg: JoinConfig, verify: bool) -> dict:
    """High-selectivity configs (result >> memory comfort, e.g. the
    reference's 10Mx10M / ~1B-pair workload, join-performances.md:3-6):
    benchmark the factorized (RLE) result — the engine's native exact form —
    plus a chunked pair-expansion sample for the materialization rate."""
    from tpujoin.ops import merge_join as mj_mod

    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(cfg.seed))
    bk = datagen.make_keys(rng_r, cfg.build_rows, cfg.key_min, cfg.key_max,
                           cfg.distribution, cfg.zipf_s)
    pk = datagen.make_keys(rng_s, cfg.probe_rows, cfg.key_min, cfg.key_max,
                           cfg.distribution, cfg.zipf_s)
    jax.block_until_ready((bk, pk))

    build_stat = time_fn(hj_mod.build, bk, name="build", rows=cfg.build_rows)
    ht = hj_mod.build(bk)
    count_stat = time_fn(mj_mod.probe_count, ht, pk, name="count",
                         rows=cfg.probe_rows)
    state, total_a, nonzero_a = mj_mod.probe_count(ht, pk)
    total, nonzero = int(total_a), int(nonzero_a)
    k_cap = round_up(nonzero, 1 << 20)
    rle_stat = time_fn(lambda: mj_mod.probe_rle(ht, state, k_cap),
                       name="rle_result", rows=nonzero)

    # full-result pair materialization via the group-periodic kernel
    # (kernels.expand_groups; kernels.expand_runs as fallback):
    # gather-free, so the full ~1B-pair result is materialized on-device
    # (the reference holds it in 8.5 GB of GPU memory,
    # join-performances.md:5)
    cap = round_up(total, 1 << 20)
    total_m = total
    mat_stat = None
    for fn_name in ("probe_materialize_groups", "probe_materialize_runs"):
        mat_fn = getattr(mj_mod, fn_name)
        for slab in (4096, 16384):
            _, _, _, fits = mat_fn(ht, state, k_cap, cap, src_slab=slab)
            if bool(fits):
                mat_stat = time_fn(
                    lambda: mat_fn(ht, state, k_cap, cap, src_slab=slab),
                    name=f"materialize_pairs[{fn_name.rsplit('_', 1)[-1]}]",
                    rows=total, bytes_touched=cap * 8)
                break
        if mat_stat is not None:
            break
    if mat_stat is None:
        # fallback: expand+take on a probe chunk (low-dup shaped data)
        chunk = min(1 << 21, cfg.probe_rows)
        pk_c = jax.lax.slice_in_dim(pk, 0, chunk)
        state_c, total_c_a, nz_c_a = mj_mod.probe_count(ht, pk_c)
        total_m, nz_c = int(total_c_a), int(nz_c_a)
        cap_c = round_up(total_m, 1 << 20)
        kc = round_up(nz_c, 1 << 18)
        mat_stat = time_fn(
            lambda: mj_mod.probe_materialize(ht, state_c, kc, cap_c),
            name="materialize_chunk", rows=total_m)
    for st in (build_stat, count_stat, rle_stat, mat_stat):
        eprint(json.dumps(st.as_dict()))

    verified = None
    if verify:
        from tpujoin import oracle
        sid, lo, cnt = mj_mod.probe_rle(ht, state, k_cap)
        verified = oracle.check_join_rle(
            np.asarray(bk), np.asarray(pk), np.asarray(ht.sorted_ids),
            np.asarray(sid[:nonzero]), np.asarray(lo[:nonzero]),
            np.asarray(cnt[:nonzero])) == 1
        eprint(f"RLE oracle parity: {'PASS' if verified else 'FAIL'}")

    probe_seconds = count_stat.seconds + rle_stat.seconds
    dev = jax.devices()[0]
    return {
        "engine": "v2-rle",
        "config": cfg.name,
        "device": getattr(dev, "device_kind", str(dev)),
        "build_rows": cfg.build_rows,
        "probe_rows": cfg.probe_rows,
        "result_rows": total,
        "build_seconds": build_stat.seconds,
        "count_seconds": count_stat.seconds,
        "materialize_seconds": rle_stat.seconds,
        "pair_expansion_rows_per_sec": total_m / mat_stat.seconds,
        "pair_materialize_seconds": mat_stat.seconds,
        "total_seconds_materialized": (build_stat.seconds
                                       + count_stat.seconds
                                       + mat_stat.seconds),
        "total_seconds": build_stat.seconds + probe_seconds,
        "probe_rows_per_sec": cfg.probe_rows / probe_seconds,
        "hbm_peak_gbps": hbm_peak_gbps(dev),
        "verified": verified,
    }


def bench_join(cfg: JoinConfig, verify: bool, engine: str = "v2") -> dict:
    from tpujoin.ops import merge_join as mj_mod

    if cfg.expected_matches > 2.5e8 and engine == "v2":
        return bench_join_dense(cfg, verify)

    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(cfg.seed))
    bk = datagen.make_keys(rng_r, cfg.build_rows, cfg.key_min, cfg.key_max,
                           cfg.distribution, cfg.zipf_s)
    pk = datagen.make_keys(rng_s, cfg.probe_rows, cfg.key_min, cfg.key_max,
                           cfg.distribution, cfg.zipf_s)
    jax.block_until_ready((bk, pk))

    # ---- phase timings (median of 3, fully synchronized) ----
    build_stat = time_fn(hj_mod.build, bk, name="build",
                         rows=cfg.build_rows,
                         bytes_touched=cfg.build_rows * 4 * 4)
    ht = hj_mod.build(bk)

    if engine == "v1":
        count_stat = time_fn(
            hj_mod.probe_count, ht, pk, name="count", rows=cfg.probe_rows,
            bytes_touched=(cfg.build_rows + cfg.probe_rows) * 4 * 4)
        lo, counts = hj_mod.probe_count(ht, pk)
        total = int(jnp.sum(counts))
        cap = round_up(total, cfg.result_pad_multiple)
        mat_stat = time_fn(
            lambda: hj_mod.probe_materialize(ht, lo, counts, cap),
            name="materialize", rows=total,
            bytes_touched=cfg.probe_rows * 8 + cap * 8 * 3)

        def materialize():
            return hj_mod.probe_materialize(ht, lo, counts, cap)
    else:
        count_stat = time_fn(
            mj_mod.probe_count, ht, pk, name="count", rows=cfg.probe_rows,
            bytes_touched=(cfg.build_rows + cfg.probe_rows * 3) * 4)
        state, total_a, nonzero_a = mj_mod.probe_count(ht, pk)
        total, nonzero = int(total_a), int(nonzero_a)
        cap = round_up(total, cfg.result_pad_multiple)
        k_cap = round_up(nonzero, max(cfg.result_pad_multiple // 8, 1024))
        mat_stat = time_fn(
            lambda: mj_mod.probe_materialize(ht, state, k_cap, cap),
            name="materialize", rows=total,
            bytes_touched=cfg.probe_rows * 12 + cap * 8 * 2)

        def materialize():
            return mj_mod.probe_materialize(ht, state, k_cap, cap)

    probe_seconds = count_stat.seconds + mat_stat.seconds
    total_seconds = build_stat.seconds + probe_seconds

    for st in (build_stat, count_stat, mat_stat):
        eprint(json.dumps(st.as_dict()))

    verified = None
    if verify:
        from tpujoin import oracle
        r_ids, s_ids, _ = materialize()
        verified = oracle.check_join(
            np.asarray(bk), np.asarray(pk),
            np.asarray(r_ids[:total]), np.asarray(s_ids[:total])) == 1
        eprint(f"oracle multiset parity: {'PASS' if verified else 'FAIL'}")

    dev = jax.devices()[0]
    return {
        "engine": engine,
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


def bench_aggregate(rows: int, key_max: int, verify: bool) -> dict:
    """Hash aggregate (group-by count) — BASELINE.json config 3."""
    from tpujoin.ops import aggregate as agg

    keys = datagen.make_keys(jax.random.PRNGKey(0), rows, 1, key_max)
    jax.block_until_ready(keys)
    count_stat = time_fn(agg.group_count, keys, name="agg_count", rows=rows,
                         bytes_touched=rows * 8)
    ngroups = int(agg.group_count(keys))
    cap = round_up(ngroups, 1 << 20)
    mat_stat = time_fn(lambda: agg.group_materialize(keys, cap),
                       name="agg_materialize", rows=rows,
                       bytes_touched=rows * 12 + cap * 8)
    for st in (count_stat, mat_stat):
        eprint(json.dumps(st.as_dict()))
    verified = None
    if verify:
        from tpujoin import oracle
        gk, gc, _ = agg.group_materialize(keys, cap)
        ok, oc = oracle.group_by_count(np.asarray(keys))
        verified = (np.array_equal(np.asarray(gk[:ngroups]), ok)
                    and np.array_equal(np.asarray(gc[:ngroups]), oc))
        eprint(f"aggregate oracle parity: {'PASS' if verified else 'FAIL'}")
    secs = count_stat.seconds + mat_stat.seconds
    return {"op": "aggregate", "rows": rows, "groups": ngroups,
            "total_seconds": secs, "rows_per_sec": rows / secs,
            "verified": verified}


def bench_filter(rows: int, verify: bool) -> dict:
    """Selection + stream compaction (reference selection.mlir workload)."""
    from tpujoin.ops import filter as flt

    vals = jax.random.uniform(jax.random.PRNGKey(0), (rows,), jnp.float32,
                              0.0, 160.0)
    jax.block_until_ready(vals)
    cap = round_up(rows // 2 + rows // 8, 1 << 20)
    stat = time_fn(lambda: flt.filter_device(vals, 80.0, capacity=cap),
                   name="filter", rows=rows, bytes_touched=rows * 12)
    eprint(json.dumps(stat.as_dict()))
    verified = None
    if verify:
        ids, total = flt.filter_device(vals, 80.0, capacity=cap)
        total = int(total)
        v = np.asarray(vals)
        verified = (total == int((v < 80.0).sum())
                    and bool((v[np.asarray(ids[:total])] < 80.0).all()))
        eprint(f"filter parity: {'PASS' if verified else 'FAIL'}")
    return {"op": "filter", "rows": rows, "total_seconds": stat.seconds,
            "rows_per_sec": rows / stat.seconds, "verified": verified}


def bench_sort(rows: int) -> dict:
    """Key+payload sort — the primitive under build and probe phases."""
    from tpujoin.ops.sort import sort_with_ids

    keys = datagen.make_keys(jax.random.PRNGKey(0), rows, 1, 1 << 30)
    jax.block_until_ready(keys)
    stat = time_fn(sort_with_ids, keys, name="sort_keyval", rows=rows,
                   bytes_touched=rows * 16)
    eprint(json.dumps(stat.as_dict()))
    return {"op": "sort", "rows": rows, "total_seconds": stat.seconds,
            "rows_per_sec": rows / stat.seconds}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="preset name (default: ref_low_selectivity on TPU, "
                         "a scaled-down variant on CPU)")
    ap.add_argument("--verify", action="store_true",
                    help="full native-oracle multiset check (adds minutes)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="row-count scale factor")
    ap.add_argument("--engine", default="v2", choices=["v1", "v2"],
                    help="v1 = searchsorted probe; v2 = Pallas sort-merge")
    ap.add_argument("--op", default="join",
                    choices=["join", "aggregate", "filter", "sort"],
                    help="operator to benchmark (headline metric is join)")
    ap.add_argument("--rows", type=int, default=None,
                    help="row count for non-join ops")
    ap.add_argument("--trace", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the benchmark "
                         "into DIR (xprof/tensorboard format) — the "
                         "kernel-truth profiler, standing in for the "
                         "reference's Nsight Compute recipes "
                         "(nsight-command:1-15)")
    args = ap.parse_args()

    import contextlib
    trace_ctx = (jax.profiler.trace(args.trace) if args.trace
                 else contextlib.nullcontext())

    if args.op != "join":
        on_tpu = jax.devices()[0].platform != "cpu"
        rows = args.rows or (100_000_000 if on_tpu else 1_000_000)
        with trace_ctx:
            if args.op == "aggregate":
                detail = bench_aggregate(rows, max(rows // 10, 100),
                                         args.verify)
            elif args.op == "filter":
                detail = bench_filter(rows, args.verify)
            else:
                detail = bench_sort(rows)
        eprint(json.dumps(detail))
        print(json.dumps({
            "metric": f"{args.op}_rows_per_sec",
            "value": detail["rows_per_sec"],
            "unit": "rows/s",
            "vs_baseline": 1.0,  # no reference numbers exist for these ops
        }))
        return

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

    with trace_ctx:
        detail = bench_join(cfg, args.verify, engine=args.engine)
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
