#!/usr/bin/env python
"""Capture a focused xprof trace of the headline join phases on the TPU.

The committed-trace analogue of the reference's Nsight Compute recipes
(reference nsight-command:1-15): one warm run of each phase of both
reference configs under jax.profiler.trace, no datagen/compile/verify
noise inside the traced region. The resulting trace directory
(tensorboard/xprof format) is the kernel-truth artifact backing the
per-phase attribution tables in docs/ROOFLINE.md.

Usage: python exp/trace_capture.py [--out traces/xprof_r3]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from tpujoin.core import datagen
from tpujoin.core.config import PRESETS
from tpujoin.kernels.compact import pick_out_step
from tpujoin.ops import hash_join as hj
from tpujoin.ops import merge_join as mj
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import _sync


def _prep(cfg):
    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(cfg.seed))
    bk = datagen.make_keys(rng_r, cfg.build_rows, cfg.key_min, cfg.key_max)
    pk = datagen.make_keys(rng_s, cfg.probe_rows, cfg.key_min, cfg.key_max)
    jax.block_until_ready((bk, pk))
    return bk, pk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="traces/xprof_r3")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    plans = []
    for name in ("ref_low_selectivity", "ref_high_selectivity"):
        cfg = PRESETS[name]
        bk, pk = _prep(cfg)
        ht = hj.build(bk)
        state, total_a, nonzero_a = mj.probe_count(ht, pk)
        total, nonzero = int(total_a), int(nonzero_a)
        cap = round_up(total, cfg.result_pad_multiple)
        k_cap = round_up(nonzero, max(cfg.result_pad_multiple // 8, 1024))
        kname, plan_res, mat = mj.plan_materialize(ht, state, k_cap, cap,
                                                   total=total,
                                                   nonzero=nonzero)
        # free the plan's ~8 GB result buffers before re-running the
        # materialize (two live result sets OOM HBM on the 1B-pair config)
        del plan_res
        # warm every executable outside the traced region
        _sync(mat())
        plans.append((name, bk, pk, ht, mat, kname))
        print(f"{name}: warmed (materialize kernel = {kname})", flush=True)

    with jax.profiler.trace(args.out):
        for name, bk, pk, ht, mat, kname in plans:
            with jax.profiler.TraceAnnotation(f"{name}/build"):
                _sync(hj.build(bk).sorted_keys)
            with jax.profiler.TraceAnnotation(f"{name}/count"):
                _sync(mj.probe_count(ht, pk)[0].counts)
            with jax.profiler.TraceAnnotation(f"{name}/materialize_{kname}"):
                _sync(mat()[0])
    print(f"trace written to {args.out}", flush=True)


if __name__ == "__main__":
    main()
