#!/usr/bin/env python
"""Microbenchmarks of the primitives the join engine is built from, on the
attached chip. Informs kernel design: what is fast (dense streams, sort
networks) vs poison (random access) on this TPU generation.

Run: python bench/primitives.py [--small]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.utils.timing import time_fn
from tpujoin.utils.hw import hbm_peak_gbps


def report(name, stat, nbytes):
    gbps = nbytes / stat.seconds / 1e9
    peak = hbm_peak_gbps() or 1e-9
    print(json.dumps({
        "bench": name, "seconds": round(stat.seconds, 6),
        "gbps": round(gbps, 2), "hbm_frac": round(gbps / peak, 4),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    N = 10_000_000 if args.small else 100_000_000
    M = N // 10

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    data = jax.random.randint(k1, (N,), 1, 1 << 30, dtype=jnp.int32)
    idx = jax.random.randint(k2, (M,), 0, N, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    queries = jax.random.randint(k3, (M,), 1, 1 << 30, dtype=jnp.int32)
    jax.block_until_ready((data, idx, idx_sorted, queries))

    # E0: dense elementwise pass (upper bound sanity)
    f = jax.jit(lambda x: x + 1)
    report("dense_add_N", time_fn(f, data), N * 8)

    # E1: XLA gather, random vs sorted(local) indices
    g = jax.jit(lambda d, i: jnp.take(d, i))
    report("gather_random_M_from_N", time_fn(g, data, idx), M * 8 + N * 4)
    report("gather_sorted_M_from_N", time_fn(g, data, idx_sorted), M * 8 + N * 4)

    # E2: scatter M into N
    s = jax.jit(lambda d, i, v: d.at[i].set(v, mode="drop"))
    vals = jnp.ones((M,), jnp.int32)
    report("scatter_random_M_into_N", time_fn(s, data, idx, vals), M * 8 + N * 4)

    # E3: sort throughput
    srt1 = jax.jit(lambda x: jax.lax.sort(x))
    report("sort_keys_N", time_fn(srt1, data), N * 4)
    ids = jnp.arange(N, dtype=jnp.int32)
    srt2 = jax.jit(lambda x, i: jax.lax.sort((x, i), num_keys=1))
    report("sort_keyval_N", time_fn(srt2, data, ids), N * 8)
    small = data[:M]
    report("sort_keys_M", time_fn(srt1, small), M * 4)

    # E4: searchsorted variants
    sorted_data = jax.lax.sort(data)
    jax.block_until_ready(sorted_data)
    for method in ("sort", "compare_all", "scan_unrolled"):
        if method == "compare_all" and N > 1_000_000:
            continue  # O(N*M) memory
        ss = jax.jit(functools.partial(
            jnp.searchsorted, side="left", method=method))
        try:
            report(f"searchsorted_{method}_M_in_N",
                   time_fn(ss, sorted_data, queries), (N + M) * 4)
        except Exception as e:  # noqa: BLE001
            print(f"searchsorted_{method}: {type(e).__name__}", file=sys.stderr)

    # E5: cumsum
    c = jax.jit(lambda x: jnp.cumsum(x))
    report("cumsum_N", time_fn(c, data), N * 8)

    # E6: Pallas VMEM dynamic gather (vector indices into a VMEM table)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TBL, TILE = 16384, 65536

        def kern(tbl_ref, idx_ref, out_ref):
            out_ref[:] = tbl_ref[:][idx_ref[:]]

        @jax.jit
        def vmem_gather(tbl, indices):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((TILE,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tbl, indices)

        tbl = jnp.arange(TBL, dtype=jnp.int32)
        vidx = jax.random.randint(k2, (TILE,), 0, TBL, dtype=jnp.int32)
        stat = time_fn(vmem_gather, tbl, vidx)
        print(json.dumps({
            "bench": "pallas_vmem_gather_64k_from_16k",
            "seconds": round(stat.seconds, 6),
            "gelems_per_sec": round(TILE / stat.seconds / 1e9, 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas_vmem_gather failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # E7: Pallas HBM->VMEM->HBM streaming copy (achievable BW)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        CH = 512 * 1024  # i32 elements per block (2 MB)

        def copy_kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2

        @jax.jit
        def stream(x):
            return pl.pallas_call(
                copy_kern,
                grid=(x.shape[0] // CH,),
                in_specs=[pl.BlockSpec((CH,), lambda i: (i,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((CH,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x)

        nstream = (N // CH) * CH
        stat = time_fn(stream, data[:nstream])
        report("pallas_stream_copy_N", stat, nstream * 8)
    except Exception as e:  # noqa: BLE001
        print(f"pallas_stream failed: {type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
