"""TPU microbench: Pallas stream-compaction kernel vs the 3-ary sort.

The materialize phase's compaction is the biggest non-kernel cost in the
low-selectivity join (exp/sort_variants.py: compact3 sort 0.79 s at 100M).
This measures kernels/compact.py head-to-head on the ref_low shape:
100M rows, ~9.5% selectivity (the real workload's matched-row density),
plus a selectivity sweep for the OUT-step envelope table in ROOFLINE.md.

Run: PYTHONPATH=/root/repo python exp/compact_bench.py [--rows N]
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpujoin.kernels.compact import compact3, pick_out_step
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn


def sort_compact3(lo, cnt, sid, k_cap):
    mlo = jnp.where(cnt > 0, lo, jnp.int32(0x7FFFFFFF))
    mlo_s, cnt_s, sid_s = jax.lax.sort((mlo, cnt, sid), num_keys=1)
    lo_s = jnp.where(cnt_s > 0, mlo_s, 0)
    return (jax.lax.slice_in_dim(lo_s, 0, k_cap),
            jax.lax.slice_in_dim(cnt_s, 0, k_cap),
            jax.lax.slice_in_dim(sid_s, 0, k_cap))


sort_compact3 = jax.jit(sort_compact3, static_argnames=("k_cap",))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--sels", type=float, nargs="*",
                    default=[0.095, 0.30, 0.60])
    args = ap.parse_args()
    n = args.rows

    for sel in args.sels:
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        flag = jax.random.uniform(k1, (n,)) < sel
        cnt = jnp.where(flag, jax.random.randint(k2, (n,), 1, 3), 0)
        cnt = cnt.astype(jnp.int32)
        lo = jnp.sort(jax.random.randint(k3, (n,), 0, n)).astype(jnp.int32)
        sid = jnp.arange(n, dtype=jnp.int32)
        nonzero = int(jnp.sum((cnt > 0).astype(jnp.int32)))
        k_cap = round_up(nonzero, 1 << 17)
        out = pick_out_step(n, nonzero)
        print(f"--- sel={sel} nonzero={nonzero} k_cap={k_cap} "
              f"out_step={out}", file=sys.stderr, flush=True)

        if out is not None:
            *_, fits = compact3(lo, cnt, sid, k_cap, out_step=out)
            print(f"kernel fits: {bool(fits)}", file=sys.stderr, flush=True)
            if bool(fits):
                st = time_fn(
                    lambda: compact3(lo, cnt, sid, k_cap, out_step=out)[:3],
                    name=f"compact_kernel/{out}", rows=n,
                    bytes_touched=n * 12 + k_cap * 12)
                print(st.as_dict(), flush=True)
                # parity vs the sort path
                a0, b0, c0 = [np.asarray(x) for x in
                              compact3(lo, cnt, sid, k_cap, out_step=out)[:3]]
        st = time_fn(lambda: sort_compact3(lo, cnt, sid, k_cap),
                     name="compact_sort3", rows=n,
                     bytes_touched=n * 12 + k_cap * 12)
        print(st.as_dict(), flush=True)
        if out is not None and bool(fits):
            a1, b1, c1 = [np.asarray(x)[:nonzero] for x in
                          sort_compact3(lo, cnt, sid, k_cap)]
            ok = (np.array_equal(a0[:nonzero], a1)
                  and np.array_equal(b0[:nonzero], b1)
                  and np.array_equal(c0[:nonzero], c1))
            print(f"parity kernel==sort: {'PASS' if ok else 'FAIL'}",
                  flush=True)


if __name__ == "__main__":
    main()
