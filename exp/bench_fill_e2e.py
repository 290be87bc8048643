"""TPU end-to-end timing of probe_materialize_fill at config-1 scale
(10M x 10M keys 1..100k => ~1.04B pairs), vs probe_materialize_groups.
Verifies multiset-relevant invariants on a sampled window.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tpujoin.core import datagen
from tpujoin.ops import merge_join as mj
from tpujoin.ops.hash_join import build
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn


def ep(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = m = 10_000_000
    kmax = 100_000
    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(0))
    bk = datagen.make_keys(rng_r, n, 1, kmax)
    pk = datagen.make_keys(rng_s, m, 1, kmax)
    jax.block_until_ready((bk, pk))

    bstat = time_fn(build, bk, name="build", rows=n)
    ht = build(bk)
    cstat = time_fn(mj.probe_count, ht, pk, name="count", rows=m)
    state, total_a, nonzero_a = mj.probe_count(ht, pk)
    total, nonzero = int(total_a), int(nonzero_a)
    ep(f"build {bstat.seconds:.3f}s  count {cstat.seconds:.3f}s  "
       f"total {total}  nonzero {nonzero}")
    k_cap = round_up(nonzero, 1 << 20)
    cap = round_up(total, 1 << 20)

    for step in (32768, 65536):
        for slab in (4096,):
            _, _, _, fits = mj.probe_materialize_fill(
                ht, state, k_cap, cap, src_slab=slab, profile=(step, 24))
            ep(f"fill step={step} slab={slab} fits={bool(fits)}")
            if not bool(fits):
                continue
            st = time_fn(lambda s=step, sl=slab: mj.probe_materialize_fill(
                ht, state, k_cap, cap, src_slab=sl, profile=(s, 24)),
                name=f"mat_fill_{step}", rows=total)
            ep(f"  fill step={step}: {st.seconds:.3f}s = "
               f"{total / st.seconds / 1e6:.0f}M pairs/s  "
               f"e2e {bstat.seconds + cstat.seconds + st.seconds:.3f}s")

    # sampled parity: compare a 2M-slot window against groups kernel
    r_f, s_f, _, fits_f = mj.probe_materialize_fill(
        ht, state, k_cap, cap, src_slab=4096, profile=(65536, 24))
    r_g, s_g, _, fits_g = mj.probe_materialize_groups(
        ht, state, k_cap, cap, src_slab=4096)
    if bool(fits_f) and bool(fits_g):
        w = slice(500_000_000, 502_000_000)
        ok = (np.array_equal(np.asarray(r_f[w]), np.asarray(r_g[w]))
              and np.array_equal(np.asarray(s_f[w]), np.asarray(s_g[w])))
        ep(f"window parity vs groups kernel: {'PASS' if ok else 'FAIL'}")
        ok2 = (np.array_equal(np.asarray(r_f[:1000]), np.asarray(r_g[:1000]))
               and np.asarray(r_f[total - 1]) == np.asarray(r_g[total - 1]))
        ep(f"edge parity: {'PASS' if ok2 else 'FAIL'}")
    else:
        ep(f"parity skipped: fits fill={bool(fits_f)} groups={bool(fits_g)}")


if __name__ == "__main__":
    main()
