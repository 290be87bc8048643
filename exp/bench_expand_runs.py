"""TPU validation + timing for kernels.expand_runs at config-1 scale."""
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


@jax.jit
def pairs_equal(r1, s1, r2, s2):
    """Exact multiset equality of two (r, s) pair sets (device-side)."""
    a1, b1 = jax.lax.sort((r1, s1), num_keys=2)
    a2, b2 = jax.lax.sort((r2, s2), num_keys=2)
    return jnp.logical_and(jnp.all(a1 == a2), jnp.all(b1 == b2))


def run(n, m, kmax, verify, name):
    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(1))
    bk = datagen.make_keys(rng_r, n, 1, kmax)
    pk = datagen.make_keys(rng_s, m, 1, kmax)
    jax.block_until_ready((bk, pk))
    ht = build(bk)
    state, total_a, nz_a = mj.probe_count(ht, pk)
    total, nonzero = int(total_a), int(nz_a)
    print(f"[{name}] total={total} nonzero={nonzero} "
          f"dup={total/max(nonzero,1):.1f}", file=sys.stderr, flush=True)
    cap = round_up(total, 1 << 20)
    k_cap = round_up(nonzero, 1 << 20)

    st = time_fn(lambda: mj.probe_materialize_runs(ht, state, k_cap, cap,
                                                   src_slab=4096),
                 name=f"{name}_runs", rows=total, bytes_touched=total * 8)
    r2, s2, t2, fits = mj.probe_materialize_runs(ht, state, k_cap, cap,
                                                 src_slab=4096)
    print(f"[{name}] expand_runs: {st.seconds:.3f}s = "
          f"{total/st.seconds/1e6:.0f}M pairs/s  fits={bool(fits)} "
          f"({st.gbps:.0f} GB/s out)", file=sys.stderr, flush=True)

    if verify:
        st_old = time_fn(lambda: mj.probe_materialize(ht, state, k_cap, cap),
                         name=f"{name}_old", rows=total)
        r1, s1, t1, _ = mj.probe_materialize(ht, state, k_cap, cap)
        print(f"[{name}] old path: {st_old.seconds:.3f}s = "
              f"{total/st_old.seconds/1e6:.0f}M pairs/s",
              file=sys.stderr, flush=True)
        match = bool(pairs_equal(r1[:total], s1[:total],
                                 r2[:total], s2[:total]))
        print(f"[{name}] multiset equality: {match}",
              file=sys.stderr, flush=True)
        assert match, "MISMATCH"


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "small"
    if which == "small":
        # ~100M pairs, verify vs old path
        run(1_000_000, 1_000_000, 10_000, verify=True, name="1Mx1M")
    else:
        # config 1: 10M x 10M, keys 1..100k => ~1B pairs, timing only
        run(10_000_000, 10_000_000, 100_000, verify=False, name="10Mx10M")
    print("OK")
