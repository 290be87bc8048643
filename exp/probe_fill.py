"""Prototype: marker-scatter + doubling forward-fill for the s column.

Design under test (candidate expand_groups v2 probe column):
  1. XLA-side: scatter each run's probe id at its output offset into a
     cap-sized marker buffer (-1 elsewhere).  ~10M scatters at config 1.
  2. Pallas: per STEP-sized block, doubling forward-fill on wide
     (rows, 128) ops with a cross-step SMEM carry.  log2(STEP) iterations
     of ~6 wide ops replace the current kernel's per-tile W=32 scalar-read
     select chain (the suspected bottleneck: ~5k scalar ops/step).

Measures at config-1 scale (10M x 10M keys 1..100k => ~1.04B pairs):
  scatter time, fill-kernel time for STEP in {16K, 32K, 64K}, parity of
  the filled column vs a numpy recompute on a sampled prefix.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tpujoin.core import datagen
from tpujoin.kernels.expand_groups import _flat_roll
from tpujoin.ops import merge_join as mj
from tpujoin.ops.hash_join import build
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn

LANES = 128


def ep(*a):
    print(*a, file=sys.stderr, flush=True)


def _fill_kernel(m_ref, o_ref, carry, *, step):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[0] = -1

    c_in = carry[0]
    rows = step // LANES
    x = m_ref[...]
    flat = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))
    k = 1
    while k < step:
        shifted = _flat_roll(x, k, pltpu.roll)
        x = jnp.where(x >= 0, x, jnp.where(flat >= k, shifted, x))
        k *= 2
    o_ref[...] = jnp.where(x >= 0, x, c_in)
    carry[0] = o_ref[rows - 1, LANES - 1]


@functools.partial(jax.jit, static_argnames=("step",))
def fill_forward(mark2d, step):
    rows_total = mark2d.shape[0]
    srows = step // LANES
    return pl.pallas_call(
        functools.partial(_fill_kernel, step=step),
        grid=(rows_total // srows,),
        in_specs=[pl.BlockSpec((srows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((srows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(mark2d)


@functools.partial(jax.jit, static_argnames=("cap",))
def scatter_markers(offs_c, sid_c, nonzero, cap):
    row = jnp.arange(offs_c.shape[0], dtype=jnp.int32)
    pos = jnp.where(row < nonzero, offs_c, cap)  # OOB rows -> dropped
    mark = jnp.full((cap,), -1, jnp.int32)
    mark = mark.at[pos].set(sid_c, mode="drop")
    return mark.reshape(cap // LANES, LANES)


def main():
    n = m = 10_000_000
    kmax = 100_000
    rng_r, rng_s = jax.random.split(jax.random.PRNGKey(0))
    bk = datagen.make_keys(rng_r, n, 1, kmax)
    pk = datagen.make_keys(rng_s, m, 1, kmax)
    jax.block_until_ready((bk, pk))

    ht = build(bk)
    state, total_a, nonzero_a = mj.probe_count(ht, pk)
    total, nonzero = int(total_a), int(nonzero_a)
    ep(f"total pairs {total}  nonzero rows {nonzero}")
    k_cap = round_up(nonzero, 1 << 20)
    cap = round_up(total, 1 << 20)

    # compaction identical to probe_materialize_groups
    @functools.partial(jax.jit, static_argnames=("kc",))
    def compact(state, kc):
        cnt = state.counts
        z = (cnt == 0).astype(jnp.int32)
        _, lo_s, cnt_s, sid_s = jax.lax.sort(
            (z, state.lo, cnt, state.probe_ids), num_keys=1)
        mm = cnt.shape[0]

        def fit(a):
            if kc <= mm:
                return jax.lax.slice_in_dim(a, 0, kc)
            return jnp.pad(a, (0, kc - mm))

        lo_c, cnt_c, sid_c = fit(lo_s), fit(cnt_s), fit(sid_s)
        offs_c = jnp.cumsum(cnt_c) - cnt_c
        return lo_c, cnt_c, sid_c, offs_c

    lo_c, cnt_c, sid_c, offs_c = jax.block_until_ready(
        compact(state, k_cap))

    st = time_fn(lambda: scatter_markers(offs_c, sid_c, nonzero_a, cap),
                 name="scatter_markers", rows=nonzero)
    ep(f"scatter: {st.seconds:.4f}s")
    mark2d = scatter_markers(offs_c, sid_c, nonzero_a, cap)
    jax.block_until_ready(mark2d)

    for step in (16384, 32768, 65536):
        stf = time_fn(lambda s=step: fill_forward(mark2d, s),
                      name=f"fill_{step}", rows=total)
        ep(f"fill STEP={step}: {stf.seconds:.4f}s "
           f"=> {total / stf.seconds / 1e6:.0f}M slots/s "
           f"(scatter+fill {total / (stf.seconds + st.seconds) / 1e6:.0f}M/s)")

    # parity on a prefix: s[t] must equal sid of the run covering t
    filled = np.asarray(fill_forward(mark2d, 32768).reshape(-1)[:1 << 20])
    offs_h = np.asarray(offs_c[:nonzero])
    sid_h = np.asarray(sid_c[:nonzero])
    t = np.arange(1 << 20)
    run = np.searchsorted(offs_h, t, side="right") - 1
    ok = bool((filled == sid_h[run]).all())
    ep(f"parity on first 1M slots: {'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
