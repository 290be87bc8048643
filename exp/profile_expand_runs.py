"""Ablation profile of the expand_runs kernel on synthetic gapless runs.

Variants:
  full       — the real kernel body
  noroll     — roll replaced by a static slab slice (measures roll cost)
  noscalar   — fori_loop body reads no SMEM scalars (uses d directly)
  norank     — per-sub-tile rank reduces removed (r0=0, r1=nruns-1 approx)
  empty      — loop runs but body only adds constants (loop overhead)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn

TILE = 1024
BATCH = 8
STEP = TILE * BATCH
META = 2048
SRC = 4096
ALIGN = 1024


def _kernel(mb_ref, sb_ref, lim_ref,
            off_hbm, lo_hbm, sid_hbm, src_hbm,
            r_ref, s_ref,
            off_s, lo_s, sid_s, off_v, src_v, sems,
            *, variant: str):
    i = pl.program_id(0)
    mb = pl.multiple_of(mb_ref[i], ALIGN)
    sb = pl.multiple_of(sb_ref[i], ALIGN)
    nonzero = lim_ref[0]
    total = lim_ref[1]

    copies = (
        pltpu.make_async_copy(off_hbm.at[pl.ds(mb, META)], off_s, sems.at[0]),
        pltpu.make_async_copy(lo_hbm.at[pl.ds(mb, META)], lo_s, sems.at[1]),
        pltpu.make_async_copy(sid_hbm.at[pl.ds(mb, META)], sid_s, sems.at[2]),
        pltpu.make_async_copy(off_hbm.at[pl.ds(mb, META)], off_v, sems.at[3]),
        pltpu.make_async_copy(src_hbm.at[pl.ds(sb, SRC)], src_v, sems.at[4]),
    )
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    slab = src_v[:].reshape(1, SRC)
    offs2d = off_v[:].reshape(1, META)
    rel_max = jnp.minimum(nonzero - 1 - mb, META - 1)

    for j in range(BATCH):
        t0 = (i * BATCH + j) * TILE
        if variant == "norank":
            r0 = jnp.int32(0)
            r1 = jnp.minimum(rel_max, 12)
        else:
            r0 = jnp.sum((offs2d <= t0).astype(jnp.int32)) - 1
            r1 = jnp.sum((offs2d < t0 + TILE).astype(jnp.int32)) - 1
            r0 = jnp.clip(r0, 0, rel_max)
            r1 = jnp.clip(r1, r0, rel_max)

        u = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

        def body(d, acc, r0=r0, t0=t0):
            acc_r, acc_s = acc
            if variant == "empty":
                return acc_r + d, acc_s + d
            if variant == "noscalar":
                off_d, lo_d, sid_d = t0 + d, d * 7, d
            else:
                m = r0 + d
                off_d = off_s[m]
                lo_d = lo_s[m]
                sid_d = sid_s[m]
            raw = t0 - off_d + lo_d - sb
            delta = jax.lax.rem(jax.lax.rem(raw, SRC) + SRC, SRC)
            if variant == "noroll":
                rolled = slab[:, :TILE] + delta
            else:
                rolled = pltpu.roll(slab, -delta, 1)[:, :TILE]
            mask = u >= (off_d - t0)
            return (jnp.where(mask, rolled, acc_r),
                    jnp.where(mask, sid_d, acc_s))

        zero = jnp.zeros((1, TILE), jnp.int32)
        acc_r, acc_s = jax.lax.fori_loop(0, r1 - r0 + 1, body, (zero, zero))

        valid = (t0 + u) < total
        sl = slice(j * TILE, (j + 1) * TILE)
        r_ref[sl] = jnp.where(valid, acc_r, -1).reshape(TILE)
        s_ref[sl] = jnp.where(valid, acc_s, -1).reshape(TILE)


@functools.partial(jax.jit, static_argnames=("capacity", "variant"))
def run_variant(offp, lop, sidp, srcp, meta_base, src_base, lim,
                capacity, variant):
    cap = round_up(capacity, STEP)
    num_steps = cap // STEP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=[
            pl.BlockSpec((STEP,), lambda i, *_: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP,), lambda i, *_: (i,),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((META,), jnp.int32),
            pltpu.SMEM((META,), jnp.int32),
            pltpu.SMEM((META,), jnp.int32),
            pltpu.VMEM((META,), jnp.int32),
            pltpu.VMEM((SRC,), jnp.int32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap,), jnp.int32)] * 2,
    )(meta_base, src_base, lim, offp, lop, sidp, srcp)


def main():
    # synthetic gapless runs: K runs of length DUP each -> capacity pairs
    dup = 100
    k = 1_000_000
    capacity = k * dup  # 100M
    cap = round_up(capacity, STEP)
    num_steps = cap // STEP

    k_pad = max(round_up(k, ALIGN), META)
    n = k * dup // 8  # src reused by 8 consecutive runs
    n_pad = max(round_up(n, ALIGN), SRC)

    counts = np.full(k, dup, np.int32)
    offs = (np.arange(k, dtype=np.int64) * dup).astype(np.int32)
    lo = ((np.arange(k, dtype=np.int64) // 8) * dup
          % max(n - dup, 1)).astype(np.int32)
    sid = np.arange(k, dtype=np.int32)

    offp = np.full(k_pad, 0x7FFFFFFF, np.int32); offp[:k] = offs
    lop = np.zeros(k_pad, np.int32); lop[:k] = lo
    sidp = np.zeros(k_pad, np.int32); sidp[:k] = sid
    srcp = np.arange(n_pad, dtype=np.int32)

    t0s = np.arange(num_steps, dtype=np.int64) * STEP
    r0s = np.clip(np.searchsorted(offs, t0s, "right") - 1, 0, k - 1)
    r1s = np.clip(np.searchsorted(offs, t0s + STEP, "left") - 1, 0, k - 1)
    meta_base = np.clip((r0s // ALIGN) * ALIGN, 0, k_pad - META)
    smin = np.minimum(lo[r0s], lo[np.minimum(r0s + 1, k - 1)])
    src_base = np.clip((smin // ALIGN) * ALIGN, 0, n_pad - SRC)
    smax = lo[r1s] + dup
    assert (smax - src_base < SRC).all(), "synthetic workload must fit"

    lim = jnp.asarray([k, capacity], jnp.int32)
    args = [jnp.asarray(x) for x in
            (offp, lop, sidp, srcp,
             meta_base.astype(np.int32), src_base.astype(np.int32))]
    jax.block_until_ready(args)

    for variant in ("full", "noroll", "noscalar", "norank", "empty"):
        st = time_fn(lambda v=variant: run_variant(
            *args, lim, capacity, v),
            name=variant, rows=capacity)
        print(f"{variant:10s} {st.seconds:.3f}s  "
              f"{capacity/st.seconds/1e6:.0f}M pairs/s", flush=True)


if __name__ == "__main__":
    main()
