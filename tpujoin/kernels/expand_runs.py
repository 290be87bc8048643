"""Pallas run-expansion kernel: gather-free pair materialization.

Produces the final (build_rowID, probe_rowID) pair columns directly from the
factorized (RLE) join result — per compacted probe row a run
(offset, lo, cnt, sid) over the sorted build ids. This replaces BOTH halves
of the old materialize path:

  - kernels.expand (dense per-slot compares over a row slab, the VPU cost
    that capped expansion at ~69M pairs/s), and
  - the trailing ``jnp.take(sorted_ids, bpos)`` (XLA element gather,
    measured ~123M idx/s on v5e — 8s alone at 1B pairs).

Key idea: within one run, the build-side output is a CONTIGUOUS slice of
``sorted_ids`` and the probe id is constant. So an output tile is fully
determined by the few runs that intersect it: for each such run, rotate a
VMEM slab of ``sorted_ids`` so the run's slice lands on its output lanes
(one dynamic ``pltpu.roll``) and overwrite the accumulator where
``lane >= run_start`` (runs are processed in ascending order, so the last
writer wins — no per-slot search, no gather, no atomics). This is the TPU
re-design of the reference's probe kernel's per-thread result writes
(reference join_v1.mlir:483-514 walks a chain per thread; here a whole run
of matches is one vector op).

Work per run-tile intersection is O(slab width) on the VPU, so throughput
scales with the average run length (duplication factor). The driver gates
this kernel to high-duplication workloads — exactly the regime where the
old path collapsed (the reference's 10Mx10M config: ~100 matches/row, 1B
pairs) — and falls back to expand+take otherwise.

Toolchain constraints honored (see CLAUDE.md): run metadata is DMA'd
HBM->SMEM (dynamic scalar reads from VMEM don't lower), slab DMA offsets
and sizes are 1024-multiples, per-tile run ranks are computed with vector
compares over a VMEM copy of the offsets slab (no dynamic vector gather),
and the rotate uses ``pltpu.roll`` (dynamic-start VMEM loads don't lower).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpujoin.utils.shapes import round_up

TILE = 1024          # output slots per sub-tile
BATCH = 8            # sub-tiles per grid step
STEP = TILE * BATCH  # output slots per grid step
META = 2048          # run-metadata slab (SMEM) per step
SRC_SLABS = (4096, 16384)  # sorted-build-ids slab sizes (VMEM) per step:
                     # small = cheap rotates (gapless/high-dup workloads);
                     # big = covers a giant run spanning a whole step plus
                     # moderate source gaps. The driver escalates on !fits.
ALIGN = 1024         # HBM i32 DMA offset/size granule


def _kernel(mb_ref, sb_ref, lim_ref,
            off_hbm, lo_hbm, sid_hbm, src_hbm,
            r_ref, s_ref,
            off_s, lo_s, sid_s, off_v, src_v, sems,
            *, src_slab: int, interpret: bool):
    SRC = src_slab
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
    # (1, META) is the only 1-D->2-D reshape this Mosaic build lowers
    offs2d = off_v[:].reshape(1, META)
    # highest valid slab-relative run index (pad runs beyond `nonzero` all
    # carry offset == total and must never win a tile)
    rel_max = jnp.minimum(nonzero - 1 - mb, META - 1)

    roll = jnp.roll if interpret else pltpu.roll

    for j in range(BATCH):
        t0 = (i * BATCH + j) * TILE
        # run rank via vector compares over the offsets slab: r0 = last run
        # with offset <= t0; r1 = last run with offset < t0 + TILE. All runs
        # before the slab have offset <= step start <= t0, so slab-local
        # counts are exact (fit is guaranteed by the host-side plan).
        r0 = jnp.sum((offs2d <= t0).astype(jnp.int32)) - 1
        r1 = jnp.sum((offs2d < t0 + TILE).astype(jnp.int32)) - 1
        r0 = jnp.clip(r0, 0, rel_max)
        r1 = jnp.clip(r1, r0, rel_max)

        u = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

        def body(d, acc, r0=r0, t0=t0):
            acc_r, acc_s = acc
            m = r0 + d
            off_d = off_s[m]
            lo_d = lo_s[m]
            sid_d = sid_s[m]
            # slab-relative rotation: rolled[u] = slab[(u + delta) mod SRC]
            # = sorted_ids[lo_d + (t0 + u - off_d)] for in-range lanes;
            # canonicalize the shift into (-SRC, 0]
            raw = t0 - off_d + lo_d - sb
            delta = jax.lax.rem(jax.lax.rem(raw, SRC) + SRC, SRC)
            rolled = roll(slab, -delta, 1)[:, :TILE]
            mask = u >= (off_d - t0)
            return (jnp.where(mask, rolled, acc_r),
                    jnp.where(mask, sid_d, acc_s))

        zero = jnp.zeros((1, TILE), jnp.int32)
        acc_r, acc_s = jax.lax.fori_loop(0, r1 - r0 + 1, body, (zero, zero))

        valid = (t0 + u) < total
        sl = slice(j * TILE, (j + 1) * TILE)
        r_ref[sl] = jnp.where(valid, acc_r, -1).reshape(TILE)
        s_ref[sl] = jnp.where(valid, acc_s, -1).reshape(TILE)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "src_slab", "interpret"))
def expand_runs(
    offsets: jax.Array,     # [K] exclusive cumsum of counts over compacted
                            #     runs (strictly increasing on the first
                            #     `nonzero` rows, == total after)
    lo: jax.Array,          # [K] run starts into src (non-decreasing, and
                            #     lo[d+1] >= lo[d] + cnt[d] when the probe
                            #     key strictly increases)
    counts: jax.Array,      # [K] run lengths (> 0 on the compacted prefix)
    sid: jax.Array,         # [K] probe ids (arbitrary payload)
    src: jax.Array,         # [n] sorted build ids (values copied verbatim)
    nonzero: jax.Array,     # scalar: number of real (non-pad) runs
    total: jax.Array,       # scalar: exact number of result pairs
    capacity: int,
    *,
    src_slab: int = SRC_SLABS[0],
    interpret: bool | None = None,
):
    """(r_vals, s_ids, fits): for each output slot t, the pair
    (src[bpos_t], sid of t's run), with slots >= total set to -1.

    ``fits`` is a device bool: True iff every grid step's runs fit the META
    slab and every step's source window fits the SRC slab. When False the
    outputs are garbage and the caller must use the fallback path — the
    kernel itself never reads out of bounds either way (DMA bases are
    clamped; rotations wrap in-register).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    SRC = src_slab
    k = offsets.shape[0]
    n = src.shape[0]
    cap = round_up(capacity, STEP)
    num_steps = cap // STEP

    k_pad = max(round_up(max(k, 1), ALIGN), META)
    n_pad = max(round_up(max(n, 1), ALIGN), SRC)
    offp = jnp.full((k_pad,), jnp.int32(0x7FFFFFFF)).at[:k].set(offsets)
    lop = jnp.zeros((k_pad,), jnp.int32).at[:k].set(lo)
    sidp = jnp.zeros((k_pad,), jnp.int32).at[:k].set(sid)
    srcp = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(src)

    # ---- host-side (still jitted, all O(num_steps)) plan ----
    t0s = jnp.arange(num_steps, dtype=jnp.int32) * STEP
    last = jnp.maximum(nonzero - 1, 0).astype(jnp.int32)
    r0s = jnp.searchsorted(offp, t0s, side="right",
                           method="scan_unrolled").astype(jnp.int32) - 1
    r1s = jnp.searchsorted(offp, t0s + STEP, side="left",
                           method="scan_unrolled").astype(jnp.int32) - 1
    r0s = jnp.clip(r0s, 0, last)
    r1s = jnp.clip(r1s, r0s, last)
    meta_base = jnp.clip((r0s // ALIGN) * ALIGN, 0, k_pad - META)
    meta_fit = jnp.all(r1s - meta_base < META)

    lo0 = jnp.take(lop, r0s)
    off0 = jnp.take(offp, r0s)
    lo1 = jnp.take(lop, r1s)
    off1 = jnp.take(offp, r1s)
    cnt1 = jnp.take(jnp.zeros((k_pad,), jnp.int32).at[:k].set(counts), r1s)
    # lowest src index any WINNING lane reads in the step: the carry-in
    # run reads from bpos(step start), but runs STARTING inside the step
    # read from their own lo — which for duplicate probe keys jumps BACK
    # below bpos(step start) (equal keys share a build range). lo is
    # non-decreasing, so lo[r0s+1] bounds every such run.
    smin = lo0 + jnp.maximum(0, t0s - off0)
    lo_next = jnp.take(lop, jnp.minimum(r0s + 1, last))
    smin = jnp.where(r1s > r0s, jnp.minimum(smin, lo_next), smin)
    smax = lo1 + jnp.minimum(cnt1, t0s + STEP - off1) - 1
    src_base = jnp.clip((smin // ALIGN) * ALIGN, 0, n_pad - SRC)
    # steps at/after the boundary read garbage that `total` masks off; only
    # steps with real slots constrain the fit
    real = t0s < total
    src_fit = jnp.all(jnp.where(real, smax - src_base < SRC, True))
    fits = jnp.logical_and(meta_fit, src_fit)

    lim = jnp.stack([nonzero.astype(jnp.int32), total.astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
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
    r_vals, s_ids = pl.pallas_call(
        functools.partial(_kernel, src_slab=src_slab, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cap,), jnp.int32),
            jax.ShapeDtypeStruct((cap,), jnp.int32),
        ],
        interpret=interpret,
    )(meta_base, src_base, lim, offp, lop, sidp, srcp)
    return r_vals[:capacity], s_ids[:capacity], fits
