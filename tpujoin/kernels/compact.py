"""Pallas stream-compaction kernel: compact-by-sort without the sort.

Stable compaction of three i32 columns (lo, cnt, sid) to the rows with
cnt > 0 — the materialize phase's compaction step (the TPU re-design of
the reference probe kernel's per-thread result-slot claiming, reference
join_v1.mlir:446-482). The shipped XLA path does this with a 3-operand
stable sort (exp/sort_variants.py: 0.79 s at 100M rows — the measured
floor for ANY sort-based compaction is the 0.40 s keys-only sort), but
compaction only MOVES ~1.4 GB at 10% selectivity: a direct data-movement
kernel has a ~2 ms speed-of-light, 200x below the sort floor.

Design (no dynamic VMEM gather/scatter on this toolchain — CLAUDE.md):

  plan (host, jitted): per-1024-row-block match counts -> exclusive
      prefix E[b]. Each grid step emits OUT compacted rows and DMAs an
      ALIGN-aligned slab of SLAB input rows starting at the block
      containing its first match (scalar-prefetched row offset + base
      rank, the kernels.expand idiom).
  ranks (kernel): two-level flat prefix sum of the match flags — 7
      static lane-roll stages within rows + a row-level doubling pass —
      gives each slab element its global compacted rank, hence its
      destination dest within this step's OUT outputs.
  placement (kernel): each kept element must move LEFT by
      s_i = i - dest_i, the number of dropped slots before it in the
      slab. s_i is NON-DECREASING in i, which makes the bitwise staged
      shift (move by 2^k iff bit k of the remaining shift, k ascending)
      collision-free: if two kept elements i < j ever landed on one slot
      after stage k, then j - i = (s_j mod 2^{k+1}) - (s_i mod 2^{k+1})
      <= s_j - s_i = #dropped in [i, j) <= j - i - 1 (i itself is kept)
      — a contradiction. Every stage is a static flat shift (lane roll +
      static row shift) plus selects: pure VPU work on the primitives
      this toolchain lowers well.

Fit envelope (host-checked, returned as ``fits``): every step's covering
input span must fit one SLAB — i.e. local selectivity must not drop far
below OUT/SLAB. The caller picks OUT from the globally known selectivity
and falls back to the sort-based compaction when fits is False; outputs
are all-zero holes (never stale garbage) in the non-fitting steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpujoin.utils.shapes import round_up

LANES = 128
ALIGN = 1024          # HBM i32 DMA offset/size granule
SLAB = 65536          # input rows DMA'd per grid step
OUT_STEPS = (8192, 4096, 2048, 1024)   # selectable outputs per grid step
COVER_SLACK = 1.3     # plan headroom over mean span (binomial tails are
                      # tiny at these widths; the device fits flag is the
                      # actual guard)


def _flat_shl(x, d: int, roll, fill=0):
    """out.flat[p] = x.flat[p + d] for p < size - d, else ``fill``;
    static d. Composed of a static row shift (concat) and one static
    lane roll with a cross-row fix — never a dynamic sublane roll."""
    rows = x.shape[0]
    q, r = divmod(d, LANES)
    if q:
        filler = jnp.full((q, LANES), fill, x.dtype)
        y = jnp.concatenate([x[q:], filler], axis=0)
    else:
        y = x
    if r == 0:
        return y
    z1 = roll(y, LANES - r, 1)            # z1[i,l] = y[i, (l+r) % 128]
    y_next = jnp.concatenate(
        [y[1:], jnp.full((1, LANES), fill, x.dtype)], axis=0)
    z2 = roll(y_next, LANES - r, 1)       # z2[i,l] = y[i+1, (l+r) % 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - r, z1, z2)


def _rank_excl(flag_i32, roll):
    """Exclusive flat prefix sum of a 0/1 (SR, LANES) array, row-major
    flat order: 7 masked lane-roll stages + a row-level doubling pass."""
    sr = flag_i32.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, flag_i32.shape, 1)
    lc = flag_i32
    d = 1
    while d < LANES:
        sh = roll(lc, d, 1)               # sh[i,l] = lc[i, (l-d) % 128]
        lc = lc + jnp.where(lane >= d, sh, 0)
        d *= 2
    rowtot = jnp.max(lc, axis=1, keepdims=True)   # = lc[:, -1] (monotone)
    rc = rowtot
    d = 1
    while d < sr:
        rc = rc + jnp.concatenate(
            [jnp.zeros((d, 1), jnp.int32), rc[:sr - d]], axis=0)
        d *= 2
    rowoff = rc - rowtot                  # exclusive row offsets
    return lc - flag_i32 + rowoff


def _plan(mi: jax.Array, k_cap: int, out_step: int, slab: int):
    """Host-side (jitted) plan shared by every compaction entry point:
    per-ALIGN-block match counts -> each grid step's slab offset ``r0``
    (rows), base rank, total ``nonzero``, and the coverage flag ``fits``.
    ``mi`` is the ALIGN-padded 0/1 i32 match mask. O(n/ALIGN) work — cheap
    enough that plan_materialize calls it standalone as a fits predicate
    BEFORE committing to the kernel (the full kernel still recomputes and
    returns the same flag as the authoritative guard)."""
    n_pad = mi.shape[0]
    nb = n_pad // ALIGN
    cblk = jnp.sum(mi.reshape(nb, ALIGN), axis=1)
    csum = jnp.cumsum(cblk)
    excl = csum - cblk
    nonzero = csum[-1]

    k_out = round_up(k_cap, out_step)
    num_steps = k_out // out_step
    starts = jnp.arange(num_steps, dtype=jnp.int32) * out_step
    b0 = jnp.searchsorted(excl, starts, side="right",
                          method="scan_unrolled").astype(jnp.int32) - 1
    r0 = jnp.clip(jnp.clip(b0, 0, nb - 1) * ALIGN, 0, n_pad - slab)
    base = jnp.take(excl, r0 // ALIGN)

    # coverage: blocks [r0/ALIGN, b1) must hold every match this step
    # emits; b1 = first block count reaching min(start + out_step,
    # nonzero) matches, +1 block of slack for the searchsorted boundary
    need = jnp.minimum(starts + out_step, nonzero)
    b1 = jnp.searchsorted(csum, need, side="left",
                          method="scan_unrolled").astype(jnp.int32) + 1
    fits = jnp.all(jnp.where(starts < nonzero,
                             b1 * ALIGN <= r0 + slab, True))
    return r0, base, nonzero, fits


@functools.partial(jax.jit,
                   static_argnames=("k_cap", "out_step", "slab"))
def plan_fits(cnt: jax.Array, k_cap: int, *,
              out_step: int = OUT_STEPS[1], slab: int = SLAB) -> jax.Array:
    """Standalone coverage predicate: would :func:`compact3` (or
    :func:`compact_ids`) at these parameters cover every match of
    ``cnt > 0``? Exactly the plan math the kernel entry points run —
    O(n/1024), no Pallas launch — so drivers can pick the kernel-vs-sort
    compaction path without paying a discarded full materialize
    (ADVICE r3 #1)."""
    n = cnt.shape[0]
    n_pad = max(round_up(n, ALIGN), slab)
    mi = jnp.pad((cnt > 0).astype(jnp.int32), (0, n_pad - n))
    _, _, _, fits = _plan(mi, k_cap, out_step, slab)
    return fits


def _kernel(r0row_ref, base_ref, lim_ref,
            a_hbm, b_hbm, c_hbm, a_out, b_out, c_out,
            a_buf, b_buf, c_buf, sems, *, out_step: int, slab: int,
            interpret: bool):
    j = pl.program_id(0)
    r0row = pl.multiple_of(r0row_ref[j], ALIGN // LANES)
    base = base_ref[j]
    nonzero = lim_ref[0]
    start = j * out_step
    sr = slab // LANES

    copies = (
        pltpu.make_async_copy(a_hbm.at[pl.ds(r0row, sr)], a_buf,
                              sems.at[0]),
        pltpu.make_async_copy(b_hbm.at[pl.ds(r0row, sr)], b_buf,
                              sems.at[1]),
        pltpu.make_async_copy(c_hbm.at[pl.ds(r0row, sr)], c_buf,
                              sems.at[2]),
    )
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    roll = jnp.roll if interpret else pltpu.roll
    a, b, c = a_buf[...], b_buf[...], c_buf[...]
    flat = (jax.lax.broadcasted_iota(jnp.int32, (sr, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (sr, LANES), 1))

    f = (b > 0).astype(jnp.int32)
    rank = _rank_excl(f, roll)
    dest = rank - (start - base)          # position within this step
    keep = jnp.logical_and(
        f > 0, jnp.logical_and(dest >= 0, dest < out_step))
    v = keep.astype(jnp.int32)
    s = flat - dest                       # left shift, >= 0 and
                                          # non-decreasing over kept rows

    k, bit = 1, 0
    while k < slab:
        inc_v = _flat_shl(v, k, roll)     # fill 0: no phantom arrivals
        inc_s = _flat_shl(s, k, roll)
        take = jnp.logical_and(inc_v > 0, ((inc_s >> bit) & 1) > 0)
        moved_out = ((s >> bit) & 1) > 0
        a = jnp.where(take, _flat_shl(a, k, roll), a)
        b = jnp.where(take, _flat_shl(b, k, roll), b)
        c = jnp.where(take, _flat_shl(c, k, roll), c)
        s = jnp.where(take, inc_s - k, s)
        v = jnp.where(take, 1, jnp.where(moved_out, 0, v))
        k *= 2
        bit += 1

    orows = out_step // LANES
    oflat = flat[:orows]
    filled = jnp.logical_and(v[:orows] > 0, start + oflat < nonzero)
    a_out[...] = jnp.where(filled, a[:orows], 0)
    b_out[...] = jnp.where(filled, b[:orows], 0)
    c_out[...] = jnp.where(filled, c[:orows], 0)


@functools.partial(jax.jit,
                   static_argnames=("k_cap", "out_step", "slab",
                                    "interpret"))
def compact3(
    lo: jax.Array,    # [n] payload (non-decreasing on matched rows)
    cnt: jax.Array,   # [n] match counts; rows with cnt > 0 are kept
    sid: jax.Array,   # [n] payload (arbitrary)
    k_cap: int,
    *,
    out_step: int = OUT_STEPS[1],
    slab: int = SLAB,
    interpret: bool | None = None,
):
    """(lo_c, cnt_c, sid_c, fits): the rows with cnt > 0, in order, at
    static width k_cap (tail zero-padded — same contract as the sort
    path, no sentinel ever reaches a DMA offset). ``fits`` is a device
    bool; when False some step's input span exceeded the slab and the
    caller must fall back to the sort-based compaction."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert slab % ALIGN == 0 and out_step % ALIGN == 0
    assert slab >= out_step + 2 * ALIGN
    n = lo.shape[0]
    n_pad = max(round_up(n, ALIGN), slab)
    npad = n_pad - n
    lop = jnp.pad(lo, (0, npad))
    cntp = jnp.pad(cnt, (0, npad))        # pad rows: cnt 0 -> dropped
    sidp = jnp.pad(sid, (0, npad))

    r0, base, nonzero, fits = _plan(
        (cntp > 0).astype(jnp.int32), k_cap, out_step, slab)
    k_out = round_up(k_cap, out_step)
    num_steps = k_out // out_step
    lim = jnp.stack([nonzero])
    sr = slab // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((out_step // LANES, LANES), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_step // LANES, LANES), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_step // LANES, LANES), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((sr, LANES), jnp.int32),
            pltpu.VMEM((sr, LANES), jnp.int32),
            pltpu.VMEM((sr, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    a2, b2, c2 = pl.pallas_call(
        functools.partial(_kernel, out_step=out_step, slab=slab,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_out // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((k_out // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((k_out // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(r0 // LANES, base, lim,
      lop.reshape(n_pad // LANES, LANES),
      cntp.reshape(n_pad // LANES, LANES),
      sidp.reshape(n_pad // LANES, LANES))
    return (a2.reshape(k_out)[:k_cap], b2.reshape(k_out)[:k_cap],
            c2.reshape(k_out)[:k_cap], fits)


def _kernel_ids(r0row_ref, base_ref, lim_ref, m_hbm, out_ref,
                m_buf, sems, *, out_step: int, slab: int, interpret: bool):
    """Row-ID compaction: like _kernel but with NO payload slabs at all —
    the compacted value IS the original row index, carried through the
    staged shifts as each element's initial flat slab position (the
    residual shift itself ends at 0, so it cannot reconstruct the id).
    Only (s, v, orig) ride the shifts and only the mask slab is DMA'd."""
    j = pl.program_id(0)
    r0row = pl.multiple_of(r0row_ref[j], ALIGN // LANES)
    base = base_ref[j]
    nonzero = lim_ref[0]
    start = j * out_step
    sr = slab // LANES

    cp = pltpu.make_async_copy(m_hbm.at[pl.ds(r0row, sr)], m_buf,
                               sems.at[0])
    cp.start()
    cp.wait()

    roll = jnp.roll if interpret else pltpu.roll
    flat = (jax.lax.broadcasted_iota(jnp.int32, (sr, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (sr, LANES), 1))
    f = (m_buf[...] > 0).astype(jnp.int32)
    rank = _rank_excl(f, roll)
    dest = rank - (start - base)
    keep = jnp.logical_and(
        f > 0, jnp.logical_and(dest >= 0, dest < out_step))
    v = keep.astype(jnp.int32)
    s = flat - dest
    orig = flat

    k, bit = 1, 0
    while k < slab:
        inc_v = _flat_shl(v, k, roll)
        inc_s = _flat_shl(s, k, roll)
        take = jnp.logical_and(inc_v > 0, ((inc_s >> bit) & 1) > 0)
        moved_out = ((s >> bit) & 1) > 0
        orig = jnp.where(take, _flat_shl(orig, k, roll), orig)
        s = jnp.where(take, inc_s - k, s)
        v = jnp.where(take, 1, jnp.where(moved_out, 0, v))
        k *= 2
        bit += 1

    orows = out_step // LANES
    oflat = flat[:orows]
    filled = jnp.logical_and(v[:orows] > 0, start + oflat < nonzero)
    out_ref[...] = jnp.where(filled, r0row * LANES + orig[:orows], -1)


@functools.partial(jax.jit,
                   static_argnames=("k_cap", "out_step", "slab",
                                    "interpret"))
def compact_ids(
    mask: jax.Array,   # [n] 0/1 (i32 or bool): rows to keep
    k_cap: int,
    *,
    out_step: int = OUT_STEPS[1],
    slab: int = SLAB,
    interpret: bool | None = None,
):
    """(ids, total, fits): ascending row indices of the set mask bits, at
    static width k_cap (tail = -1) — stream compaction of the identity
    payload, the ops.filter workload. Same plan/fit contract as
    :func:`compact3` but the kernel DMAs ONE mask slab and shifts two
    arrays instead of five: the landed shift value reconstructs the id."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert slab % ALIGN == 0 and out_step % ALIGN == 0
    assert slab >= out_step + 2 * ALIGN
    n = mask.shape[0]
    n_pad = max(round_up(n, ALIGN), slab)
    mi = jnp.pad(mask.astype(jnp.int32), (0, n_pad - n))

    r0, base, nonzero, fits = _plan(mi, k_cap, out_step, slab)
    k_out = round_up(k_cap, out_step)
    num_steps = k_out // out_step

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((out_step // LANES, LANES), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab // LANES, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    (ids2,) = pl.pallas_call(
        functools.partial(_kernel_ids, out_step=out_step, slab=slab,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_out // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(r0 // LANES, base, jnp.stack([nonzero]),
      mi.reshape(n_pad // LANES, LANES))
    return ids2.reshape(k_out)[:k_cap], nonzero, fits


def _kernel_cols(ncols: int, out_step: int, slab: int, interpret: bool):
    """Variadic-column compaction kernel body: one mask slab drives the
    ranks, ``ncols`` payload slabs ride the staged shifts (the compact3
    machinery generalized for the aggregate value path, VERDICT r4 #6 —
    five O(G) boundary gathers at the ~73M idx/s element-gather floor
    become one kernel pass)."""

    def kernel(r0row_ref, base_ref, lim_ref, *refs):
        m_hbm = refs[0]
        cols_hbm = refs[1:1 + ncols]
        outs = refs[1 + ncols:1 + 2 * ncols]
        m_buf = refs[1 + 2 * ncols]
        bufs = refs[2 + 2 * ncols:2 + 3 * ncols]
        sems = refs[-1]
        j = pl.program_id(0)
        r0row = pl.multiple_of(r0row_ref[j], ALIGN // LANES)
        base = base_ref[j]
        nonzero = lim_ref[0]
        start = j * out_step
        sr = slab // LANES

        copies = [pltpu.make_async_copy(m_hbm.at[pl.ds(r0row, sr)], m_buf,
                                        sems.at[0])]
        copies += [
            pltpu.make_async_copy(h.at[pl.ds(r0row, sr)], b, sems.at[c + 1])
            for c, (h, b) in enumerate(zip(cols_hbm, bufs))
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        roll = jnp.roll if interpret else pltpu.roll
        cols = [b[...] for b in bufs]
        flat = (jax.lax.broadcasted_iota(jnp.int32, (sr, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (sr, LANES), 1))
        f = (m_buf[...] > 0).astype(jnp.int32)
        rank = _rank_excl(f, roll)
        dest = rank - (start - base)
        keep = jnp.logical_and(
            f > 0, jnp.logical_and(dest >= 0, dest < out_step))
        v = keep.astype(jnp.int32)
        s = flat - dest

        k, bit = 1, 0
        while k < slab:
            inc_v = _flat_shl(v, k, roll)
            inc_s = _flat_shl(s, k, roll)
            take = jnp.logical_and(inc_v > 0, ((inc_s >> bit) & 1) > 0)
            moved_out = ((s >> bit) & 1) > 0
            cols = [jnp.where(take, _flat_shl(c, k, roll), c)
                    for c in cols]
            s = jnp.where(take, inc_s - k, s)
            v = jnp.where(take, 1, jnp.where(moved_out, 0, v))
            k *= 2
            bit += 1

        orows = out_step // LANES
        filled = jnp.logical_and(v[:orows] > 0,
                                 start + flat[:orows] < nonzero)
        for o, c in zip(outs, cols):
            o[...] = jnp.where(filled, c[:orows], 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k_cap", "out_step", "slab",
                                    "interpret"))
def compact_cols(
    mask: jax.Array,          # [n] rows with mask > 0 are kept
    cols: tuple,              # tuple of [n] i32 payload columns
    k_cap: int,
    *,
    out_step: int = OUT_STEPS[1],
    slab: int = SLAB,
    interpret: bool | None = None,
):
    """(compacted_cols, nonzero, fits): every payload column compacted to
    the rows with mask > 0, in order, at static width k_cap (tail
    zero-padded). Same plan/fit contract as :func:`compact3` (which is
    the ncols=3 special case with the count column doubling as mask)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert slab % ALIGN == 0 and out_step % ALIGN == 0
    assert slab >= out_step + 2 * ALIGN
    ncols = len(cols)
    n = mask.shape[0]
    n_pad = max(round_up(n, ALIGN), slab)
    npad = n_pad - n
    mi = jnp.pad(mask.astype(jnp.int32), (0, npad))
    colsp = [jnp.pad(c, (0, npad)) for c in cols]

    r0, base, nonzero, fits = _plan(mi, k_cap, out_step, slab)
    k_out = round_up(k_cap, out_step)
    num_steps = k_out // out_step
    sr = slab // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * (1 + ncols),
        out_specs=[
            pl.BlockSpec((out_step // LANES, LANES), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM)
        ] * ncols,
        scratch_shapes=[pltpu.VMEM((sr, LANES), jnp.int32)] * (1 + ncols)
        + [pltpu.SemaphoreType.DMA((1 + ncols,))],
    )
    outs = pl.pallas_call(
        _kernel_cols(ncols, out_step, slab, interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_out // LANES, LANES), jnp.int32)
        ] * ncols,
        interpret=interpret,
    )(r0 // LANES, base, jnp.stack([nonzero]),
      mi.reshape(n_pad // LANES, LANES),
      *[c.reshape(n_pad // LANES, LANES) for c in colsp])
    return (tuple(o.reshape(k_out)[:k_cap] for o in outs), nonzero, fits)


MAX_SLAB = 131072     # the staged-shift loop keeps ~16 live slab-sized
                      # i32 temporaries in VMEM: 131072 rows x 4 B x ~16
                      # ~= 8 MB fits the 16 MB scoped limit; 227k rows
                      # measured-OOMs it (exp/compact_hisel.py)


def pick_out_config(n: int, nonzero: int,
                    *, max_slab: int = MAX_SLAB) -> tuple[int, int] | None:
    """(out_step, slab) minimizing the kernel's wasted work across the
    selectivity range. The fixed-slab :func:`pick_out_step` is tuned for
    ~10% selectivity; at high selectivity (e.g. a 50% filter pushdown)
    its 65536-row slab covers a ~16k-row span, so every step re-reads and
    re-shifts 4x the useful data. Here the slab is sized to the covering
    span of the largest affordable out_step instead: per-element work ~
    (slab/out)*log2(slab) with slab/out >= COVER_SLACK/sel, so the waste
    factor stays ~COVER_SLACK at every selectivity (measured design table:
    exp/compact_hisel.py / docs/ROOFLINE.md). Returns None when no config
    covers (extremely low selectivity — the caller keeps the sort)."""
    if nonzero <= 0:
        return None
    sel = nonzero / n
    for out in (16384, 8192, 4096, 2048, 1024):
        need = int(out * COVER_SLACK / sel) + 3 * ALIGN
        slab = round_up(max(need, out + 2 * ALIGN), ALIGN)
        if slab <= max_slab:
            return out, slab
    return None


def pick_out_step(n: int, nonzero: int, *, slab: int = SLAB) -> int | None:
    """Largest OUT whose mean covering span fits the slab with
    COVER_SLACK headroom, or None when even the smallest doesn't (the
    caller then keeps the sort path). Host-side: the driver knows n and
    nonzero as ints after the count phase."""
    if nonzero <= 0:
        return None
    sel = nonzero / n
    for out in OUT_STEPS:
        if out * COVER_SLACK / sel + 3 * ALIGN <= slab:
            return out
    return None
