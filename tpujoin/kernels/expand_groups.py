"""Pallas group-periodic expansion: pair materialization at group rate.

Successor to :mod:`tpujoin.kernels.expand_runs` for high-duplication
workloads. Both materialize the (build_rowID, probe_rowID) pair columns
straight from the factorized join result (the TPU re-design of the
reference's probe kernel's per-thread result writes, reference
join_v1.mlir:483-514) — but this kernel exploits one more level of
structure that cuts the per-output VPU work by the probe-side duplication
factor:

  In sorted-probe order, all probe rows sharing a key form a GROUP, and
  every run in the group is the SAME contiguous slice of ``sorted_ids``
  (equal keys share a build range). So a group's output block — np * nb
  consecutive result slots — is that nb-long slice tiled np times, i.e. a
  PERIODIC sequence with period nb. The reference's config-1 benchmark
  (10Mx10M, keys 1..100k) has ~100k groups of ~10k output slots each,
  versus ~10M runs.

Performance model (measured on this toolchain, exp/probe_opcost.py):
vector compare/select ops with scalar operands pipeline at ~1-8 ns, while
``pltpu.roll`` costs ~80-100 ns and dynamic-trip ``fori_loop`` iterations
serialize. The kernel is therefore built from STATIC unrolled loops with
``pl.when`` guards, and hoists all rotation work to once-per-step:

  phase A (per grid step, per active group, nb <= TILE):
      build a 2*TILE periodic image PERBUF[v] = src[glo + (psi+v) mod nb]
      once: two flat-window extractions from the source slab + up to 11
      guarded doubling rolls (shift nb<<d keeps every lane on its residue
      class mod nb).
  phase B (per output tile, per covering group): one composite flat
      window (lane-roll + two sublane-rolls + select, ~4 single-vreg ops)
      re-phases PERBUF onto the tile; groups with nb > TILE skip PERBUF
      and take two windows straight from the source slab.
  probe column: constant within each run — W statically-unrolled
      mask-selects per tile from a scalar run cursor that advances by
      counting run ends (no dynamic-trip loops, no vector rank searches).

All data stays in (rows, 128) layout (full vregs); flat windows/rolls are
composed from per-axis ``pltpu.roll`` (dynamic vector gather and
dynamic-start VMEM loads don't lower on this toolchain — see CLAUDE.md).
Run/group metadata is DMA'd HBM->SMEM; slab DMA offsets are 1024-element
(8-row) aligned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpujoin.utils.shapes import round_up

LANES = 128
TROWS = 8            # rows per output sub-tile
TILE = TROWS * LANES  # 1024 output slots per sub-tile
BATCH = 16           # sub-tiles per grid step (sized so the three per-step
                     # scalar-prefetch arrays fit 1 MB SMEM at 1B outputs)
STEP = TILE * BATCH  # 16384 output slots per grid step
W = 32               # statically-unrolled runs per sub-tile (probe column)
                     # — sized for config 1's smallest groups: nb ~
                     # Poisson(100) over 100k keys bottoms out near 55,
                     # i.e. ~20 runs can land in one 1024-slot tile
GW = 16              # statically-tracked groups per grid step
# BATCH/W/GW are defaults; all three are static parameters of
# expand_groups so tests can instantiate a much smaller unroll envelope
# (the interpret-mode graph scales with gw*13 + batch*(w + gw*6); the
# default profile costs ~100 s of XLA CPU compile per shape)
PROWS = 2 * TROWS    # periodic-image rows (2*TILE elements)
PSIZE = PROWS * LANES
META = 2048          # run-metadata slab (SMEM) per step
GMETA = 2048         # group-metadata slab (SMEM) per step
SRC_SLABS = (4096, 16384)  # source slab escalation
ALIGN = 1024         # HBM i32 DMA offset/size granule


def _canon(x, n):
    """Canonicalize x into [0, n) for arbitrary (dynamic) n."""
    return jax.lax.rem(jax.lax.rem(x, n) + n, n)


def _flat_roll(x2d, k, roll):
    """out.flat[f] = x2d.flat[(f - k) mod size]; k must be in [0, size).
    x2d's row count must be a power of two (all shifts stay non-negative
    and in-range — pltpu.roll rejects negative shifts)."""
    rows = x2d.shape[0]
    q = k >> 7
    r = k & (LANES - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    y = roll(x2d, r, 1)
    z1 = roll(y, q, 0)
    z2 = roll(y, (q + 1) & (rows - 1), 0)
    return jnp.where(lane < r, z2, z1)


def _flat_window(x2d, k, rows_out, roll):
    """out (rows_out, 128) with out.flat[f] = x2d.flat[(k + f) mod size].

    k may be any int32 (canonicalized here). x2d's row count must be a
    power of two, with rows_out + 8 <= rows or rows_out + 8 >= 2 * rows
    (so the carry slice stays in range).
    """
    rows = x2d.shape[0]
    k = _canon(k, rows * LANES)
    q = k >> 7
    r = k & (LANES - 1)
    # a[s] = x2d[(s + q) mod rows]; non-negative shift form of roll(-q)
    a = roll(x2d, (rows - q) & (rows - 1), 0)
    take = min(rows, rows_out + 8)
    b = a[:take]
    # c[s, l] = b[s, (l + r) mod 128]
    c = roll(b, (LANES - r) & (LANES - 1), 1)
    d = roll(c, take - 1, 0)    # d[s] = c[(s + 1) mod take]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows_out, LANES), 1)
    return jnp.where(lane < LANES - r, c[:rows_out], d[:rows_out])


def _kernel(mb_ref, gb_ref, sbrow_ref, lim_ref,
            roff_hbm, rsid_hbm, goff_hbm, glo_hbm, gnb_hbm, src_hbm,
            r_ref, s_ref,
            roff_s, rsid_s, roff_v, goff_s, glo_s, gnb_s, goff_v,
            src_v, perbuf, sems,
            *, src_slab: int, batch: int, w: int, gw: int,
            interpret: bool):
    SRC = src_slab
    SROWS = SRC // LANES
    STEP = TILE * batch
    W = w
    GW = gw
    BATCH = batch
    i = pl.program_id(0)
    mb = pl.multiple_of(mb_ref[i], ALIGN)
    gb = pl.multiple_of(gb_ref[i], ALIGN)
    sbrow = pl.multiple_of(sbrow_ref[i], TROWS)
    sb = sbrow * LANES
    nruns = lim_ref[0]
    ngroups = lim_ref[1]
    total = lim_ref[2]
    tstep0 = i * STEP

    copies = (
        pltpu.make_async_copy(roff_hbm.at[pl.ds(mb, META)], roff_s,
                              sems.at[0]),
        pltpu.make_async_copy(rsid_hbm.at[pl.ds(mb, META)], rsid_s,
                              sems.at[1]),
        pltpu.make_async_copy(roff_hbm.at[pl.ds(mb, META)], roff_v,
                              sems.at[2]),
        pltpu.make_async_copy(goff_hbm.at[pl.ds(gb, GMETA)], goff_s,
                              sems.at[3]),
        pltpu.make_async_copy(glo_hbm.at[pl.ds(gb, GMETA)], glo_s,
                              sems.at[4]),
        pltpu.make_async_copy(gnb_hbm.at[pl.ds(gb, GMETA)], gnb_s,
                              sems.at[5]),
        pltpu.make_async_copy(goff_hbm.at[pl.ds(gb, GMETA)], goff_v,
                              sems.at[6]),
        pltpu.make_async_copy(src_hbm.at[pl.ds(sbrow, SROWS)], src_v,
                              sems.at[7]),
    )
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    roll = jnp.roll if interpret else pltpu.roll
    slab = src_v[...]
    roffs2d = roff_v[:].reshape(1, META)
    goffs2d = goff_v[:].reshape(1, GMETA)
    rmax = jnp.minimum(nruns - 1 - mb, META - 1)
    gmax = jnp.minimum(ngroups - 1 - gb, GMETA - 1)

    # per-step carry-in ranks (slab-relative); per-tile refinement is done
    # by the scalar cursor (runs) / the pl.when coverage guards (groups)
    r0 = jnp.sum((roffs2d <= tstep0).astype(jnp.int32)) - 1
    r0 = jnp.clip(r0, 0, rmax)
    g0 = jnp.sum((goffs2d <= tstep0).astype(jnp.int32)) - 1
    g0 = jnp.clip(g0, 0, gmax)

    lane8 = jax.lax.broadcasted_iota(jnp.int32, (TROWS, LANES), 1)
    flat8 = (jax.lax.broadcasted_iota(jnp.int32, (TROWS, LANES), 0) * LANES
             + lane8)
    flatP = (jax.lax.broadcasted_iota(jnp.int32, (PROWS, LANES), 0) * LANES
             + jax.lax.broadcasted_iota(jnp.int32, (PROWS, LANES), 1))

    def rd(ref, idx, limit):
        # clamp SMEM reads on BOTH bounds so !fits and empty (total==0)
        # configurations — whose outputs are discarded — still never read
        # out of the scratch window (r0/g0 clip to -1 when nruns==0)
        return ref[jnp.clip(idx, 0, limit - 1)]

    # ---- phase A: periodic image per active group (nb <= TILE only) ----
    for dd in range(GW):
        go = rd(goff_s, g0 + dd, GMETA)
        nb = rd(gnb_s, g0 + dd, GMETA)
        gl = rd(glo_s, g0 + dd, GMETA)
        active = jnp.logical_or(dd == 0, go < tstep0 + STEP)

        @pl.when(jnp.logical_and(active, nb <= TILE))
        def _build(go=go, nb=nb, gl=gl, dd=dd):
            psi = _canon(tstep0 - go, nb)
            w1 = _flat_window(slab, gl + psi - sb, PROWS, roll)
            w2 = _flat_window(slab, gl + psi - nb - sb, PROWS, roll)
            perbuf[dd * PROWS:(dd + 1) * PROWS] = jnp.where(
                flatP < nb - psi, w1, w2)
            for d2 in range(11):
                k = nb << d2

                @pl.when(k < PSIZE)
                def _double(k=k, dd=dd):
                    buf = perbuf[dd * PROWS:(dd + 1) * PROWS]
                    perbuf[dd * PROWS:(dd + 1) * PROWS] = jnp.where(
                        flatP < k, buf, _flat_roll(buf, k, roll))

    # ---- per sub-tile: probe column + build column + validity mask ----
    cur = r0
    for j in range(BATCH):
        t0 = tstep0 + j * TILE
        rows = slice(j * TROWS, (j + 1) * TROWS)

        # probe column: W unrolled mask-selects from the run cursor (the
        # first run covers the tile start, so lane 0 is always written)
        acc_s = jnp.zeros((TROWS, LANES), jnp.int32)
        ends = jnp.int32(0)
        for d in range(W):
            off_d = rd(roff_s, cur + d, META)
            acc_s = jnp.where(flat8 >= off_d - t0,
                              rd(rsid_s, cur + d, META), acc_s)
            ends = ends + (off_d <= t0 + TILE).astype(jnp.int32)
        cur = cur + ends - 1

        # build column: one window per covering group, ascending overwrite
        for dd in range(GW):
            go = rd(goff_s, g0 + dd, GMETA)
            nb = rd(gnb_s, g0 + dd, GMETA)
            gl = rd(glo_s, g0 + dd, GMETA)
            go_next = (rd(goff_s, g0 + dd + 1, GMETA) if dd + 1 < GW
                       else jnp.int32(0x7FFFFFFF))
            covers = jnp.logical_and(go <= t0 + TILE - 1, go_next > t0)
            mask = flat8 >= go - t0

            @pl.when(jnp.logical_and(covers, nb <= TILE))
            def _small(nb=nb, dd=dd, mask=mask, rows=rows, j=j):
                v0 = _canon(jnp.int32(j) * TILE, nb)
                buf = perbuf[dd * PROWS:(dd + 1) * PROWS]
                ext = _flat_window(buf, v0, TROWS, roll)
                r_ref[rows] = jnp.where(mask, ext, r_ref[rows])

            @pl.when(jnp.logical_and(covers, nb > TILE))
            def _big(go=go, nb=nb, gl=gl, mask=mask, rows=rows, t0=t0):
                c0 = _canon(t0 - go, nb)
                w1 = _flat_window(slab, gl + c0 - sb, TROWS, roll)
                w2 = _flat_window(slab, gl + c0 - nb - sb, TROWS, roll)
                ext = jnp.where(flat8 < nb - c0, w1, w2)
                r_ref[rows] = jnp.where(mask, ext, r_ref[rows])

        valid = (t0 + flat8) < total
        r_ref[rows] = jnp.where(valid, r_ref[rows], -1)
        s_ref[rows] = jnp.where(valid, acc_s, -1)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "src_slab", "batch", "w",
                                    "gw", "interpret"))
def expand_groups(
    roff: jax.Array,     # [K] run output offsets (exclusive cumsum of
                         #     counts; strictly increasing on the first
                         #     `nruns` rows, == total after)
    rsid: jax.Array,     # [K] per-run probe ids
    goff: jax.Array,     # [G] group output offsets (strictly increasing on
                         #     the first `ngroups` rows, INT32_MAX after)
    glo: jax.Array,      # [G] group build-slice starts into src (strictly
                         #     increasing, non-overlapping on real groups)
    gnb: jax.Array,      # [G] group build-slice lengths (>= 1 on real rows)
    src: jax.Array,      # [n] sorted build ids (values copied verbatim)
    nruns: jax.Array,    # scalar: number of real runs
    ngroups: jax.Array,  # scalar: number of real groups
    total: jax.Array,    # scalar: exact number of result pairs
    capacity: int,
    *,
    src_slab: int = SRC_SLABS[0],
    batch: int = BATCH,
    w: int = W,
    gw: int = GW,
    interpret: bool | None = None,
):
    """(r_vals, s_ids, fits): for each output slot t in t's group g,
    (src[glo_g + (t - goff_g) mod gnb_g], sid of t's run), with slots
    >= total set to -1.

    ``fits`` is a device bool: True iff every grid step's runs fit META
    with at most W-1 runs starting per output tile, its groups fit GMETA
    with at most GW-1 group heads per step, and its source window fits
    SRC. When False the outputs are garbage and the caller must use a
    fallback path — the kernel itself never reads out of bounds either
    way (DMA bases are clamped; rotations wrap in-register).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    SRC = src_slab
    STEP = TILE * batch
    BATCH, W, GW = batch, w, gw
    k = roff.shape[0]
    g = goff.shape[0]
    n = src.shape[0]
    cap = round_up(capacity, STEP)
    num_steps = cap // STEP

    k_pad = max(round_up(max(k, 1), ALIGN), META)
    g_pad = max(round_up(max(g, 1), ALIGN), GMETA)
    n_pad = max(round_up(max(n, 1), ALIGN), SRC)
    big = jnp.int32(0x7FFFFFFF)
    roffp = jnp.full((k_pad,), big).at[:k].set(roff)
    rsidp = jnp.zeros((k_pad,), jnp.int32).at[:k].set(rsid)
    goffp = jnp.full((g_pad,), big).at[:g].set(goff)
    glop = jnp.zeros((g_pad,), jnp.int32).at[:g].set(glo)
    gnbp = jnp.ones((g_pad,), jnp.int32).at[:g].set(jnp.maximum(gnb, 1))
    srcp = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(src)
    src2d = srcp.reshape(n_pad // LANES, LANES)

    # ---- host-side (still jitted) plan ----
    t0s = jnp.arange(num_steps, dtype=jnp.int32) * STEP
    rlast = jnp.maximum(nruns - 1, 0).astype(jnp.int32)
    glast = jnp.maximum(ngroups - 1, 0).astype(jnp.int32)
    r0s = jnp.searchsorted(roffp, t0s, side="right",
                           method="scan_unrolled").astype(jnp.int32) - 1
    r0s = jnp.clip(r0s, 0, rlast)
    meta_base = jnp.clip((r0s // ALIGN) * ALIGN, 0, k_pad - META)
    # the in-kernel cursor advances at most BATCH*(W-1) past r0 and reads
    # a W-1 window beyond it (both covered by the BATCH*W term below),
    # and alignment costs < ALIGN:
    meta_fit = jnp.all(r0s - meta_base + BATCH * W < META)

    g0s = jnp.searchsorted(goffp, t0s, side="right",
                           method="scan_unrolled").astype(jnp.int32) - 1
    g1s = jnp.searchsorted(goffp, t0s + STEP, side="left",
                           method="scan_unrolled").astype(jnp.int32) - 1
    g0s = jnp.clip(g0s, 0, glast)
    g1s = jnp.clip(g1s, g0s, glast)
    gmeta_base = jnp.clip((g0s // ALIGN) * ALIGN, 0, g_pad - GMETA)
    gmeta_fit = jnp.all(
        jnp.logical_and(g1s - g0s < GW, g0s - gmeta_base + GW < GMETA))

    # per-output-tile run spread must fit the W-unrolled window
    num_tiles = cap // TILE
    tt = jnp.arange(num_tiles, dtype=jnp.int32) * TILE
    rt0 = jnp.searchsorted(roffp, tt, side="right",
                           method="scan_unrolled").astype(jnp.int32) - 1
    rt1 = jnp.searchsorted(roffp, tt + TILE, side="left",
                           method="scan_unrolled").astype(jnp.int32) - 1
    rt0 = jnp.clip(rt0, 0, rlast)
    rt1 = jnp.clip(rt1, rt0, rlast)
    real_t = tt < total
    # < W - 1 (not < W): the in-kernel cursor can lag one run behind the
    # true carry-in when a run boundary lands exactly on a tile boundary,
    # so the W-window must absorb the spread plus that lag
    w_fit = jnp.all(jnp.where(real_t, rt1 - rt0 < W - 1, True))

    # source window: group slices are ascending and non-overlapping, so a
    # step reads exactly [glo[g0], glo[g1] + gnb[g1])
    smin = jnp.take(glop, g0s)
    smax = jnp.take(glop, g1s) + jnp.take(gnbp, g1s) - 1
    src_base = jnp.clip((smin // ALIGN) * ALIGN, 0, n_pad - SRC)
    real = t0s < total
    src_fit = jnp.all(jnp.where(real, smax - src_base < SRC, True))

    fits = meta_fit & gmeta_fit & w_fit & src_fit

    lim = jnp.stack([nruns.astype(jnp.int32), ngroups.astype(jnp.int32),
                     total.astype(jnp.int32)])
    sbrow = src_base // LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((STEP // LANES, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP // LANES, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((META,), jnp.int32),
            pltpu.SMEM((META,), jnp.int32),
            pltpu.VMEM((META,), jnp.int32),
            pltpu.SMEM((GMETA,), jnp.int32),
            pltpu.SMEM((GMETA,), jnp.int32),
            pltpu.SMEM((GMETA,), jnp.int32),
            pltpu.VMEM((GMETA,), jnp.int32),
            pltpu.VMEM((SRC // LANES, LANES), jnp.int32),
            pltpu.VMEM((GW * PROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )
    r2d, s2d = pl.pallas_call(
        functools.partial(_kernel, src_slab=src_slab, batch=batch, w=w,
                          gw=gw, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cap // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cap // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta_base, gmeta_base, sbrow, lim,
      roffp, rsidp, goffp, glop, gnbp, src2d)
    return (r2d.reshape(cap)[:capacity], s2d.reshape(cap)[:capacity], fits)
