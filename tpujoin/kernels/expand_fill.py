"""Pallas fill+periodic expansion: pair materialization at step rate.

Third-generation pair-expansion kernel (after kernels.expand_runs and
kernels.expand_groups), materializing the (build_rowID, probe_rowID) pair
columns from the factorized join result — the TPU re-design of the
reference's probe kernel's per-thread result writes (reference
join_v1.mlir:483-514). Where expand_groups still paid a per-output-TILE
scalar loop (W=32 unrolled SMEM reads per 1024-slot tile — the measured
bottleneck: ~5k scalar-unit ops per 16K-slot grid step), this kernel has
NO per-run work at all:

  probe column: run starts are scattered (one XLA scatter, O(runs)) as
      markers into the output buffer itself; the kernel forward-fills
      each STEP-sized block with log2(STEP) doubling select/rolls on
      full-width (STEP/128, 128) registers, carrying the last value
      across steps in SMEM. Measured on v5e: 10.4B slots/s standalone
      (exp/probe_fill.py), i.e. the probe column of config 1's 1B pairs
      costs ~0.1 s + a 0.15 s scatter.
  build column: per covering group (equal-key probe rows share one build
      slice, so their output block is periodic with period nb), build the
      group's periodic image PHASED AT THE STEP START once — two flat
      windows from the source slab + guarded doubling rolls on
      geometrically growing static slices — then paint it over the step
      with a single ascending-overwrite select. No per-tile re-phasing.

Fit envelope (host-checked, returned as the ``fits`` flag): at most GW-1
group heads per step, all real group periods nb <= NBMAX (big-period
groups fall back to kernels.expand_groups' per-tile window path), and
each step's source window inside one SRC slab. There is NO run-density
constraint — any number of runs per step is fine, which removes
expand_groups' W-fit failure mode entirely.

All data stays in (rows, 128) layout; flat windows/rolls are composed
from per-axis ``pltpu.roll`` (no dynamic vector gather on this toolchain,
see CLAUDE.md). Group metadata is DMA'd HBM->SMEM at 1024-aligned bases.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpujoin.kernels.expand_groups import _canon, _flat_window
from tpujoin.utils.shapes import round_up

LANES = 128
STEP = 32768         # output slots per grid step (256 sublane rows);
                     # measured optimum: smaller steps raise group-image
                     # rebuild frequency only mildly but 8192 blows the
                     # 1 MB SMEM scalar-prefetch budget at 1B outputs, and
                     # 65536 doubles the per-image doubling work
GW = 24              # statically-unrolled covering groups per step
NBMAX = 2048         # largest group period the periodic image holds
SEED_ROWS = 16       # initial image rows (2048 elements >= NBMAX)
GMETA = 2048         # group-metadata slab (SMEM) per step
SRC_SLABS = (4096, 16384)   # source slab escalation
ALIGN = 1024         # HBM i32 DMA offset/size granule
BIG = np.int32(0x7FFFFFFF)


def _psize(step: int) -> int:
    # periodic image length == the step (power-of-two rows, required by
    # _flat_roll2). Coverage proof: seed valid >= nb; each executed
    # doubling (guard k = nb<<d < vneed) extends valid v -> v + k with
    # k <= v, so after the last executed doubling valid >= 2k >= vneed.
    return step


def _flat_roll2(x2d, k, roll):
    """out.flat[f] = x2d.flat[(f - k) mod size]; k in [0, size); row count
    must be a power of two. Uses ONE dynamic sublane roll — the expensive
    Mosaic primitive (measured ~3-4x the cost of a static row shift on
    this toolchain; swapping the second sublane roll for a static
    concatenate cut the doubling-dominated kernel 2.3x, exp/fill_variants)
    — plus one dynamic lane roll and one static row shift."""
    rows = x2d.shape[0]
    q = k >> 7
    r = k & (LANES - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    y = roll(x2d, r, 1)
    z1 = roll(y, q, 0)
    z2 = jnp.concatenate([z1[rows - 1:], z1[:rows - 1]], axis=0)
    return jnp.where(lane < r, z2, z1)


def _kernel(gb_ref, g0_ref, sbrow_ref, lim_ref,
            goff_hbm, glo_hbm, gnb_hbm, src_hbm, mark_ref,
            r_ref, s_ref,
            goff_s, glo_s, gnb_s, src_v, perbuf, carry, sems,
            *, src_slab: int, step: int, gw: int, interpret: bool):
    SRC = src_slab
    SROWS = SRC // LANES
    ROWS = step // LANES
    PSIZE = _psize(step)
    PROWS = PSIZE // LANES
    i = pl.program_id(0)
    gb = pl.multiple_of(gb_ref[i], ALIGN)
    g0 = g0_ref[i]
    sbrow = pl.multiple_of(sbrow_ref[i], 8)
    sb = sbrow * LANES
    total = lim_ref[0]
    tstep0 = i * step

    @pl.when(i == 0)
    def _init():
        carry[0] = -1

    copies = (
        pltpu.make_async_copy(goff_hbm.at[pl.ds(gb, GMETA)], goff_s,
                              sems.at[0]),
        pltpu.make_async_copy(glo_hbm.at[pl.ds(gb, GMETA)], glo_s,
                              sems.at[1]),
        pltpu.make_async_copy(gnb_hbm.at[pl.ds(gb, GMETA)], gnb_s,
                              sems.at[2]),
        pltpu.make_async_copy(src_hbm.at[pl.ds(sbrow, SROWS)], src_v,
                              sems.at[3]),
    )
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    roll = jnp.roll if interpret else pltpu.roll
    slab = src_v[...]
    flat = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))
    flatSeed = (jax.lax.broadcasted_iota(jnp.int32, (SEED_ROWS, LANES), 0)
                * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (SEED_ROWS, LANES), 1))

    # ---- probe column: doubling forward-fill of the scattered markers ----
    x = mark_ref[...]
    k = 1
    while k < step:
        shifted = _flat_roll2(x, k, roll)
        x = jnp.where(x >= 0, x, jnp.where(flat >= k, shifted, x))
        k *= 2
    c_in = carry[0]
    s_filled = jnp.where(x >= 0, x, c_in)
    s_ref[...] = s_filled
    carry[0] = s_ref[ROWS - 1, LANES - 1]

    def rd(ref, idx):
        # clamp both bounds: pad rows read the slab edge, never OOB SMEM
        return ref[jnp.clip(idx, 0, GMETA - 1)]

    # ---- build column: one step-phased periodic image per covering group,
    # painted by ascending overwrite ----
    grel = g0 - gb
    for dd in range(gw):
        idx = grel + dd
        go = rd(goff_s, idx)
        nb = rd(gnb_s, idx)
        gl = rd(glo_s, idx)
        go_next = rd(goff_s, idx + 1)
        covers = jnp.logical_or(dd == 0, go < tstep0 + step)

        @pl.when(covers)
        def _paint(go=go, nb=nb, gl=gl, go_next=go_next):
            # seed: image[v] = src[gl + (psi + v) mod nb] for v < 2048,
            # valid to at least 2*nb - psi >= nb
            psi = _canon(tstep0 - go, nb)
            w1 = _flat_window(slab, gl + psi - sb, SEED_ROWS, roll)
            w2 = _flat_window(slab, gl + psi - nb - sb, SEED_ROWS, roll)
            perbuf[0:SEED_ROWS] = jnp.where(flatSeed < nb - psi, w1, w2)
            # doubling rolls: shift nb<<d keeps every slot on its residue
            # class mod nb. Stop once valid covers this group's actual
            # span within the step (groups above overwrite, ascending) —
            # and the update region [k, 2k) is statically contained in
            # [0, 2*NBMAX << d), so late doublings never touch the full
            # buffer for small periods.
            vneed = jnp.minimum(go_next - tstep0, step)
            d2 = 0
            k2 = 1
            while k2 < PSIZE:
                rows_d = min(PROWS, (2 * NBMAX << d2) // LANES)
                kk = nb << d2

                @pl.when(kk < vneed)
                def _double(kk=kk, rows_d=rows_d):
                    buf = perbuf[0:rows_d]
                    fl = (jax.lax.broadcasted_iota(
                        jnp.int32, (rows_d, LANES), 0) * LANES
                        + jax.lax.broadcasted_iota(
                            jnp.int32, (rows_d, LANES), 1))
                    perbuf[0:rows_d] = jnp.where(
                        fl < kk, buf, _flat_roll2(buf, kk, roll))

                d2 += 1
                k2 *= 2
            # paint: image row v corresponds to output slot tstep0 + v
            mask = flat >= go - tstep0
            r_ref[...] = jnp.where(mask, perbuf[0:ROWS], r_ref[...])

    # ---- validity ----
    valid = (tstep0 + flat) < total
    r_ref[...] = jnp.where(valid, r_ref[...], -1)
    s_ref[...] = jnp.where(valid, s_filled, -1)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "src_slab", "step", "gw",
                                    "interpret"))
def expand_fill(
    roff: jax.Array,     # [K] run output offsets (strictly increasing on
                         #     the first `nruns` rows)
    rsid: jax.Array,     # [K] per-run probe ids
    goff: jax.Array,     # [G] group output offsets (strictly increasing on
                         #     the first `ngroups` rows, INT32_MAX after)
    glo: jax.Array,      # [G] group build-slice starts into src
    gnb: jax.Array,      # [G] group build-slice lengths (>= 1 on real rows)
    src: jax.Array,      # [n] sorted build ids (values copied verbatim)
    nruns: jax.Array,    # scalar: number of real runs
    ngroups: jax.Array,  # scalar: number of real groups
    total: jax.Array,    # scalar: exact number of result pairs
    capacity: int,
    *,
    src_slab: int = SRC_SLABS[0],
    step: int = STEP,
    gw: int = GW,
    interpret: bool | None = None,
):
    """(r_vals, s_ids, fits): for each output slot t in t's group g,
    (src[glo_g + (t - goff_g) mod gnb_g], sid of t's run), with slots
    >= total set to -1.

    ``fits`` is a device bool: True iff every grid step covers < gw
    groups, every real group period is <= NBMAX, and every step's source
    window fits one SRC slab. When False the outputs are garbage and the
    caller must fall back (kernels.expand_groups handles big periods;
    kernels.expand_runs handles group-dense layouts) — the kernel itself
    never reads out of bounds either way (SMEM reads are clamped,
    rotations wrap in-register).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # power-of-two step: _flat_roll needs power-of-two rows, and the
    # image must hold at least one seed (SEED_ROWS * LANES elements)
    assert step >= SEED_ROWS * LANES and (step & (step - 1)) == 0
    SRC = src_slab
    k = roff.shape[0]
    g = goff.shape[0]
    n = src.shape[0]
    cap = round_up(capacity, step)
    num_steps = cap // step

    g_pad = max(round_up(max(g, 1), ALIGN), GMETA)
    n_pad = max(round_up(max(n, 1), ALIGN), SRC)
    goffp = jnp.full((g_pad,), BIG).at[:g].set(goff)
    glop = jnp.zeros((g_pad,), jnp.int32).at[:g].set(glo)
    gnbp = jnp.ones((g_pad,), jnp.int32).at[:g].set(jnp.maximum(gnb, 1))
    srcp = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(src)
    src2d = srcp.reshape(n_pad // LANES, LANES)

    # ---- probe-column markers: one scatter, O(runs) ----
    row_k = jnp.arange(k, dtype=jnp.int32)
    pos = jnp.where(row_k < nruns, roff, cap)   # pad rows -> dropped
    mark = jnp.full((cap,), -1, jnp.int32).at[pos].set(rsid, mode="drop")
    mark2d = mark.reshape(cap // LANES, LANES)

    # ---- host-side (still jitted) plan + fit checks ----
    t0s = jnp.arange(num_steps, dtype=jnp.int32) * step
    glast = jnp.maximum(ngroups - 1, 0).astype(jnp.int32)
    g0s = jnp.searchsorted(goffp, t0s, side="right",
                           method="scan_unrolled").astype(jnp.int32) - 1
    g1s = jnp.searchsorted(goffp, t0s + step, side="left",
                           method="scan_unrolled").astype(jnp.int32) - 1
    g0s = jnp.clip(g0s, 0, glast)
    g1s = jnp.clip(g1s, g0s, glast)
    gmeta_base = jnp.clip((g0s // ALIGN) * ALIGN, 0, g_pad - GMETA)
    gmeta_fit = jnp.all(
        jnp.logical_and(g1s - g0s < gw, g0s - gmeta_base + gw < GMETA))

    row_g = jnp.arange(g_pad, dtype=jnp.int32)
    nb_fit = jnp.all(jnp.where(row_g < ngroups, gnbp <= NBMAX, True))

    # source window: group slices are ascending and non-overlapping, so a
    # step reads exactly [glo[g0], glo[g1] + gnb[g1])
    smin = jnp.take(glop, g0s)
    smax = jnp.take(glop, g1s) + jnp.take(gnbp, g1s) - 1
    src_base = jnp.clip((smin // ALIGN) * ALIGN, 0, n_pad - SRC)
    real = t0s < total
    src_fit = jnp.all(jnp.where(real, smax - src_base < SRC, True))

    fits = gmeta_fit & nb_fit & src_fit

    lim = jnp.stack([total.astype(jnp.int32)])
    sbrow = src_base // LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((step // LANES, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((step // LANES, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((step // LANES, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((GMETA,), jnp.int32),
            pltpu.SMEM((GMETA,), jnp.int32),
            pltpu.SMEM((GMETA,), jnp.int32),
            pltpu.VMEM((SRC // LANES, LANES), jnp.int32),
            pltpu.VMEM((_psize(step) // LANES, LANES), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    r2d, s2d = pl.pallas_call(
        functools.partial(_kernel, src_slab=src_slab, step=step, gw=gw,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cap // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cap // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(gmeta_base, g0s, sbrow, lim,
      goffp, glop, gnbp, src2d, mark2d)
    return (r2d.reshape(cap)[:capacity], s2d.reshape(cap)[:capacity], fits)
