"""Attribute expand_fill kernel time to its phases, on synthetic
config-1-shaped data (100k groups, nb=103, np=97 => ~1B pairs).

Variants (timing-only; some produce wrong outputs):
  full        - the kernel as shipped
  no_fill     - skip the probe-column doubling forward-fill
  no_groups   - skip the build-column periodic machinery
  no_double   - groups without the doubling chain (seed+paint only)
  fill_only   - only the fill (== no_groups)
Also sweeps step in {32768, 65536}.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tpujoin.kernels import expand_fill as ef
from tpujoin.kernels.expand_fill import (ALIGN, GMETA, LANES, SEED_ROWS,
                                         _canon, _flat_roll, _flat_window,
                                         _psize)
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn

NBMAX = ef.NBMAX


def ep(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel_v(gb_ref, g0_ref, sbrow_ref, lim_ref,
              goff_hbm, glo_hbm, gnb_hbm, src_hbm, mark_ref,
              r_ref, s_ref,
              goff_s, glo_s, gnb_s, src_v, perbuf, carry, sems,
              *, src_slab, step, gw, variant):
    SRC = src_slab
    SROWS = SRC // LANES
    ROWS = step // LANES
    PSIZE = _psize(step)
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

    roll = pltpu.roll

    def flat_roll2(x2d, k):
        # 2-dynamic-roll variant: z2 derived from z1 by a static row shift
        rows = x2d.shape[0]
        q = k >> 7
        r = k & (LANES - 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
        y = roll(x2d, r, 1)
        z1 = roll(y, q, 0)
        z2 = jnp.concatenate([z1[rows - 1:], z1[:rows - 1]], axis=0)
        return jnp.where(lane < r, z2, z1)

    def _row_roll_log(y, q):
        # dynamic row roll decomposed into log2(rows) static shifts
        # (hypothesis: dynamic sublane roll costs O(rows); static row
        # shifts are plain copies)
        rows = y.shape[0]
        b = 1
        while b < rows:
            sh = jnp.concatenate([y[rows - b:], y[:rows - b]], axis=0)
            y = jnp.where((q & b) != 0, sh, y)
            b *= 2
        return y

    def flat_roll3(x2d, k):
        # 1 dynamic lane roll + log-decomposed row roll
        rows = x2d.shape[0]
        q = (k >> 7) & (rows - 1)
        r = k & (LANES - 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
        y = roll(x2d, r, 1)
        z1 = _row_roll_log(y, q)
        z2 = jnp.concatenate([z1[rows - 1:], z1[:rows - 1]], axis=0)
        return jnp.where(lane < r, z2, z1)

    fr = (flat_roll2 if variant in ("roll2", "guardv2")
          else flat_roll3 if variant == "guardv3"
          else (lambda x, k: _flat_roll(x, k, roll)))
    slab = src_v[...]
    flat = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))
    flatSeed = (jax.lax.broadcasted_iota(jnp.int32, (SEED_ROWS, LANES), 0)
                * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (SEED_ROWS, LANES), 1))

    x = mark_ref[...]
    if variant != "no_fill":
        k = 1
        while k < step:
            shifted = fr(x, k)
            x = jnp.where(x >= 0, x, jnp.where(flat >= k, shifted, x))
            k *= 2
    c_in = carry[0]
    s_filled = jnp.where(x >= 0, x, c_in)
    s_ref[...] = s_filled
    carry[0] = s_ref[ROWS - 1, LANES - 1]

    def rd(ref, idx):
        return ref[jnp.clip(idx, 0, GMETA - 1)]

    if variant != "no_groups":
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
                psi = _canon(tstep0 - go, nb)
                w1 = _flat_window(slab, gl + psi - sb, SEED_ROWS, roll)
                w2 = _flat_window(slab, gl + psi - nb - sb, SEED_ROWS, roll)
                perbuf[0:SEED_ROWS] = jnp.where(flatSeed < nb - psi, w1, w2)
                if variant.startswith("guardv"):
                    # stop doubling once valid covers this group's actual
                    # span within the step (later groups overwrite above)
                    vneed = jnp.minimum(go_next - tstep0, step)
                else:
                    vneed = jnp.int32(PSIZE)
                if variant != "no_double":
                    d2 = 0
                    k2 = 1
                    while k2 < PSIZE:
                        rows_d = min(PSIZE // LANES,
                                     (2 * NBMAX << d2) // LANES)
                        kk = nb << d2

                        @pl.when(kk < vneed)
                        def _double(kk=kk, rows_d=rows_d):
                            buf = perbuf[0:rows_d]
                            fl = (jax.lax.broadcasted_iota(
                                jnp.int32, (rows_d, LANES), 0) * LANES
                                + jax.lax.broadcasted_iota(
                                    jnp.int32, (rows_d, LANES), 1))
                            perbuf[0:rows_d] = jnp.where(
                                fl < kk, buf, fr(buf, kk))

                        d2 += 1
                        k2 *= 2
                mask = flat >= go - tstep0
                r_ref[...] = jnp.where(mask, perbuf[0:ROWS], r_ref[...])

    valid = (tstep0 + flat) < total
    r_ref[...] = jnp.where(valid, r_ref[...], -1)
    s_ref[...] = jnp.where(valid, s_filled, -1)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "src_slab", "step", "gw",
                                    "variant", "ret_rows"))
def expand_fill_v(roff, rsid, goff, glo, gnb, src, nruns, ngroups, total,
                  capacity, *, src_slab=4096, step=32768, gw=24,
                  variant="full", ret_rows=None):
    SRC = src_slab
    k = roff.shape[0]
    g = goff.shape[0]
    n = src.shape[0]
    cap = round_up(capacity, step)
    num_steps = cap // step

    g_pad = max(round_up(max(g, 1), ALIGN), GMETA)
    n_pad = max(round_up(max(n, 1), ALIGN), SRC)
    BIG = jnp.int32(0x7FFFFFFF)
    goffp = jnp.full((g_pad,), BIG).at[:g].set(goff)
    glop = jnp.zeros((g_pad,), jnp.int32).at[:g].set(glo)
    gnbp = jnp.ones((g_pad,), jnp.int32).at[:g].set(jnp.maximum(gnb, 1))
    srcp = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(src)
    src2d = srcp.reshape(n_pad // LANES, LANES)

    row_k = jnp.arange(k, dtype=jnp.int32)
    pos = jnp.where(row_k < nruns, roff, cap)
    mark = jnp.full((cap,), -1, jnp.int32).at[pos].set(rsid, mode="drop")
    mark2d = mark.reshape(cap // LANES, LANES)

    t0s = jnp.arange(num_steps, dtype=jnp.int32) * step
    glast = jnp.maximum(ngroups - 1, 0).astype(jnp.int32)
    g0s = jnp.searchsorted(goffp, t0s, side="right",
                           method="scan_unrolled").astype(jnp.int32) - 1
    g1s = jnp.searchsorted(goffp, t0s + step, side="left",
                           method="scan_unrolled").astype(jnp.int32) - 1
    g0s = jnp.clip(g0s, 0, glast)
    g1s = jnp.clip(g1s, g0s, glast)
    gmeta_base = jnp.clip((g0s // ALIGN) * ALIGN, 0, g_pad - GMETA)
    smin = jnp.take(glop, g0s)
    src_base = jnp.clip((smin // ALIGN) * ALIGN, 0, n_pad - SRC)
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
        functools.partial(_kernel_v, src_slab=src_slab, step=step, gw=gw,
                          variant=variant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cap // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cap // LANES, LANES), jnp.int32),
        ],
    )(gmeta_base, g0s, sbrow, lim, goffp, glop, gnbp, src2d, mark2d)
    if ret_rows is not None:
        a, b = ret_rows
        return r2d[a:b], s2d[a:b]
    return r2d[0, 0], s2d[0, 0]


def main():
    G = 100_000
    NB = 103
    NP = 97
    nruns = G * NP
    total = G * NP * NB
    ep(f"groups {G}  runs {nruns}  total {total}")
    gnb = np.full(G, NB, np.int32)
    glo = (np.arange(G, dtype=np.int64) * NB).astype(np.int32)
    goff = (np.arange(G, dtype=np.int64) * (NB * NP)).astype(np.int32)
    counts = np.repeat(gnb, NP)
    offs = (np.cumsum(counts.astype(np.int64)) - counts).astype(np.int32)
    sid = np.arange(nruns, dtype=np.int32)
    src = np.arange(G * NB, dtype=np.int32)
    cap = round_up(total, 1 << 20)

    args = (jnp.asarray(offs), jnp.asarray(sid), jnp.asarray(goff),
            jnp.asarray(glo), jnp.asarray(gnb), jnp.asarray(src),
            jnp.int32(nruns), jnp.int32(G), jnp.int32(total))

    for step in (16384, 32768, 65536):
        for variant in ("guardv2", "guardv3"):
            try:
                st = time_fn(
                    lambda v=variant, s=step: expand_fill_v(
                        *args, cap, step=s, variant=v),
                    name=variant, rows=total)
                ep(f"step={step} {variant:10s} {st.seconds:.3f}s  "
                   f"{total / st.seconds / 1e6:.0f}M pairs/s")
            except Exception as e:  # noqa
                ep(f"step={step} {variant:10s} FAILED: {type(e).__name__} "
                   f"{str(e)[:200]}")

    # parity: guardv3 must equal full on sampled windows
    win = (3_000_000, 3_004_096)
    for step in (16384, 32768):
        rf, sf = expand_fill_v(*args, cap, step=step, variant="full",
                               ret_rows=win)
        rg, sg = expand_fill_v(*args, cap, step=step, variant="guardv3",
                               ret_rows=win)
        ok = (np.array_equal(np.asarray(rf), np.asarray(rg))
              and np.array_equal(np.asarray(sf), np.asarray(sg)))
        # and against the analytic truth on this synthetic layout
        t0 = win[0] * 128
        t = np.arange(t0, t0 + 1024, dtype=np.int64)
        g = t // (NB * NP)
        rexp = (g * NB + (t - g * NB * NP) % NB).astype(np.int32)
        sexp = (g * NP + (t - g * NB * NP) // NB).astype(np.int32)
        ok2 = (np.array_equal(np.asarray(rg).reshape(-1)[:1024], rexp)
               and np.array_equal(np.asarray(sg).reshape(-1)[:1024], sexp))
        ep(f"step={step} parity guardv3==full: {ok}  analytic: {ok2}")


if __name__ == "__main__":
    main()
