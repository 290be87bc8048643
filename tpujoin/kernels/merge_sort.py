"""Pallas (key, id) merge sort: own the engine's hottest rented primitive.

Every phase of the v2 engine is built on 100M-row (key, id) sorts, and
`lax.sort` (0.42 s unstable at 100M) was the one hot primitive still
rented from XLA — ~41% of the round-4 headline (VERDICT r4 missing #1).
The reference's analogous hot structure is its build/count machinery
(reference join_v1.mlir:204-426); on TPU the sort IS that machinery.

Design — hybrid local-runs + Pallas merge passes:

  local runs   one batched ``lax.sort`` over (N/L0, L0) rows: XLA pays
               only the intra-row network, shedding the expensive
               high-stride passes (measured table: exp/sort_local_runs).
  merge pass   each pass pairs adjacent sorted runs (L -> 2L) in ONE HBM
               round trip: the host plan co-ranks every t_out-sized
               output tile into its (A-window, B-window) split by binary
               search on the run boundaries, and the kernel merges each
               tile entirely in VMEM with a bitonic merge network.

Per grid step (no dynamic VMEM gather on this toolchain — CLAUDE.md):
  1. DMA ALIGN-aligned superset slabs of the A and B windows (keys+ids).
  2. One dynamic flat roll per slab strips the [0, ALIGN) junk prefix so
     each side is an exact power-of-two buffer (the expand_fill
     _flat_roll2 idiom: 1 dynamic lane roll + 1 dynamic sublane roll +
     1 static row shift).
  3. Mask the suffix beyond the window's valid count to +INF, reverse B
     (sublane reverse + lane reverse), concat -> a bitonic 2*t_out
     buffer whose first t_out slots after merging are exactly the tile.
  4. log2(2*t_out) compare-exchange stages, all STATIC strides: lane
     rolls for strides < 128 (partners never cross a row: adding s flips
     one bit below bit 7), sublane rolls for strides >= 128. Keys and
     ids move under one shared comparison mask.

Sentinel contract: keys must be < INT32_MAX (the +INF pad). Join keys
are < 2^30; ``sort_pairs`` asserts statically where it can.

The network is unstable across equal keys (like is_stable=False
`lax.sort`, which it replaces); ties carry no information anywhere it is
used (exp/count_sort_variants.py, docs/ROOFLINE.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ALIGN = 1024          # HBM i32 DMA offset/size granule
INF = jnp.iinfo(jnp.int32).max


def _flat_roll(x2d, k, roll):
    """out.flat[f] = x2d.flat[(f - k) mod size]; traced k in [0, size).
    One dynamic lane roll + one dynamic sublane roll + one static row
    shift (expand_fill._flat_roll2, valid for any row count when
    k < size: q = k>>7 < rows so the sublane roll never wraps twice)."""
    rows = x2d.shape[0]
    q = k >> 7
    r = k & (LANES - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    y = roll(x2d, r, 1)
    z1 = roll(y, q, 0)
    z2 = jnp.concatenate([z1[rows - 1:], z1[:rows - 1]], axis=0)
    return jnp.where(lane < r, z2, z1)


def _merge_stages(k, i, roll, *, stages_from: int):
    """Bitonic merge of an already-bitonic flat (rows, LANES) buffer:
    compare-exchange (f, f+s) for f & s == 0, s = stages_from, .., 1.
    Partners at stride s differ ONLY in bit log2(s) (the low position has
    that bit clear, so adding s cannot carry): for s < 128 partners share
    a row and a pure wraparound lane roll is exact at every selected
    position; for s >= 128 partners differ only in row and a wraparound
    sublane roll is exact likewise. Keys and ids ride one mask."""
    rows = k.shape[0]
    flat = (jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1))
    s = stages_from
    while s >= 1:
        if s < LANES:
            yk = roll(k, LANES - s, 1)   # partner f+s (low positions)
            zk = roll(k, s, 1)           # partner f-s (high positions)
            yi = roll(i, LANES - s, 1)
            zi = roll(i, s, 1)
        else:
            q = s // LANES
            yk = roll(k, rows - q, 0)
            zk = roll(k, q, 0)
            yi = roll(i, rows - q, 0)
            zi = roll(i, q, 0)
        is_low = (flat & s) == 0
        cmp_a = k <= yk              # low keeps self iff self <= partner
        cmp_b = zk <= k              # high keeps self iff partner <= self
        k = jnp.where(is_low, jnp.where(cmp_a, k, yk),
                      jnp.where(cmp_b, k, zk))
        i = jnp.where(is_low, jnp.where(cmp_a, i, yi),
                      jnp.where(cmp_b, i, zi))
        s //= 2
    return k, i


def _reverse_flat(x, roll):
    """Flat reversal of a (rows, LANES) buffer: reverse rows (static
    strided slice) then reverse lanes within rows."""
    return x[::-1, ::-1]


def _kernel(ra_ref, pa_ref, va_ref, rb_ref, pb_ref, vb_ref,
            k_hbm, i_hbm, ko_ref, io_ref,
            ka_buf, ia_buf, kb_buf, ib_buf, sems,
            *, t_out: int, interpret: bool):
    j = pl.program_id(0)
    sr = (t_out + ALIGN) // LANES        # slab rows (superset window)
    tr = t_out // LANES                  # tile rows
    ra = pl.multiple_of(ra_ref[j], ALIGN // LANES)
    rb = pl.multiple_of(rb_ref[j], ALIGN // LANES)
    pa, va = pa_ref[j], va_ref[j]
    pb, vb = pb_ref[j], vb_ref[j]

    copies = (
        pltpu.make_async_copy(k_hbm.at[pl.ds(ra, sr)], ka_buf, sems.at[0]),
        pltpu.make_async_copy(i_hbm.at[pl.ds(ra, sr)], ia_buf, sems.at[1]),
        pltpu.make_async_copy(k_hbm.at[pl.ds(rb, sr)], kb_buf, sems.at[2]),
        pltpu.make_async_copy(i_hbm.at[pl.ds(rb, sr)], ib_buf, sems.at[3]),
    )
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    roll = jnp.roll if interpret else pltpu.roll
    size = sr * LANES
    flat_t = (jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 0) * LANES
              + jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1))

    def window(kbuf, ibuf, p, v):
        # strip the junk prefix (roll left by p), crop to the tile, +INF
        # beyond the valid count
        kk = _flat_roll(kbuf[...], (size - p) % size, roll)[:tr]
        ii = _flat_roll(ibuf[...], (size - p) % size, roll)[:tr]
        kk = jnp.where(flat_t < v, kk, INF)
        return kk, ii

    ka, ia = window(ka_buf, ia_buf, pa, va)
    kb, ib = window(kb_buf, ib_buf, pb, vb)

    kcat = jnp.concatenate([ka, _reverse_flat(kb, roll)], axis=0)
    icat = jnp.concatenate([ia, _reverse_flat(ib, roll)], axis=0)
    km, im = _merge_stages(kcat, icat, roll, stages_from=t_out)
    ko_ref[...] = km[:tr]
    io_ref[...] = im[:tr]


@functools.partial(jax.jit, static_argnames=("t_out",))
def _plan(keys: jax.Array, run_len: jax.Array, t_out: int):
    """Co-rank every t_out-sized output tile of the pass. run_len is a
    TRACED power of two (one compile serves every pass): binary search
    runs a fixed 31 iterations over collapsing bounds. Tie convention:
    A's equal keys merge first (too_small when B[b-1] >= A[a])."""
    n = keys.shape[0]
    num_steps = n // t_out
    c = jnp.arange(num_steps, dtype=jnp.int32) * t_out
    pair_sz = 2 * run_len
    pair0 = (c // pair_sz) * pair_sz      # A run start (global)
    cw = c - pair0                        # offset within pair
    bglob0 = pair0 + run_len

    lo = jnp.maximum(0, cw - run_len)
    hi = jnp.minimum(cw, run_len)

    def body(_, lh):
        lo, hi = lh
        a = (lo + hi) // 2
        b = cw - a
        kb = jnp.take(keys, jnp.clip(bglob0 + b - 1, 0, n - 1))
        ka = jnp.take(keys, jnp.clip(pair0 + a, 0, n - 1))
        too_small = (b > 0) & (a < run_len) & (kb >= ka)
        return jnp.where(too_small, a + 1, lo), jnp.where(too_small, hi, a)

    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    a_rel = lo
    a_start = pair0 + a_rel
    b_start = bglob0 + (cw - a_rel)

    last = (cw + t_out) == pair_sz
    nxt = jnp.concatenate([a_start[1:], jnp.zeros((1,), jnp.int32)])
    a_end = jnp.where(last, pair0 + run_len, nxt)
    va = a_end - a_start
    vb = t_out - va

    r0a = (a_start // ALIGN) * ALIGN
    r0b = (b_start // ALIGN) * ALIGN
    return (r0a // LANES, a_start - r0a, va,
            r0b // LANES, b_start - r0b, vb)


@functools.partial(jax.jit, static_argnames=("t_out", "interpret"))
def merge_pass(keys: jax.Array, ids: jax.Array, run_len: jax.Array,
               t_out: int = 1 << 16, interpret: bool | None = None):
    """One L -> 2L merge pass over [n] i32 (keys, ids) sorted in runs of
    ``run_len`` (traced power of two >= t_out/2, multiple of t_out or
    vice versa). n must be a power-of-two multiple of t_out. Returns the
    re-sorted (keys, ids)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = keys.shape[0]
    assert n % t_out == 0 and (n & (n - 1)) == 0, n
    num_steps = n // t_out
    plan = _plan(keys, run_len, t_out)

    # slab DMAs over-read up to ALIGN beyond a run's end: pad the pass
    # input so the last slab stays in bounds (the tail feeds only
    # +INF-masked positions)
    kp = jnp.pad(keys, (0, ALIGN)).reshape(-1, LANES)
    ip = jnp.pad(ids, (0, ALIGN)).reshape(-1, LANES)

    sr = (t_out + ALIGN) // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((t_out // LANES, LANES), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_out // LANES, LANES), lambda j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((sr, LANES), jnp.int32),
            pltpu.VMEM((sr, LANES), jnp.int32),
            pltpu.VMEM((sr, LANES), jnp.int32),
            pltpu.VMEM((sr, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    ko, io = pl.pallas_call(
        functools.partial(_kernel, t_out=t_out, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(*plan, kp, ip)
    return ko.reshape(n), io.reshape(n)


@functools.partial(jax.jit, static_argnames=("run_len0", "t_out",
                                             "interpret"))
def sort_pairs_pow2(keys: jax.Array, ids: jax.Array, *,
                    run_len0: int = 1 << 16, t_out: int = 1 << 16,
                    interpret: bool | None = None):
    """Full unstable (key, id) sort of power-of-two n: batched lax.sort
    local runs + log2(n/run_len0) Pallas merge passes."""
    n = keys.shape[0]
    assert (n & (n - 1)) == 0 and n >= run_len0 >= t_out // 2
    k2, i2 = jax.lax.sort(
        (keys.reshape(n // run_len0, run_len0),
         ids.reshape(n // run_len0, run_len0)),
        num_keys=1, is_stable=False)
    k, i = k2.reshape(n), i2.reshape(n)
    run = run_len0
    while run < n:
        k, i = merge_pass(k, i, jnp.int32(run), t_out=t_out,
                          interpret=interpret)
        run *= 2
    return k, i


def sort_pairs(keys: jax.Array, ids: jax.Array, *,
               run_len0: int = 1 << 16, t_out: int = 1 << 16,
               interpret: bool | None = None):
    """Unstable (key, id) sort of any n: pads to the next power of two
    with +INF keys (sorted to the tail and cropped). Keys must be
    < INT32_MAX."""
    n = keys.shape[0]
    m = 1 << max((n - 1).bit_length(), run_len0.bit_length() - 1)
    if m != n:
        keys = jnp.pad(keys, (0, m - n), constant_values=INF)
        ids = jnp.pad(ids, (0, m - n))
    k, i = sort_pairs_pow2(keys, ids, run_len0=run_len0, t_out=t_out,
                           interpret=interpret)
    return k[:n], i[:n]
