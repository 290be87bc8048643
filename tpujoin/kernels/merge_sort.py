"""Pallas (key, id) merge sort: own the engine's hottest rented primitive.

Every phase of the v2 engine is built on 100M-row (key, id) sorts, and
`lax.sort` (0.42 s unstable at 100M) was the one hot primitive still
rented from XLA — ~41% of the round-4 headline (VERDICT r4 missing #1).
The reference's analogous hot structure is its build/count machinery
(reference join_v1.mlir:204-426); on TPU the sort IS that machinery.

Design — hybrid local-runs + Pallas merge passes:

  local runs   one batched ``lax.sort`` over (N/L0, L0) rows: XLA pays
               only the intra-row network, shedding the expensive
               high-stride passes (measured: exp/sort_local_runs —
               0.27 s at L0=2^16 vs 0.48 s full, n=2^27).
  merge pass   each pass pairs adjacent sorted runs (L -> 2L) in ONE HBM
               round trip: the host plan co-ranks every t_out-sized
               output tile into its (A-window, B-window) split by binary
               search on the run boundaries, and the kernel merges each
               tile entirely in VMEM with a bitonic merge network.

ALTERNATING-ORIENTATION INVARIANT: Mosaic has no `rev` primitive (lane/
sublane reversal costs ~16 swap stages in rolls — half a merge network),
so no reversal ever happens on the device. Instead EVEN-indexed runs are
stored ascending and ODD-indexed runs descending at every level: the
concatenated (A-window ascending, B-window descending) buffer is
ALREADY bitonic, and a tile of a descending OUTPUT run is produced by
flipping every compare-exchange direction (a per-step flag) rather than
by reversing an ascending result. The single physical reversal — odd
local runs after the batched lax.sort — is one XLA `lax.rev` at the
static run length, outside the kernel. The final pass's output is run 0:
always ascending.

Per grid step (no dynamic VMEM gather on this toolchain — CLAUDE.md):
  1. DMA ALIGN-aligned superset slabs of the A and B windows (keys+ids).
  2. One dynamic flat roll per slab (1 dynamic lane roll + 1 dynamic
     sublane roll + 1 static row shift — the expand_fill idiom) places
     the valid window at its bitonic position: ascending output tiles
     put A at [0, va) and B at [T-vb, T) with +INF elsewhere; descending
     tiles mirror with -INF fill.
  3. log2(2*t_out) compare-exchange stages, all STATIC strides: lane
     rolls for strides < 128 (partners never cross a row: adding s flips
     one bit below bit 7), sublane rolls for strides >= 128. Keys and
     ids move under one shared comparison mask; the direction flag XORs
     every predicate.

Sentinel contract: keys must lie strictly inside (INT32_MIN, INT32_MAX)
(the pad fills). Join keys are in [1, 2^30); ``sort_pairs`` pads with
INT32_MAX-1 and crops.

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
IMAX = jnp.iinfo(jnp.int32).max
IMIN = jnp.iinfo(jnp.int32).min


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


def _merge_stages(k, i, desc, roll, *, stages_from: int):
    """Bitonic merge of an already-bitonic flat (rows, LANES) buffer:
    compare-exchange (f, f+s) for f & s == 0, s = stages_from, .., 1.
    ``desc`` (broadcastable bool) flips every comparison, producing a
    descending result from a valley-shaped input. Partners at stride s
    differ ONLY in bit log2(s) (the low position has that bit clear, so
    adding s cannot carry): for s < 128 partners share a row and a pure
    wraparound lane roll is exact at every selected position; for
    s >= 128 partners differ only in row likewise. Keys and ids ride one
    mask."""
    flat = (jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1))
    s = stages_from
    while s >= 1:
        k, i = _ce(k, i, desc, flat, s, roll)
        s //= 2
    return k, i


def _ce(k, i, desc, flat, s: int, roll):
    """One compare-exchange stage at static stride s: take-partner mask
    formulation (ties keep self under asc, swap equals under desc — both
    orders valid for equal keys). 14 vector ops: 4 rolls + 2 cmp + 1
    mask-select + 1 xor + 4 value-selects + the is_low mask."""
    rows = k.shape[0]
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
    # nested-select formulation: measured FASTER than the boolean-algebra
    # mask form (0.518 vs 0.553 s full sort at 2^27) — Mosaic fuses
    # per-lane selects better than i1 vector algebra, and selecting
    # BETWEEN i1 vectors doesn't lower at all ("Unsupported target
    # bitwidth for truncation")
    cmp_a = (k <= yk) != desc    # low keeps self iff self <= partner
    cmp_b = (zk <= k) != desc    # high keeps self iff partner <= self
    return (jnp.where(is_low, jnp.where(cmp_a, k, yk),
                      jnp.where(cmp_b, k, zk)),
            jnp.where(is_low, jnp.where(cmp_a, i, yi),
                      jnp.where(cmp_b, i, zi)))


def _kernel(ra_ref, pa_ref, va_ref, rb_ref, pb_ref, vb_ref, dir_ref,
            k_hbm, i_hbm, ko_ref, io_ref,
            ka0, ia0, kb0, ib0, ka1, ia1, kb1, ib1, sems,
            *, t_out: int, interpret: bool):
    j = pl.program_id(0)
    nsteps = pl.num_programs(0)
    sr = (t_out + ALIGN) // LANES        # slab rows (superset window)
    tr = t_out // LANES                  # tile rows
    pa, va = pa_ref[j], va_ref[j]
    pb, vb = pb_ref[j], vb_ref[j]
    desc = dir_ref[j] > 0

    # double-buffered input slabs: step j computes on slot j%2 while
    # step j+1's four copies stream into the other slot (two STATIC
    # buffer sets under pl.when — a dynamically indexed leading scratch
    # dim violates sublane tiling on this toolchain, CLAUDE.md)
    set0 = (ka0, ia0, kb0, ib0)
    set1 = (ka1, ia1, kb1, ib1)

    def copies(jj, bufs, base):
        ra = pl.multiple_of(ra_ref[jj], ALIGN // LANES)
        rb = pl.multiple_of(rb_ref[jj], ALIGN // LANES)
        return (
            pltpu.make_async_copy(k_hbm.at[pl.ds(ra, sr)], bufs[0],
                                  sems.at[base]),
            pltpu.make_async_copy(i_hbm.at[pl.ds(ra, sr)], bufs[1],
                                  sems.at[base + 1]),
            pltpu.make_async_copy(k_hbm.at[pl.ds(rb, sr)], bufs[2],
                                  sems.at[base + 2]),
            pltpu.make_async_copy(i_hbm.at[pl.ds(rb, sr)], bufs[3],
                                  sems.at[base + 3]),
        )

    is_even = (j % 2) == 0

    @pl.when(j == 0)
    def _():
        for cp in copies(0, set0, 0):
            cp.start()

    @pl.when((j + 1 < nsteps) & is_even)
    def _():
        for cp in copies(j + 1, set1, 4):
            cp.start()

    @pl.when((j + 1 < nsteps) & jnp.logical_not(is_even))
    def _():
        for cp in copies(j + 1, set0, 0):
            cp.start()

    @pl.when(is_even)
    def _():
        for cp in copies(j, set0, 0):
            cp.wait()

    @pl.when(jnp.logical_not(is_even))
    def _():
        for cp in copies(j, set1, 4):
            cp.wait()

    ka_v = jnp.where(is_even, ka0[...], ka1[...])
    ia_v = jnp.where(is_even, ia0[...], ia1[...])
    kb_v = jnp.where(is_even, kb0[...], kb1[...])
    ib_v = jnp.where(is_even, ib0[...], ib1[...])

    roll = jnp.roll if interpret else pltpu.roll
    size = sr * LANES
    flat_t = (jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 0) * LANES
              + jax.lax.broadcasted_iota(jnp.int32, (tr, LANES), 1))
    fill = jnp.where(desc, IMIN, IMAX)

    def window(karr, iarr, p, q, v):
        # place the valid window [p, p+v) of the slab at [q, q+v) of the
        # half-buffer; fill elsewhere (ids are don't-care there)
        k = (q - p) % size
        kk = _flat_roll(karr, k, roll)[:tr]
        ii = _flat_roll(iarr, k, roll)[:tr]
        keep = (flat_t >= q) & (flat_t < q + v)
        kk = jnp.where(keep, kk, fill)
        return kk, ii

    # ascending output: [A asc at 0, +INF | +INF, B desc at T-vb] — an
    # up-plateau-down bitonic sequence; descending output mirrors it into
    # a valley with -INF fill and flipped compares
    q_a = jnp.where(desc, t_out - va, 0)
    q_b = jnp.where(desc, 0, t_out - vb)
    ka, ia = window(ka_v, ia_v, pa, q_a, va)
    kb, ib = window(kb_v, ib_v, pb, q_b, vb)

    # stage 1 (stride t_out) as a DIRECT half-cleaner across the two
    # halves: the kept half holds all t_out valid elements (every fill
    # loses the exchange) and is itself bitonic, so the remaining stages
    # run on a HALF-SIZE buffer — the discarded half is pure fill whose
    # compare-exchanges would be no-op work (measured ~2x on the
    # network's compute)
    cmp = (ka <= kb) != desc
    kl = jnp.where(cmp, ka, kb)
    il = jnp.where(cmp, ia, ib)
    km, im = _merge_stages(kl, il, desc, roll, stages_from=t_out // 2)
    ko_ref[...] = km
    io_ref[...] = im


@functools.partial(jax.jit, static_argnames=("t_out",))
def _plan(keys: jax.Array, run_len: jax.Array, t_out: int):
    """Co-rank every t_out-sized output tile of the pass. run_len is a
    TRACED power of two (one compile serves every pass): binary search
    runs a fixed 31 iterations over collapsing bounds. A runs (even) are
    stored ascending, B runs (odd) descending: ascending rank b of B maps
    to stored position Lb-1-b. Runs may be RAGGED — n need only be a
    multiple of t_out, the trailing run of a level may be short or its
    pair's B side absent (La/Lb clip at n; a lone window is re-oriented
    by the merge network itself). Tie convention: A's equal keys merge
    first (too_small when B[b-1] >= A[a])."""
    n = keys.shape[0]
    num_steps = n // t_out
    c = jnp.arange(num_steps, dtype=jnp.int32) * t_out
    pair_sz = 2 * run_len
    pair0 = (c // pair_sz) * pair_sz      # A run start (global)
    cw = c - pair0                        # offset within pair
    bglob0 = pair0 + run_len
    la = jnp.clip(n - pair0, 0, run_len)      # A run length
    lb = jnp.clip(n - bglob0, 0, run_len)     # B run length (0: lone A)
    pair_elems = la + lb
    out_desc = ((c // pair_sz) & 1).astype(jnp.int32)
    # a DESCENDING output run holds ascending-rank (pair_elems - 1 - x)
    # at run offset x, so its tile at offset cw covers the MIRRORED rank
    # window [pair_elems - cw - t_out, pair_elems - cw)
    cw_eff = jnp.where(out_desc > 0, pair_elems - cw - t_out, cw)

    def corank(q):
        """a such that the merge of A[:a] and B_asc[:q-a] is the first q
        of the pair's ascending order (ties: A first). B is stored
        descending: ascending-rank b-1 lives at stored Lb-b."""
        lo = jnp.maximum(0, q - lb)
        hi = jnp.minimum(q, la)

        def body(_, lh):
            lo, hi = lh
            a = (lo + hi) // 2
            b = q - a
            kb = jnp.take(keys, jnp.clip(bglob0 + lb - b, 0, n - 1))
            ka = jnp.take(keys, jnp.clip(pair0 + a, 0, n - 1))
            too_small = (b > 0) & (a < la) & (kb >= ka)
            return (jnp.where(too_small, a + 1, lo),
                    jnp.where(too_small, hi, a))

        lo, _ = jax.lax.fori_loop(0, 31, body, (lo, hi))
        return lo

    a0 = corank(cw_eff)
    a1 = corank(cw_eff + t_out)
    a_start = pair0 + a0
    va = a1 - a0
    vb = t_out - va
    # B ascending ranks [b0, b1) = [cw_eff - a0, cw_eff + t_out - a1)
    # map to stored positions [Lb - b1, Lb - b0): the stored window START
    # is bglob0 + Lb - b1
    b1 = cw_eff + t_out - a1
    b_start_stored = bglob0 + lb - b1

    # clamp slab origins so the (t_out + ALIGN)-sized DMA never overruns
    # the ALIGN-padded pass input (empty windows at a run's end can start
    # at the run boundary itself); the in-kernel roll handles any
    # resulting prefix < slab and clamping keeps ALIGN-multiples
    bound = jnp.int32(n - t_out)
    r0a = jnp.clip((a_start // ALIGN) * ALIGN, 0, bound)
    r0b = jnp.clip((b_start_stored // ALIGN) * ALIGN, 0, bound)
    return (r0a // LANES, a_start - r0a, va,
            r0b // LANES, b_start_stored - r0b, vb, out_desc)


@functools.partial(jax.jit, static_argnames=("t_out", "interpret"))
def merge_pass(keys: jax.Array, ids: jax.Array, run_len: jax.Array,
               t_out: int = 1 << 16, interpret: bool | None = None):
    """One L -> 2L merge pass over [n] i32 (keys, ids) in runs of
    ``run_len`` (traced power of two >= t_out/2) stored in alternating
    asc/desc orientation; the output keeps the invariant at 2L. n must
    be a multiple of t_out; the trailing run may be ragged (see _plan)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = keys.shape[0]
    assert n % t_out == 0, n
    num_steps = n // t_out
    plan = _plan(keys, run_len, t_out)

    # slab DMAs over-read up to ALIGN beyond a run's end: pad the pass
    # input so the last slab stays in bounds (the tail feeds only
    # fill-masked positions)
    kp = jnp.pad(keys, (0, ALIGN)).reshape(-1, LANES)
    ip = jnp.pad(ids, (0, ALIGN)).reshape(-1, LANES)

    sr = (t_out + ALIGN) // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
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
        scratch_shapes=[pltpu.VMEM((sr, LANES), jnp.int32)] * 8
        + [pltpu.SemaphoreType.DMA((8,))],
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


def _local_sort_kernel(k_ref, i_ref, ko_ref, io_ref, *, tile: int,
                       interpret: bool):
    """Full bitonic SORT of one contiguous tile in VMEM (the local-runs
    phase owned end to end): log2(tile)*(log2(tile)+1)/2 compare-exchange
    stages, all static strides, directions from the classic (f & k) block
    parity XOR'd with the tile's alternating-orientation parity. No
    windows, no prefetch, no sentinels — tiles are dense and aligned, and
    Pallas pipelines the block DMAs. Replaces the batched lax.sort local
    phase (0.268 s at 2^27/L0=2^16 measured — XLA's network is ~4x off
    the VPU bound this kernel hits)."""
    j = pl.program_id(0)
    desc = (j & 1) > 0            # odd tiles descending (the invariant)
    roll = jnp.roll if interpret else pltpu.roll
    k = k_ref[...]
    i = i_ref[...]
    rows = tile // LANES
    flat = (jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1))
    kk = 2
    while kk <= tile:
        blk_desc = ((flat & kk) != 0) != desc
        # the final level has no (f & tile) bit: pure tile direction
        if kk == tile:
            blk_desc = jnp.full(k.shape, False) != desc
        s = kk // 2
        while s >= 1:
            k, i = _ce(k, i, blk_desc, flat, s, roll)
            s //= 2
        kk *= 2
    ko_ref[...] = k
    io_ref[...] = i


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def local_sort(keys: jax.Array, ids: jax.Array, tile: int = 1 << 16,
               interpret: bool | None = None):
    """Sort [n] (keys, ids) into alternating asc/desc runs of ``tile``
    elements with the in-VMEM bitonic sort kernel. n % tile == 0."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = keys.shape[0]
    assert n % tile == 0
    rows = tile // LANES
    ko, io = pl.pallas_call(
        functools.partial(_local_sort_kernel, tile=tile,
                          interpret=interpret),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda j: (j, 0)),
            pl.BlockSpec((rows, LANES), lambda j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, LANES), lambda j: (j, 0)),
            pl.BlockSpec((rows, LANES), lambda j: (j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(keys.reshape(-1, LANES), ids.reshape(-1, LANES))
    return ko.reshape(n), io.reshape(n)


@functools.partial(jax.jit, static_argnames=("run_len0",))
def _local_runs(keys: jax.Array, ids: jax.Array, run_len0: int):
    """Batched lax.sort into run_len0-sized runs, odd runs reversed once
    (in XLA) to seed the alternating orientation."""
    n = keys.shape[0]
    k2, i2 = jax.lax.sort(
        (keys.reshape(n // run_len0, run_len0),
         ids.reshape(n // run_len0, run_len0)),
        num_keys=1, is_stable=False)
    k2 = k2.at[1::2].set(jax.lax.rev(k2[1::2], dimensions=(1,)))
    i2 = i2.at[1::2].set(jax.lax.rev(i2[1::2], dimensions=(1,)))
    return k2.reshape(n), i2.reshape(n)


def _sort_padded(keys: jax.Array, ids: jax.Array, *,
                 run_len0: int, t_out: int, local: str,
                 interpret: bool | None):
    """Core pipeline on n % max(run_len0, t_out) == 0: local runs (the
    in-VMEM bitonic sort kernel, or batched lax.sort with local="xla") +
    ceil(log2(n/run_len0)) Pallas merge passes over possibly-ragged
    runs. Deliberately NOT one outer jit: every merge_pass reuses ONE
    compiled executable (run_len is traced), and a fused multi-kernel
    program exceeds the remote compiler's request size limit on this
    platform."""
    n = keys.shape[0]
    assert n % run_len0 == 0 and n % t_out == 0
    assert run_len0 >= t_out // 2
    if n == run_len0:
        return jax.lax.sort((keys, ids), num_keys=1, is_stable=False)
    if local == "pallas":
        k, i = local_sort(keys, ids, tile=run_len0, interpret=interpret)
    else:
        k, i = _local_runs(keys, ids, run_len0)
    run = run_len0
    while run < n:
        k, i = merge_pass(k, i, jnp.int32(run), t_out=t_out,
                          interpret=interpret)
        run *= 2
    return k, i


def sort_pairs_pow2(keys: jax.Array, ids: jax.Array, *,
                    run_len0: int = 1 << 16, t_out: int = 1 << 16,
                    local: str = "pallas",
                    interpret: bool | None = None):
    """Full unstable (key, id) sort of power-of-two n (see
    :func:`sort_pairs` for general n)."""
    n = keys.shape[0]
    assert (n & (n - 1)) == 0 and n >= run_len0
    return _sort_padded(keys, ids, run_len0=run_len0, t_out=t_out,
                        local=local, interpret=interpret)


def sort_pairs(keys: jax.Array, ids: jax.Array, *,
               run_len0: int = 1 << 15, t_out: int = 1 << 16,
               local: str = "pallas",
               interpret: bool | None = None):
    """Unstable (key, id) sort of any n: pads to the next MULTIPLE of
    max(run_len0, t_out) with IMAX-1 keys (sorted to the tail and
    cropped) — ragged-run support keeps the padding under one tile
    (+0.07% at 100M rows) where a power-of-two pad would cost 1.34x.
    Keys must lie strictly inside (INT32_MIN, INT32_MAX)."""
    n = keys.shape[0]
    g = max(run_len0, t_out)
    m = -(-n // g) * g
    if m != n:
        keys = jnp.pad(keys, (0, m - n), constant_values=IMAX - 1)
        ids = jnp.pad(ids, (0, m - n))
    k, i = _sort_padded(keys, ids, run_len0=run_len0, t_out=t_out,
                        local=local, interpret=interpret)
    return k[:n], i[:n]
