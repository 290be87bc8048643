"""Pallas merge-count kernel: the hot half of the probe phase.

Computes, for every *sorted* probe key, its rank (lower bound) in the
*sorted* build key array and its number of matches — the (lo, counts) pair
that drives exact-size materialization. Replaces two global
``jnp.searchsorted(method='sort')`` calls (each an O((n+m)·log) multi-array
sort, the dominant probe cost at 100M rows) with one bandwidth-bound
streaming pass.

This kernel is the TPU answer to the reference's count kernel
(reference join_v1.mlir:288-425): where the reference walks a per-key
linked-list chain (scf.while at :342-367, memory-latency-bound), this
kernel exploits sortedness — each probe tile's matches live in one
contiguous build window, so the tile DMAs that window into VMEM once and
ranks all its keys with dense vector compares. No chains, no atomics, no
data-dependent branching.

Design:
- grid over probe tiles of TILE keys; the probe block streams through VMEM
  via the standard pipeline.
- per tile, the host precomputes (window start, chunk count) into the
  padded build array — scalar-prefetched so the kernel can DMA ahead.
- the kernel loops over the window in CHUNK-sized pieces (dynamic trip
  count: skewed keys with huge duplicate runs just loop longer), double
  -buffering the build-chunk DMA against the compare work.
- rank/count accumulate as dense [TILE, CHUNK] compares on the VPU:
  lo_p = window_start + sum(B < p), cnt_p = sum(B == p). Padding keys are
  INT32_MAX on both sides, contributing nothing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpujoin.utils.shapes import cdiv, round_up

TILE = 1024        # probe keys per grid step
CHUNK = 1024       # build keys per DMA
SUB = 512          # compare-slab rows per step (caps the [SUB, TILE] temps)
PAD_KEY = np.int32(0x7FFFFFFF)


MSLAB = 1024       # per-tile metadata slab (big-m path): entries DMA'd
                   # HBM->SMEM per step instead of scalar-prefetched
SMEM_TILE_BUDGET = 65536   # above this many tiles the two scalar-prefetch
                           # arrays (4 B/tile each) would crowd the 1 MB
                           # SMEM (observed OOM at 200M rows: 2 x 764 KB)


def _body(w0, nchunks, pk_ref, b_hbm, lo_ref, cnt_ref, bbuf, sem):
    """Window scan shared by both metadata paths."""
    # probe keys along LANES: the per-chunk reduction then runs along
    # sublanes (cheap) and accumulators keep a dense (1, TILE) lane layout
    p = pk_ref[:].reshape(1, TILE)
    # tile key range (probe keys are sorted, so first/last are the bounds)
    p_min = pk_ref[0]
    p_max = pk_ref[TILE - 1]

    def body(c, acc):
        lo_acc, cnt_acc = acc
        # w0 is CHUNK-aligned by construction (host rounds it down); the
        # hint lets Mosaic prove slice alignment for the DMA
        start = pl.multiple_of(w0 + c * CHUNK, CHUNK)
        dma = pltpu.make_async_copy(
            b_hbm.at[pl.ds(start, CHUNK)], bbuf, sem)
        dma.start()
        dma.wait()
        # chunk skip fast-paths (both arrays sorted): a chunk entirely
        # below the tile's key range adds CHUNK to every rank and nothing
        # to counts; entirely above adds nothing. Only boundary chunks pay
        # the dense (SUB, TILE) compares — typically 1-2 per tile.
        c_min = bbuf[0]
        c_max = bbuf[CHUNK - 1]

        def dense(_):
            lo_d = jnp.zeros((1, TILE), jnp.int32)
            cnt_d = jnp.zeros((1, TILE), jnp.int32)
            chunk = bbuf[:]
            for s in range(CHUNK // SUB):
                piece = chunk[s * SUB:(s + 1) * SUB].reshape(SUB, 1)
                lo_d = lo_d + jnp.sum(
                    (piece < p).astype(jnp.int32), axis=0, keepdims=True)
                cnt_d = cnt_d + jnp.sum(
                    (piece == p).astype(jnp.int32), axis=0, keepdims=True)
            return lo_d, cnt_d

        def skip(_):
            below = (c_max < p_min).astype(jnp.int32) * jnp.int32(CHUNK)
            return (jnp.full((1, TILE), below, jnp.int32),
                    jnp.zeros((1, TILE), jnp.int32))

        is_boundary = jnp.logical_not(
            jnp.logical_or(c_max < p_min, c_min > p_max))
        lo_d, cnt_d = jax.lax.cond(is_boundary, dense, skip, None)
        return lo_acc + lo_d, cnt_acc + cnt_d

    zero = jnp.zeros((1, TILE), jnp.int32)
    lo_acc, cnt_acc = jax.lax.fori_loop(0, nchunks, body, (zero, zero))
    lo_ref[:] = (w0 + lo_acc.reshape(TILE)).astype(jnp.int32)
    cnt_ref[:] = cnt_acc.reshape(TILE).astype(jnp.int32)


def _kernel(w0_ref, nchunks_ref, pk_ref, b_hbm, lo_ref, cnt_ref,
            bbuf, sem):
    i = pl.program_id(0)
    _body(w0_ref[i], nchunks_ref[i], pk_ref, b_hbm, lo_ref, cnt_ref,
          bbuf, sem)


def _kernel_big(pk_ref, w0_hbm, nc_hbm, b_hbm, lo_ref, cnt_ref,
                bbuf, mw, mn, sem, msems):
    """Big-m variant: per-tile (w0, nchunks) stay in HBM and each step
    DMAs its MSLAB-aligned metadata slab into SMEM scratch — SMEM use is
    O(MSLAB), not O(num_tiles), so probe widths are unbounded (the
    distributed local join feeds 2x-capacity received buffers through
    this kernel)."""
    i = pl.program_id(0)
    base = pl.multiple_of((i // MSLAB) * MSLAB, MSLAB)
    cp1 = pltpu.make_async_copy(w0_hbm.at[pl.ds(base, MSLAB)], mw,
                                msems.at[0])
    cp2 = pltpu.make_async_copy(nc_hbm.at[pl.ds(base, MSLAB)], mn,
                                msems.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    _body(mw[i - base], mn[i - base], pk_ref, b_hbm, lo_ref, cnt_ref,
          bbuf, sem)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "smem_tile_budget"))
def merge_count(
    sorted_build_keys: jax.Array,
    sorted_probe_keys: jax.Array,
    *,
    interpret: bool | None = None,
    smem_tile_budget: int | None = None,
):
    """(lo, counts) for every sorted probe key against the sorted build keys.

    Both inputs must be ascending. Returns i32 arrays shaped like
    ``sorted_probe_keys``; lo is the lower-bound index into
    ``sorted_build_keys``, counts the number of equal build keys.
    Keys must be < INT32_MAX (reserved as the padding sentinel; the
    benchmark domain is [1, 1e9], reference shared.cpp:13-14).
    """
    if interpret is None:
        # CPU backend (tests, emulated meshes) has no Mosaic -> interpret
        interpret = jax.default_backend() == "cpu"
    n = sorted_build_keys.shape[0]
    m = sorted_probe_keys.shape[0]
    n_pad = round_up(max(n, 1), CHUNK)
    m_pad = round_up(max(m, 1), TILE)
    b = jnp.full((n_pad,), PAD_KEY, jnp.int32).at[:n].set(sorted_build_keys)
    p = jnp.full((m_pad,), PAD_KEY, jnp.int32).at[:m].set(sorted_probe_keys)
    num_tiles = m_pad // TILE

    # per-tile window bounds in the padded build array (host-side, cheap:
    # num_tiles queries, binary search via vectorized gathers)
    first = p[::TILE]
    last = p[TILE - 1::TILE]
    w_lo = jnp.searchsorted(b, first, side="left", method="scan_unrolled")
    w_hi = jnp.searchsorted(b, last, side="right", method="scan_unrolled")
    w0 = (w_lo // CHUNK) * CHUNK
    nchunks = cdiv_arr(w_hi - w0, CHUNK)
    # probe pad tiles (first key == PAD_KEY) scan nothing
    nchunks = jnp.where(first == PAD_KEY, 0, nchunks).astype(jnp.int32)
    w0 = jnp.minimum(w0, n_pad - CHUNK).astype(jnp.int32)

    if smem_tile_budget is None:
        smem_tile_budget = SMEM_TILE_BUDGET
    if num_tiles <= smem_tile_budget:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i, *_: (i,),
                             memory_space=pltpu.VMEM),
                # force HBM: untiled memref -> arbitrary-offset DMA slices
                # are legal, and at 100M rows it could never live in VMEM
                # anyway
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=[
                pl.BlockSpec((TILE,), lambda i, *_: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i, *_: (i,),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((CHUNK,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        lo, cnt = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((m_pad,), jnp.int32),
                jax.ShapeDtypeStruct((m_pad,), jnp.int32),
            ],
            interpret=interpret,
        )(w0, nchunks, p, b)
    else:
        # big-m path: metadata via per-step HBM->SMEM slab DMAs — the two
        # O(num_tiles) scalar-prefetch arrays would exceed the 1 MB SMEM
        # above ~130M probe rows (observed at the distributed local
        # join's 2x-capacity 200M-row received buffers)
        t_pad = round_up(num_tiles, MSLAB)
        w0p = jnp.zeros((t_pad,), jnp.int32).at[:num_tiles].set(w0)
        ncp = jnp.zeros((t_pad,), jnp.int32).at[:num_tiles].set(nchunks)
        lo, cnt = pl.pallas_call(
            _kernel_big,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((CHUNK,), jnp.int32),
                pltpu.SMEM((MSLAB,), jnp.int32),
                pltpu.SMEM((MSLAB,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m_pad,), jnp.int32),
                jax.ShapeDtypeStruct((m_pad,), jnp.int32),
            ],
            interpret=interpret,
        )(p, w0p, ncp, b)
    lo = jnp.minimum(lo[:m], n)
    return lo, cnt[:m]


def cdiv_arr(x, d):
    return (x + d - 1) // d
