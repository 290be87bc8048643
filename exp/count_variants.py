"""merge_count dense-path strategies, head-to-head on TPU.

Strategies:
  fat512  - round-1 kernel: 2 slabs of (512, 1024) dense compares
  diag128 - 8x8 grid of (128, 128) blocks, per-block lax.cond skip
  quad256 - 4x4 grid of (256, 256) blocks, per-block lax.cond skip
Workloads: ref_low (100M x 100M keys 1..1e9, window ~ 1 chunk/tile) and
ref_high (10M x 10M keys 1..100k, dup ~100).
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
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn

CHUNK = 1024
PAD_KEY = jnp.int32(0x7FFFFFFF)


def ep(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(w0_ref, nchunks_ref, pk_ref, b_hbm, lo_ref, cnt_ref,
            bbuf, sem, *, strategy, TILE):
    i = pl.program_id(0)
    w0 = w0_ref[i]
    nchunks = nchunks_ref[i]
    p_min = pk_ref[0]
    p_max = pk_ref[TILE - 1]
    if strategy == "fat512":
        PIECE, SLAB = TILE, 512
    elif strategy.startswith("fatc"):
        # full-tile probe piece, N-key slabs, per-slab skip conds
        PIECE, SLAB = TILE, int(strategy[4:])
    else:
        # diagN: 128-key probe pieces (lane width), N-key build slabs
        PIECE, SLAB = 128, int(strategy[4:])
    NPp = TILE // PIECE
    NSs = CHUNK // SLAB
    p2d = pk_ref[:].reshape(NPp, PIECE)
    pmins = [pk_ref[pp * PIECE] for pp in range(NPp)]
    pmaxs = [pk_ref[pp * PIECE + PIECE - 1] for pp in range(NPp)]

    def body(c, acc):
        start = pl.multiple_of(w0 + c * CHUNK, CHUNK)
        dma = pltpu.make_async_copy(b_hbm.at[pl.ds(start, CHUNK)], bbuf, sem)
        dma.start()
        dma.wait()
        c_min = bbuf[0]
        c_max = bbuf[CHUNK - 1]

        def dense(acc):
            lo_a, cnt_a = acc
            los, cnts = [], []
            for pp in range(NPp):
                prow = p2d[pp:pp + 1]
                lo_pp = jnp.zeros((1, PIECE), jnp.int32)
                cnt_pp = jnp.zeros((1, PIECE), jnp.int32)
                for ss in range(NSs):
                    blo = bbuf[ss * SLAB]
                    bhi = bbuf[ss * SLAB + SLAB - 1]

                    def blk(a, ss=ss, prow=prow):
                        lo_c, ct_c = a
                        piece = bbuf[ss * SLAB:(ss + 1) * SLAB] \
                            .reshape(SLAB, 1)
                        lo_c = lo_c + jnp.sum(
                            (piece < prow).astype(jnp.int32), axis=0,
                            keepdims=True)
                        ct_c = ct_c + jnp.sum(
                            (piece == prow).astype(jnp.int32), axis=0,
                            keepdims=True)
                        return lo_c, ct_c

                    if strategy == "fat512":
                        lo_pp, cnt_pp = blk((lo_pp, cnt_pp))
                        continue

                    def below_f(a):
                        lo_c, ct_c = a
                        return lo_c + jnp.int32(SLAB), ct_c

                    def rest(a, blo=blo, pp=pp):
                        return jax.lax.cond(blo > pmaxs[pp],
                                            lambda x: x, blk, a)

                    lo_pp, cnt_pp = jax.lax.cond(
                        bhi < pmins[pp], below_f, rest, (lo_pp, cnt_pp))
                los.append(lo_pp)
                cnts.append(cnt_pp)
            return (lo_a + jnp.concatenate(los, axis=0).reshape(lo_a.shape),
                    cnt_a + jnp.concatenate(cnts, axis=0).reshape(
                        cnt_a.shape))

        def skip(acc):
            lo_a, cnt_a = acc
            below = (c_max < p_min).astype(jnp.int32) * jnp.int32(CHUNK)
            return lo_a + below, cnt_a

        is_boundary = jnp.logical_not(
            jnp.logical_or(c_max < p_min, c_min > p_max))
        return jax.lax.cond(is_boundary, dense, skip, acc)

    zero = jnp.zeros((NPp, PIECE), jnp.int32)
    lo_acc, cnt_acc = jax.lax.fori_loop(0, nchunks, body, (zero, zero))
    lo_ref[:] = (w0 + lo_acc.reshape(TILE)).astype(jnp.int32)
    cnt_ref[:] = cnt_acc.reshape(TILE).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("strategy", "TILE"))
def merge_count_v(sorted_build_keys, sorted_probe_keys, *, strategy,
                  TILE=1024):
    n = sorted_build_keys.shape[0]
    m = sorted_probe_keys.shape[0]
    n_pad = round_up(max(n, 1), CHUNK)
    m_pad = round_up(max(m, 1), TILE)
    b = jnp.full((n_pad,), PAD_KEY, jnp.int32).at[:n].set(sorted_build_keys)
    p = jnp.full((m_pad,), PAD_KEY, jnp.int32).at[:m].set(sorted_probe_keys)
    num_tiles = m_pad // TILE
    first = p[::TILE]
    last = p[TILE - 1::TILE]
    w_lo = jnp.searchsorted(b, first, side="left", method="scan_unrolled")
    w_hi = jnp.searchsorted(b, last, side="right", method="scan_unrolled")
    w0 = (w_lo // CHUNK) * CHUNK
    nchunks = ((w_hi - w0 + CHUNK - 1) // CHUNK)
    nchunks = jnp.where(first == PAD_KEY, 0, nchunks).astype(jnp.int32)
    w0 = jnp.minimum(w0, n_pad - CHUNK).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i, *_: (i,),
                         memory_space=pltpu.VMEM),
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
        functools.partial(_kernel, strategy=strategy, TILE=TILE),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m_pad,), jnp.int32),
            jax.ShapeDtypeStruct((m_pad,), jnp.int32),
        ],
    )(w0, nchunks, p, b)
    return jnp.minimum(lo[:m], n), cnt[:m]


def main():
    for name, n, kmax in (("ref_low", 100_000_000, 1_000_000_000),
                          ("ref_high", 10_000_000, 100_000)):
        kr, ks = jax.random.split(jax.random.PRNGKey(0))
        bk = jnp.sort(datagen.make_keys(kr, n, 1, kmax))
        pk = jnp.sort(datagen.make_keys(ks, n, 1, kmax))
        jax.block_until_ready((bk, pk))
        ref = None
        for strategy, tile in (("fat512", 1024), ("fatc512", 1024),
                               ("fatc256", 1024), ("fatc128", 1024)):
            st = time_fn(lambda s=strategy, t=tile: merge_count_v(
                bk, pk, strategy=s, TILE=t), name=strategy, rows=n)
            lo, cnt = merge_count_v(bk, pk, strategy=strategy, TILE=tile)
            tot = int(np.asarray(cnt).astype(np.int64).sum())
            ok = ""
            if ref is None:
                ref = (np.asarray(lo[:100000]), np.asarray(cnt[:100000]))
            else:
                ok = ("parity=OK" if
                      (np.array_equal(ref[0], np.asarray(lo[:100000]))
                       and np.array_equal(ref[1], np.asarray(cnt[:100000])))
                      else "parity=FAIL")
            ep(f"{name} {strategy:8s} tile={tile} {st.seconds:.3f}s "
               f"({n / st.seconds / 1e6:.0f}M keys/s) total={tot} {ok}")


if __name__ == "__main__":
    main()
