"""Primitive-cost measurements for 1B-pair materialization designs.

Measures, at config-1 scale (10M x 10M keys 1..100k => ~1B pairs):
  1. expand_runs as-is (both slabs)          -- current kernel
  2. scatter of 10M deltas into a 1B buffer  -- for scan-based columns
  3. jnp.cumsum over 1e9 i32 (XLA)           -- scan primitive, XLA route
  4. Pallas sequential-carry scan over 1e9   -- scan primitive, kernel route
  5. take(sorted_ids, bpos) at 1B            -- the gather we avoid
  6. synthetic roll-loop kernel              -- models per-tile roll cost
"""
import sys
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tpujoin.core import datagen
from tpujoin.ops import merge_join as mj
from tpujoin.ops.hash_join import build
from tpujoin.utils.shapes import round_up
from tpujoin.utils.timing import time_fn


def ep(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------- Pallas scan (cumsum with carry) ----------------
SCAN_BLK = 1 << 16


def _scan_kernel(x_ref, o_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0

    c_in = carry_ref[0]
    x = x_ref[:].reshape(1, SCAN_BLK)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SCAN_BLK), 1)
    acc = x
    k = 1
    while k < SCAN_BLK:
        rolled = pltpu.roll(acc, k, 1)
        acc = acc + jnp.where(lane >= k, rolled, 0)
        k *= 2
    o_ref[:] = (acc + c_in).reshape(SCAN_BLK)
    carry_ref[0] = c_in + jnp.sum(x)


@jax.jit
def pallas_scan(x):
    n = x.shape[0]
    assert n % SCAN_BLK == 0
    return pl.pallas_call(
        _scan_kernel,
        grid=(n // SCAN_BLK,),
        in_specs=[pl.BlockSpec((SCAN_BLK,), lambda i: (i,))],
        out_specs=pl.BlockSpec((SCAN_BLK,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(x)


# ---------------- synthetic roll loop (models expand cost) ----------------
RTILE = 1024
RBATCH = 8


def _rollloop_kernel(x_ref, o_ref, *, rolls):
    for j in range(RBATCH):
        sl = slice(j * RTILE, (j + 1) * RTILE)
        x = x_ref[sl].reshape(1, RTILE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, RTILE), 1)
        acc = jnp.zeros((1, RTILE), jnp.int32)

        def body(d, acc, x=x, lane=lane):
            rolled = pltpu.roll(x, d, 1)
            return jnp.where(lane >= d, rolled, acc)

        acc = jax.lax.fori_loop(0, rolls, body, acc)
        o_ref[sl] = acc.reshape(RTILE)


@functools.partial(jax.jit, static_argnames=("rolls",))
def rollloop(x, rolls):
    n = x.shape[0]
    step = RTILE * RBATCH
    return pl.pallas_call(
        functools.partial(_rollloop_kernel, rolls=rolls),
        grid=(n // step,),
        in_specs=[pl.BlockSpec((step,), lambda i: (i,))],
        out_specs=pl.BlockSpec((step,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
    )(x)


def main():
    which = set(sys.argv[1:]) or {"all"}
    N = 1 << 30  # ~1.07e9

    def has(k):
        return "all" in which or k in which

    if has("runs"):
        rng_r, rng_s = jax.random.split(jax.random.PRNGKey(1))
        bk = datagen.make_keys(rng_r, 10_000_000, 1, 100_000)
        pk = datagen.make_keys(rng_s, 10_000_000, 1, 100_000)
        jax.block_until_ready((bk, pk))
        ht = build(bk)
        state, total_a, nz_a = mj.probe_count(ht, pk)
        total, nonzero = int(total_a), int(nz_a)
        ep(f"total={total} nonzero={nonzero} dup={total/nonzero:.1f}")
        cap = round_up(total, 1 << 20)
        k_cap = round_up(nonzero, 1 << 20)
        for slab in (4096, 16384):
            st = time_fn(lambda: mj.probe_materialize_runs(
                ht, state, k_cap, cap, src_slab=slab),
                name=f"runs{slab}", rows=total, iters=1)
            _, _, _, fits = mj.probe_materialize_runs(
                ht, state, k_cap, cap, src_slab=slab)
            ep(f"expand_runs slab={slab}: {st.seconds:.3f}s "
               f"{total/st.seconds/1e6:.0f}M pairs/s fits={bool(fits)}")

    if has("groups"):
        rng_r, rng_s = jax.random.split(jax.random.PRNGKey(1))
        bk = datagen.make_keys(rng_r, 10_000_000, 1, 100_000)
        pk = datagen.make_keys(rng_s, 10_000_000, 1, 100_000)
        jax.block_until_ready((bk, pk))
        ht = build(bk)
        state, total_a, nz_a = mj.probe_count(ht, pk)
        total, nonzero = int(total_a), int(nz_a)
        ep(f"total={total} nonzero={nonzero} dup={total/nonzero:.1f}")
        cap = round_up(total, 1 << 20)
        k_cap = round_up(nonzero, 1 << 20)
        for slab in (4096,):
            _, _, _, fits = mj.probe_materialize_groups(
                ht, state, k_cap, cap, src_slab=slab)
            ep(f"groups slab={slab} fits={bool(fits)}")
            if not bool(fits):
                continue
            st = time_fn(lambda: mj.probe_materialize_groups(
                ht, state, k_cap, cap, src_slab=slab),
                name=f"groups{slab}", rows=total, iters=1)
            ep(f"expand_groups slab={slab}: {st.seconds:.3f}s "
               f"{total/st.seconds/1e6:.0f}M pairs/s")

    if has("scatter"):
        idx = jnp.sort(jax.random.randint(
            jax.random.PRNGKey(2), (10_000_000,), 0, N, dtype=jnp.int32))
        vals = jnp.ones((10_000_000,), jnp.int32)
        jax.block_until_ready((idx, vals))

        @jax.jit
        def scat(idx, vals):
            return jnp.zeros((N,), jnp.int32).at[idx].set(
                vals, mode="drop", unique_indices=True,
                indices_are_sorted=True)

        st = time_fn(scat, idx, vals, name="scatter", iters=2,
                     bytes_touched=4 * N)
        ep(f"scatter 10M into 1B (+zeros init): {st.seconds:.3f}s "
           f"({st.gbps:.0f} GB/s)")

    if has("cumsum"):
        x = jnp.ones((N,), jnp.int32)
        jax.block_until_ready(x)
        st = time_fn(jax.jit(jnp.cumsum), x, name="cumsum", iters=2,
                     bytes_touched=8 * N)
        ep(f"jnp.cumsum 1B i32: {st.seconds:.3f}s ({st.gbps:.0f} GB/s)")

    if has("pscan"):
        x = jnp.ones((N,), jnp.int32)
        jax.block_until_ready(x)
        y = pallas_scan(x)
        ok = bool(y[-1] == N) and bool(y[12345] == 12346)
        ep(f"pallas_scan correct={ok}")
        st = time_fn(pallas_scan, x, name="pscan", iters=2,
                     bytes_touched=8 * N)
        ep(f"pallas_scan 1B i32: {st.seconds:.3f}s ({st.gbps:.0f} GB/s)")

    if has("take"):
        src = jnp.arange(10_000_000, dtype=jnp.int32)
        bpos = jax.random.randint(jax.random.PRNGKey(3), (N,), 0,
                                  10_000_000, dtype=jnp.int32)
        jax.block_until_ready((src, bpos))
        st = time_fn(jax.jit(lambda s, b: jnp.take(s, b)), src, bpos,
                     name="take", iters=1, bytes_touched=8 * N)
        ep(f"take 1B from 10M: {st.seconds:.3f}s "
           f"({N/st.seconds/1e6:.0f}M idx/s)")

    if has("roll"):
        NR = 1 << 28
        x = jnp.ones((NR,), jnp.int32)
        jax.block_until_ready(x)
        for rolls in (1, 4, 10, 20):
            st = time_fn(rollloop, x, rolls, name=f"roll{rolls}", iters=2,
                         bytes_touched=8 * NR)
            ep(f"rollloop rolls={rolls} (TILE=1024): {st.seconds:.3f}s "
               f"({st.gbps:.0f} GB/s, {NR/st.seconds/1e6:.0f}M out/s)")

    ep("DONE")


if __name__ == "__main__":
    main()
