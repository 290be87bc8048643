"""Mosaic capability probe for the run-expansion kernel design.

Tests (each isolated, try/except):
  1. pltpu.roll with a DYNAMIC shift on (1, 1024) i32
  2. dynamic scalar read from an SMEM ref
  3. dynamic scalar read from a VMEM ref
  4. lax.fori_loop with a TRACED bound carrying a vector accumulator
  5. SMEM BlockSpec input with scalar-prefetch-dependent index map
  6. timing: jnp.cumsum over 1B i32
  7. timing: jnp.take 100M indices from 10M table (baseline gather rate)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tpujoin.utils.timing import time_fn  # noqa: E402


def report(name, fn):
    try:
        out = fn()
        print(f"[OK] {name}: {out}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:500]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)


# ---- 1. dynamic roll ----
def t_roll():
    def kern(s_ref, x_ref, o_ref):
        shift = s_ref[0]
        o_ref[...] = pltpu.roll(x_ref[...], -shift, 1)

    x = jnp.arange(1024, dtype=jnp.int32).reshape(1, 1024)
    s = jnp.array([5], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.int32),
    )(s, x)
    ok = np.array_equal(np.asarray(out[0, :5]), np.arange(5, 10))
    return f"roll(-5) correct={ok} head={np.asarray(out[0, :8])}"


# ---- 2. dynamic scalar read from SMEM ----
def t_smem_dyn():
    def kern(s_ref, o_ref):
        i = s_ref[0]
        o_ref[...] = jnp.full((1, 128), s_ref[i], jnp.int32)

    s = jnp.array([3, 10, 20, 30, 40], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,), in_specs=[],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(s)
    return f"val={int(out[0, 0])} (want 30)"


# ---- 3. dynamic scalar read from VMEM ----
def t_vmem_dyn():
    def kern(s_ref, x_ref, o_ref):
        i = s_ref[0]
        o_ref[...] = jnp.full((1, 128), x_ref[0, i], jnp.int32)

    x = (jnp.arange(1024, dtype=jnp.int32) * 7).reshape(1, 1024)
    s = jnp.array([9], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(s, x)
    return f"val={int(out[0, 0])} (want 63)"


# ---- 4. fori_loop with traced bound ----
def t_fori():
    def kern(s_ref, x_ref, o_ref):
        n = s_ref[0]

        def body(d, acc):
            return acc + x_ref[...] + d

        o_ref[...] = jax.lax.fori_loop(0, n, body,
                                       jnp.zeros((1, 128), jnp.int32))

    x = jnp.ones((1, 128), jnp.int32)
    s = jnp.array([5], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(s, x)
    return f"val={int(out[0, 0])} (want 15)"


# ---- 5. SMEM BlockSpec with scalar-dependent index map ----
def t_smem_block():
    def kern(r_ref, m_ref, o_ref):
        o_ref[...] = jnp.full((1, 128), m_ref[0], jnp.int32)

    meta = jnp.arange(4096, dtype=jnp.int32)
    r = jnp.array([2], jnp.int32)  # block 2 of 1024 -> meta[2048]
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((1024,), lambda i, r: (r[i],),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(r, meta)
    return f"val={int(out[0, 0])} (want 2048)"


# ---- 6/7 timings ----
def t_cumsum():
    n = 1 << 30
    x = jnp.ones((n,), jnp.int32)
    jax.block_until_ready(x)
    f = jax.jit(lambda a: jnp.cumsum(a))
    st = time_fn(f, x, name="cumsum_1B", rows=n, bytes_touched=n * 8)
    return f"{st.seconds:.3f}s  {st.gbps:.1f} GB/s"


def t_take():
    src = jnp.arange(10_000_000, dtype=jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(0), (100_000_000,), 0,
                             10_000_000, jnp.int32)
    jax.block_until_ready((src, idx))
    f = jax.jit(lambda s, i: jnp.take(s, i))
    st = time_fn(f, src, idx, name="take_100M", rows=100_000_000)
    return f"{st.seconds:.3f}s  {st.rows_per_sec/1e6:.1f}M idx/s"


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    report("roll_dynamic", t_roll)
    report("smem_dynamic_scalar", t_smem_dyn)
    report("vmem_dynamic_scalar", t_vmem_dyn)
    report("fori_traced_bound", t_fori)
    report("smem_blockspec_scalar_indexmap", t_smem_block)
    report("cumsum_1B", t_cumsum)
    report("take_100M", t_take)
