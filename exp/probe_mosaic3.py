"""Probe 3: primitives for the 2-D flat-order rotate variant of expand_runs.

  A. dynamic sublane roll (axis=0) on (32, 128) i32
  B. 2-D HBM->VMEM DMA with dynamic row offset (multiple of 8)
  C. full flat rotate: rows+lanes two-phase rotate == 1-D rotate in
     row-major flat order (correctness check vs numpy)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        out = fn()
        print(f"[OK] {name}: {out}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)


def t_sublane_roll():
    def kern(s_ref, x_ref, o_ref):
        q = s_ref[0]
        o_ref[...] = pltpu.roll(x_ref[...], -q, 0)

    x = jnp.arange(32 * 128, dtype=jnp.int32).reshape(32, 128)
    s = jnp.array([3], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
    )(s, x)
    ok = np.array_equal(np.asarray(out), np.roll(np.asarray(x), -3, 0))
    return f"correct={ok}"


def t_2d_row_dma():
    def kern(s_ref, x_hbm, o_ref, buf, sem):
        rb = pl.multiple_of(s_ref[0], 8)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(rb, 32), :], buf, sem)
        cp.start()
        cp.wait()
        o_ref[...] = buf[...]

    x = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128)
    s = jnp.array([40], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((32, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
    )(s, x)
    ok = np.array_equal(np.asarray(out), np.asarray(x)[40:72])
    return f"correct={ok}"


def t_flat_rotate():
    W = 128

    def kern(s_ref, x_ref, o_ref):
        delta = s_ref[0]
        q = delta // W
        dm = jax.lax.rem(delta, W)
        s1 = pltpu.roll(x_ref[...], -q, 0)
        s2 = pltpu.roll(x_ref[...], -(q + 1), 0)
        l1 = pltpu.roll(s1[:8, :], -dm, 1)
        l2 = pltpu.roll(s2[:8, :], -dm, 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1)
        o_ref[...] = jnp.where(c < W - dm, l1, l2)

    x = jnp.arange(32 * W, dtype=jnp.int32).reshape(32, W)
    delta = 517
    s = jnp.array([delta], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((8, W), jnp.int32),
    )(s, x)
    flat = np.asarray(x).reshape(-1)
    want = np.array([flat[(u + delta) % (32 * W)] for u in range(8 * W)]
                    ).reshape(8, W)
    ok = np.array_equal(np.asarray(out), want)
    return f"correct={ok}"


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    report("sublane_roll_dynamic", t_sublane_roll)
    report("2d_row_dma", t_2d_row_dma)
    report("flat_rotate_2phase", t_flat_rotate)
