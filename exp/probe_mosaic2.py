"""Probe 2: HBM->SMEM scratch DMA, and dynamic-start VMEM vector load."""
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
        msg = str(e).replace("\n", " | ")[:400]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)


# ---- A. DMA HBM -> SMEM scratch at a dynamic 1024-aligned offset,
#         then dynamic scalar read from it ----
def t_hbm_to_smem():
    def kern(s_ref, x_hbm, o_ref, smem_buf, sem):
        base = pl.multiple_of(s_ref[0], 1024)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(base, 2048)], smem_buf, sem)
        cp.start()
        cp.wait()
        idx = s_ref[1]
        o_ref[...] = jnp.full((1, 128), smem_buf[idx], jnp.int32)

    x = jnp.arange(8192, dtype=jnp.int32) * 3
    s = jnp.array([2048, 17], jnp.int32)  # want x[2048+17]*... = (2065)*3
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((2048,), jnp.int32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
    )(s, x)
    return f"val={int(out[0, 0])} (want {2065 * 3})"


# ---- B. dynamic-start contiguous vector load from VMEM ----
def t_dyn_vec_load():
    def kern(s_ref, x_ref, o_ref):
        start = s_ref[0]
        o_ref[...] = x_ref[0, pl.ds(start, 1024)].reshape(1, 1024)

    x = jnp.arange(4096, dtype=jnp.int32).reshape(1, 4096)
    s = jnp.array([37], jnp.int32)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.int32),
    )(s, x)
    ok = np.array_equal(np.asarray(out[0, :4]), np.arange(37, 41))
    return f"correct={ok} head={np.asarray(out[0, :4])}"


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    report("hbm_to_smem_dma", t_hbm_to_smem)
    report("dyn_start_vmem_load", t_dyn_vec_load)
