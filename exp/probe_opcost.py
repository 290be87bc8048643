"""Measure Mosaic per-op overhead vs array shape.

Hypothesis from exp/probe_flatroll.py: each vector op costs ~20ns
regardless of occupying 1 vreg (8,128) or less. If an op on (64,128)
(8 vregs) also costs ~20ns, wide tiles amortize op overhead 8x and the
expansion kernels should compute on the widest block that fits VMEM.

Kernels: K chained (compare+select+add) ops per block, block = (R, 128).
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tpujoin.utils.timing import time_fn

L = 128


def _kernel(s_ref, x_ref, o_ref, *, ops, R):
    u = (jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) * L
         + jax.lax.broadcasted_iota(jnp.int32, (R, L), 1))
    x = x_ref[...]

    def body(d, acc):
        c = s_ref[d]
        return jnp.where(u >= c, acc + c, acc)

    o_ref[...] = jax.lax.fori_loop(0, ops, body, x)


@functools.partial(jax.jit, static_argnames=("ops", "R"))
def run(x2d, shifts, ops, R):
    nrows = x2d.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, ops=ops, R=R),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nrows // R,),
            in_specs=[pl.BlockSpec((R, L), lambda i, s: (i, 0))],
            out_specs=pl.BlockSpec((R, L), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, L), jnp.int32),
    )(shifts, x2d)


def main():
    N = 1 << 28
    x = jnp.ones((N // L, L), jnp.int32)
    jax.block_until_ready(x)
    for R in (8, 32, 64, 128):
        base = None
        for ops in (1, 9, 33):
            shifts = jnp.arange(1, ops + 1, dtype=jnp.int32) * 37
            st = time_fn(run, x, shifts, ops, R, name=f"R{R}o{ops}",
                         iters=2)
            blocks = N // (R * L)
            per_block = st.seconds / blocks * 1e9
            msg = (f"R={R} ops={ops}: {st.seconds:.3f}s "
                   f"{per_block:.0f}ns/block")
            if base is None:
                base = st.seconds
            else:
                marg = (st.seconds - base) / (ops - 1) / blocks * 1e9
                msg += f" marginal={marg:.1f}ns/op"
            print(msg, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
