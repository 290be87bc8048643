"""Micro-cost of Mosaic vector ops vs shape and shift kind.

Measures per-op cost of: dynamic pltpu.roll (lane axis / sublane axis),
static-shift roll, static concat row-shift, select(where), iota — on
(R, 128) blocks for R in {16, 64, 256, 512}. Grounds the roll-count
budget for the expansion kernels (hypothesis: ~100ns fixed per op,
weakly shape-dependent).

Method: kernel runs OPS chained ops inside one grid step over NSTEP
steps; time/(OPS*NSTEP) = per-op cost (chained => no ILP hiding; this is
the pessimistic latency bound the expansion kernels actually see).
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
OPS = 64
NSTEP = 512


def _mk_kernel(kind, R):
    def kernel(s_ref, x_ref, o_ref):
        x = x_ref[...]
        sh = s_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        for d in range(OPS):
            if kind == "roll_lane":
                x = pltpu.roll(x, sh, 1)
            elif kind == "roll_sub":
                x = pltpu.roll(x, sh, 0)
            elif kind == "roll_static":
                x = pltpu.roll(x, 3, 0)
            elif kind == "concat_shift":
                x = jnp.concatenate([x[R - 1:], x[:R - 1]], axis=0)
            elif kind == "select":
                x = jnp.where(lane < sh, x + 1, x)
            elif kind == "iota_add":
                x = x + lane
        o_ref[...] = x
    return kernel


@functools.partial(jax.jit, static_argnames=("kind", "R"))
def run(x, sh, kind, R):
    return pl.pallas_call(
        _mk_kernel(kind, R),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NSTEP,),
            in_specs=[pl.BlockSpec((R, L), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
    )(sh, x)


def main():
    for R in (16, 64, 256, 512):
        x = jnp.arange(R * L, dtype=jnp.int32).reshape(R, L)
        sh = jnp.array([5], jnp.int32)
        for kind in ("roll_lane", "roll_sub", "roll_static",
                     "concat_shift", "select", "iota_add"):
            st = time_fn(lambda k=kind, r=R: run(x, sh, k, r), name=kind)
            print(f"R={R:4d} {kind:14s} {st.seconds / OPS / NSTEP * 1e9:7.1f}"
                  " ns/op", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
