"""Prototype: flat roll on (R,128) 2-D tiles via lane-roll + sublane-rolls.

flat_roll(x2d, k)[f] = x2d.flat[(f - k) mod (R*128)]  (row-major)

  out[s, l] = x[(s - q - (l < r)) mod R, (l - r) mod 128]
  where q = k // 128, r = k % 128.

Implemented as: y = roll(x, r, axis=1); z1 = roll(y, q, axis=0);
z2 = roll(y, q+1, axis=0); out = where(lane < r, z2, z1).

Measures: (a) correctness vs numpy, (b) lowering on this Mosaic build,
(c) throughput of K flat-rolls per 1024-output tile vs the (1,1024)
roll-loop baseline from exp/bench_mat2.py.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tpujoin.utils.timing import time_fn

R = 8
L = 128
TILE = R * L  # 1024
BATCH = 8


def flat_roll(x2d, k, roll):
    q, r = k // L, jax.lax.rem(k, L)
    lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    y = roll(x2d, r, 1)
    z1 = roll(y, q, 0)
    z2 = roll(y, q + 1, 0)
    return jnp.where(lane < r, z2, z1)


def _kernel(s_ref, x_ref, o_ref, *, rolls, interpret):
    roll = jnp.roll if interpret else pltpu.roll
    i = pl.program_id(0)
    for j in range(BATCH):
        x = x_ref[j * R:(j + 1) * R, :]
        acc = jnp.zeros((R, L), jnp.int32)

        def body(d, acc, x=x):
            k = s_ref[d]
            return acc + flat_roll(x, k, roll)

        acc = jax.lax.fori_loop(0, rolls, body, acc)
        o_ref[j * R:(j + 1) * R, :] = acc


@functools.partial(jax.jit, static_argnames=("rolls", "interpret"))
def run(x2d, shifts, rolls, interpret=False):
    nrows = x2d.shape[0]
    step = R * BATCH
    return pl.pallas_call(
        functools.partial(_kernel, rolls=rolls, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nrows // step,),
            in_specs=[pl.BlockSpec((step, L), lambda i, s: (i, 0))],
            out_specs=pl.BlockSpec((step, L), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, L), jnp.int32),
        interpret=interpret,
    )(shifts, x2d)


def main():
    interpret = jax.default_backend() == "cpu"
    # correctness: single tile, all shift values via numpy reference
    x = jnp.arange(TILE, dtype=jnp.int32).reshape(R, L)
    xs = jnp.tile(x, (BATCH, 1))
    for k in (0, 1, 64, 127, 128, 129, 500, 1023):
        shifts = jnp.array([k], jnp.int32)
        out = run(xs, shifts, 1, interpret)[:R]
        ref = np.roll(np.arange(TILE, dtype=np.int32), k).reshape(R, L)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"k={k}: {'OK' if ok else 'FAIL'}", file=sys.stderr, flush=True)
        assert ok, (k, np.asarray(out)[0, :8], ref[0, :8])

    if interpret:
        print("interpret-only correctness PASS", file=sys.stderr)
        return

    # throughput at 2^28 outputs
    N = 1 << 28
    xb = jnp.ones((N // L, L), jnp.int32)
    jax.block_until_ready(xb)
    for rolls in (1, 4, 10, 20):
        shifts = jnp.arange(1, rolls + 1, dtype=jnp.int32) * 37
        st = time_fn(run, xb, shifts, rolls, name=f"flat{rolls}", iters=2,
                     bytes_touched=8 * N)
        print(f"flat_roll rolls={rolls}: {st.seconds:.3f}s "
              f"({st.gbps:.0f} GB/s, {N/st.seconds/1e6:.0f}M out/s)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
