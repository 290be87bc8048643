"""Correctness of the Pallas merge sort (kernels/merge_sort.py) in
interpret mode: full-result equality against numpy's sort plus the
(key, id) consistency invariants, across adversarial key distributions
(the reference verifies every workload it times — shared.cpp:167-171).

Shapes are shared across cases so the whole module costs a handful of
XLA:CPU compiles (CLAUDE.md compile-count budget)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tpujoin.kernels import merge_sort as ms

N = 1 << 13
T = 1 << 10


def _check(keys: np.ndarray, run_len0=T, t_out=T, local="pallas"):
    ids = np.arange(keys.shape[0], dtype=np.int32)
    k, i = ms.sort_pairs(jnp.asarray(keys), jnp.asarray(ids),
                         run_len0=run_len0, t_out=t_out, local=local,
                         interpret=True)
    k, i = np.asarray(k), np.asarray(i)
    np.testing.assert_array_equal(k, np.sort(keys))
    np.testing.assert_array_equal(keys[i], k)
    assert len(np.unique(i)) == keys.shape[0]


@pytest.mark.parametrize("dist", ["uniform", "dup8", "all_equal",
                                  "sorted", "reversed", "sawtooth"])
def test_sort_pow2_distributions(dist):
    rng = np.random.default_rng(7)
    if dist == "uniform":
        keys = rng.integers(0, 1 << 30, N).astype(np.int32)
    elif dist == "dup8":
        keys = rng.integers(0, 8, N).astype(np.int32)
    elif dist == "all_equal":
        keys = np.full(N, 42, np.int32)
    elif dist == "sorted":
        keys = np.arange(N, dtype=np.int32)
    elif dist == "reversed":
        keys = np.arange(N, dtype=np.int32)[::-1].copy()
    else:
        keys = (np.arange(N, dtype=np.int32) % 37)
    _check(keys)


def test_sort_non_pow2_and_negative_keys():
    rng = np.random.default_rng(3)
    keys = rng.integers(-1000, 1000, 5000).astype(np.int32)
    _check(keys)


def test_sort_tiny_run_ratio():
    # run_len0 = t_out/2, the minimum the co-rank supports
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1000, N).astype(np.int32)
    _check(keys, run_len0=T // 2, t_out=T)


def test_merge_pass_single():
    # one explicit pass over two sorted runs (A ascending, B descending —
    # the alternating-orientation invariant), exercising window splits
    # that straddle ALIGN boundaries (heavy duplication forces uneven
    # co-ranks)
    rng = np.random.default_rng(11)
    n = 1 << 12
    a = np.sort(rng.integers(0, 64, n // 2).astype(np.int32))
    b = np.sort(rng.integers(0, 64, n // 2).astype(np.int32))[::-1]
    keys = np.concatenate([a, b])
    ids = np.arange(n, dtype=np.int32)
    k, i = ms.merge_pass(jnp.asarray(keys), jnp.asarray(ids),
                         jnp.int32(n // 2), t_out=T, interpret=True)
    k, i = np.asarray(k), np.asarray(i)
    np.testing.assert_array_equal(k, np.sort(keys))
    np.testing.assert_array_equal(keys[i], k)


def test_multilevel_alternating_invariant():
    # >= 2 merge levels with multi-tile descending intermediate runs (the
    # r5 development bug class: mirrored co-rank windows for desc tiles)
    rng = np.random.default_rng(13)
    keys = rng.integers(0, 500, 1 << 13).astype(np.int32)
    _check(keys, run_len0=T // 2, t_out=T)


def test_sort_xla_local_runs_variant():
    # the lax.sort local phase (local="xla") must agree with the Pallas
    # local-sort kernel default
    rng = np.random.default_rng(17)
    keys = rng.integers(0, 3000, N).astype(np.int32)
    _check(keys, local="xla")


def test_local_sort_kernel_alternating():
    # the in-VMEM bitonic sort tile kernel alone: even tiles ascending,
    # odd tiles descending, each a permutation of its input tile
    rng = np.random.default_rng(19)
    keys = rng.integers(-5000, 5000, 4 * T).astype(np.int32)
    ids = np.arange(4 * T, dtype=np.int32)
    k, i = ms.local_sort(jnp.asarray(keys), jnp.asarray(ids), tile=T,
                         interpret=True)
    k, i = np.asarray(k), np.asarray(i)
    for t in range(4):
        seg = k[t * T:(t + 1) * T]
        exp = np.sort(keys[t * T:(t + 1) * T])
        if t % 2:
            exp = exp[::-1]
        np.testing.assert_array_equal(seg, exp)
    np.testing.assert_array_equal(keys[i], k)


@pytest.mark.parametrize("mult", [3, 5, 13])
def test_sort_ragged_run_structure(mult):
    # n = odd multiple of the tile: every merge level has a ragged tail
    # (short trailing runs, lone-A pairs, network-driven re-orientation)
    rng = np.random.default_rng(mult)
    keys = rng.integers(0, 10000, mult * T).astype(np.int32)
    _check(keys)
