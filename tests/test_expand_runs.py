"""Run-expansion kernel (kernels.expand_runs) correctness.

The contract mirrors the reference's probe materialization output (pairs of
rowIDs compared as a multiset, reference shared_stuff/shared.cpp:167-171);
every case is checked either against a NumPy expansion oracle or against
the independently-tested expand+take path (ops.merge_join.probe_materialize).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpujoin.kernels.expand_runs import expand_runs
from tpujoin.ops import merge_join as mj
from tpujoin.ops.hash_join import build
from tpujoin.utils.shapes import round_up


def numpy_expand(offsets, lo, counts, sid, src, capacity):
    r = np.full(capacity, -1, np.int64)
    s = np.full(capacity, -1, np.int64)
    for o, l, c, p in zip(offsets, lo, counts, sid):
        for j in range(c):
            if o + j < capacity:
                r[o + j] = src[l + j]
                s[o + j] = p
    return r, s


def run_case(counts, lo, sid, src, capacity=None):
    counts = np.asarray(counts, np.int32)
    lo = np.asarray(lo, np.int32)
    sid = np.asarray(sid, np.int32)
    src = np.asarray(src, np.int32)
    offsets = np.cumsum(counts) - counts
    total = int(counts.sum())
    capacity = capacity or total
    from tpujoin.kernels.expand_runs import SRC_SLABS
    for slab in SRC_SLABS:
        r, s, fits = expand_runs(
            jnp.asarray(offsets), jnp.asarray(lo), jnp.asarray(counts),
            jnp.asarray(sid), jnp.asarray(src),
            jnp.int32(len(counts)), jnp.int32(total), capacity,
            src_slab=slab)
        if bool(fits):
            break
    assert bool(fits), "small cases must fit some kernel slab size"
    er, es = numpy_expand(offsets, lo, counts, sid, src, capacity)
    np.testing.assert_array_equal(np.asarray(r), er)
    np.testing.assert_array_equal(np.asarray(s), es)


def test_single_run():
    run_case(counts=[5], lo=[2], sid=[7], src=np.arange(100) * 3)


def test_adjacent_runs():
    run_case(counts=[3, 4, 1], lo=[0, 3, 7], sid=[9, 1, 4],
             src=np.arange(64) + 100)


def test_duplicate_probe_keys_share_ranges():
    # three probe rows with the same key reuse the same build range
    run_case(counts=[4, 4, 4, 2], lo=[10, 10, 10, 20], sid=[5, 6, 7, 8],
             src=np.arange(64) * 11)


def test_run_spanning_many_tiles():
    # one giant run (> STEP slots) crossing grid-step boundaries
    run_case(counts=[20000], lo=[1], sid=[3], src=np.arange(30000))


def test_capacity_padding_marks_invalid():
    counts, lo, sid = [3], [0], [1]
    src = np.arange(16)
    offsets = np.array([0], np.int32)
    r, s, fits = expand_runs(
        jnp.asarray(offsets), jnp.asarray(lo, jnp.int32),
        jnp.asarray(counts, jnp.int32), jnp.asarray(sid, jnp.int32),
        jnp.asarray(src, jnp.int32), jnp.int32(1), jnp.int32(3), 10)
    assert bool(fits)
    np.testing.assert_array_equal(np.asarray(r), [0, 1, 2] + [-1] * 7)
    np.testing.assert_array_equal(np.asarray(s), [1, 1, 1] + [-1] * 7)


def test_empty_result():
    r, s, fits = expand_runs(
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.arange(8, dtype=jnp.int32), jnp.int32(0), jnp.int32(0), 8)
    np.testing.assert_array_equal(np.asarray(r), -np.ones(8))
    np.testing.assert_array_equal(np.asarray(s), -np.ones(8))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_runs(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(1, 200))
    counts = rng.integers(1, 50, size=k).astype(np.int32)
    gaps = rng.integers(0, 5, size=k)
    lo = (np.cumsum(counts + gaps) - (counts + gaps)).astype(np.int32)
    sid = rng.permutation(k).astype(np.int32)
    src = rng.integers(0, 1 << 30, size=int(lo[-1] + counts[-1] + 8),
                       dtype=np.int32)
    run_case(counts, lo, sid, src)


@pytest.mark.parametrize("dup", [8, 64])
def test_pipeline_parity_with_expand_take(dup):
    """probe_materialize_runs must equal probe_materialize as a multiset on
    a real join (duplicated keys => the runs path is the gated fast path)."""
    rng = np.random.default_rng(42 + dup)
    n_keys = 40
    bk = rng.integers(1, n_keys, size=400, dtype=np.int32)
    pk = np.repeat(rng.integers(1, n_keys, size=50, dtype=np.int32), dup)
    rng.shuffle(pk)
    ht = build(jnp.asarray(bk))
    state, total_a, nonzero_a = mj.probe_count(ht, jnp.asarray(pk))
    total, nonzero = int(total_a), int(nonzero_a)
    assert total >= nonzero * mj.RUNS_MIN_DUP // 2
    cap = round_up(total, 1 << 10)
    k_cap = round_up(nonzero, 1 << 10)

    r1, s1, t1, _ = mj.probe_materialize(ht, state, k_cap, cap)
    r2, s2, t2, fits = mj.probe_materialize_runs(ht, state, k_cap, cap)
    assert bool(fits)
    assert int(t1) == int(t2) == total
    ref = sorted(zip(np.asarray(r1[:total]).tolist(),
                     np.asarray(s1[:total]).tolist()))
    got = sorted(zip(np.asarray(r2[:total]).tolist(),
                     np.asarray(s2[:total]).tolist()))
    assert ref == got


def test_merge_join_driver_uses_runs_path():
    """End-to-end merge_join on a high-duplication workload stays correct
    (the driver gates onto expand_runs at RUNS_MIN_DUP)."""
    rng = np.random.default_rng(7)
    bk = rng.integers(1, 20, size=300, dtype=np.int32)
    pk = rng.integers(1, 20, size=256, dtype=np.int32)
    r, s = mj.merge_join(bk, pk, result_pad_multiple=1 << 12)
    exp = sorted((int(b), int(p)) for p, pkv in enumerate(pk)
                 for b, bkv in enumerate(bk) if bkv == pkv)
    got = sorted(zip(r.tolist(), s.tolist()))
    assert got == exp
