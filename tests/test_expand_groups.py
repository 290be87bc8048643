"""Group-periodic expansion kernel (kernels.expand_groups) correctness.

Same contract as kernels.expand_runs (pairs of rowIDs compared as a
multiset, reference shared_stuff/shared.cpp:167-171) — every case is
checked against a NumPy expansion oracle or against the independently-
tested expand+take path (ops.merge_join.probe_materialize).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpujoin.kernels.expand_groups import expand_groups, SRC_SLABS
from tpujoin.ops import merge_join as mj
from tpujoin.ops.hash_join import build
from tpujoin.utils.shapes import round_up

# small static unroll envelope (batch, w, gw) so interpret-mode compiles
# stay fast on CPU (the default profile's graph costs ~100 s of XLA
# compile per shape); every case below fits it: runs/tile <= 12 < w-1,
# group heads/step <= 6 < gw
PROFILE = (4, 16, 8)
PROF_KW = dict(zip(("batch", "w", "gw"), PROFILE))


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
    """counts/lo/sid are per-run; runs with identical lo (and counts) are
    one group. lo must be non-decreasing and counts equal within a group
    (the probe_count invariant for sorted probe keys).

    capacity and src are padded to fixed 8192 granules so the interpret-
    mode tests SHARE compiled executables (each fresh static shape costs
    ~15 s of XLA CPU compile; sharing keeps the suite in its budget)."""
    counts = np.asarray(counts, np.int32)
    lo = np.asarray(lo, np.int32)
    sid = np.asarray(sid, np.int32)
    src = np.asarray(src, np.int32)
    src = np.pad(src, (0, round_up(max(len(src), 1), 8192) - len(src)))
    offsets = (np.cumsum(counts) - counts).astype(np.int32)
    total = int(counts.sum())
    capacity = capacity or round_up(total, 8192)

    # group extraction (head = first run of each distinct lo)
    is_head = np.ones(len(lo), bool)
    is_head[1:] = lo[1:] != lo[:-1]
    goff = offsets[is_head]
    glo = lo[is_head]
    gnb = counts[is_head]
    ngroups = int(is_head.sum())

    for slab in SRC_SLABS:
        r, s, fits = expand_groups(
            jnp.asarray(offsets), jnp.asarray(sid),
            jnp.asarray(goff), jnp.asarray(glo), jnp.asarray(gnb),
            jnp.asarray(src),
            jnp.int32(len(counts)), jnp.int32(ngroups), jnp.int32(total),
            capacity, src_slab=slab, **PROF_KW)
        if bool(fits):
            break
    assert bool(fits), "small cases must fit some kernel slab size"
    er, es = numpy_expand(offsets, lo, counts, sid, src, capacity)
    np.testing.assert_array_equal(np.asarray(r), er)
    np.testing.assert_array_equal(np.asarray(s), es)


def test_single_run():
    run_case(counts=[5], lo=[2], sid=[7], src=np.arange(100) * 3)


def test_one_group_many_runs():
    # 6 probe rows sharing one key: period-4 output over 24 slots
    run_case(counts=[4] * 6, lo=[10] * 6, sid=[5, 9, 2, 7, 1, 3],
             src=np.arange(64) * 11)


def test_adjacent_groups():
    run_case(counts=[3, 3, 4, 1, 1], lo=[0, 0, 3, 7, 7], sid=[9, 1, 4, 2, 8],
             src=np.arange(64) + 100)


def test_period_crossing_tile_boundaries():
    # period 700 (not a power of two, > half a tile) across many tiles
    run_case(counts=[700] * 9, lo=[100] * 9, sid=list(range(9)),
             src=np.arange(4000))


def test_giant_group_spanning_steps():
    # one group's block (> STEP slots) crossing grid-step boundaries
    run_case(counts=[3500] * 6, lo=[1] * 6, sid=list(range(6)),
             src=np.arange(8000))


def test_long_run_inside_small_groups():
    # nb >= TILE: zero doubling steps, pure two-roll windows
    run_case(counts=[5000, 5000, 17], lo=[0, 0, 6000], sid=[3, 1, 2],
             src=np.arange(8000))


def test_capacity_padding_marks_invalid():
    counts, lo, sid = [3, 3], [0, 0], [1, 2]
    src = np.arange(16)
    run_case(counts, lo, sid, src, capacity=10)


def test_empty_result():
    r, s, fits = expand_groups(
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.ones(4, jnp.int32), jnp.arange(8, dtype=jnp.int32),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), 8, **PROF_KW)
    np.testing.assert_array_equal(np.asarray(r), -np.ones(8))
    np.testing.assert_array_equal(np.asarray(s), -np.ones(8))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_randomized_groups(seed):
    """Random workloads inside the kernel's static envelope (runs per tile
    < W-1, group heads per step < GW): gnb >= 96 keeps runs/tile <= 12;
    gnb*gnp >= ~1400 keeps heads/step <= 6."""
    rng = np.random.default_rng(seed)
    g = int(rng.integers(1, 12))
    gnb = rng.integers(96, 200, size=g).astype(np.int32)
    gnp = rng.integers(15, 25, size=g).astype(np.int32)
    gaps = rng.integers(0, 5, size=g)
    glo = (np.cumsum(gnb + gaps) - (gnb + gaps)).astype(np.int32)
    counts = np.repeat(gnb, gnp)
    lo = np.repeat(glo, gnp)
    sid = rng.permutation(len(counts)).astype(np.int32)
    src = rng.integers(0, 1 << 30, size=int(glo[-1] + gnb[-1] + 8),
                       dtype=np.int32)
    run_case(counts, lo, sid, src)


def test_out_of_envelope_reports_no_fit():
    """Many tiny groups (1 run of 1 slot each) exceed W/GW: the kernel
    must refuse via fits=False rather than emit garbage."""
    k = 512
    counts = np.ones(k, np.int32)
    lo = np.arange(k, dtype=np.int32)
    offsets = np.arange(k, dtype=np.int32)
    sid = np.arange(k, dtype=np.int32)
    src = np.arange(k + 8, dtype=np.int32)
    _, _, fits = expand_groups(
        jnp.asarray(offsets), jnp.asarray(sid),
        jnp.asarray(offsets), jnp.asarray(lo), jnp.asarray(counts),
        jnp.asarray(src), jnp.int32(k), jnp.int32(k), jnp.int32(k), k,
        **PROF_KW)
    assert not bool(fits)


@pytest.mark.parametrize("dup", [16, 32])
def test_pipeline_parity_with_expand_take(dup):
    """probe_materialize_groups must equal probe_materialize as a multiset
    on a real join (heavily duplicated keys on both sides => the groups
    path is the fast path and its envelope fits)."""
    rng = np.random.default_rng(42 + dup)
    n_keys = 12
    bk = rng.integers(1, n_keys, size=1200, dtype=np.int32)
    pk = np.repeat(rng.integers(1, n_keys, size=16, dtype=np.int32), dup)
    rng.shuffle(pk)
    ht = build(jnp.asarray(bk))
    state, total_a, nonzero_a = mj.probe_count(ht, jnp.asarray(pk))
    total, nonzero = int(total_a), int(nonzero_a)
    cap = round_up(total, 1 << 10)
    k_cap = round_up(nonzero, 1 << 10)

    r1, s1, t1, _ = mj.probe_materialize(ht, state, k_cap, cap)
    r2, s2, t2, fits = mj.probe_materialize_groups(ht, state, k_cap, cap,
                                                   profile=PROFILE)
    assert bool(fits)
    assert int(t1) == int(t2) == total
    ref = sorted(zip(np.asarray(r1[:total]).tolist(),
                     np.asarray(s1[:total]).tolist()))
    got = sorted(zip(np.asarray(r2[:total]).tolist(),
                     np.asarray(s2[:total]).tolist()))
    assert ref == got


def test_probe_base_offsets_sids():
    rng = np.random.default_rng(5)
    bk = rng.integers(1, 8, size=1024, dtype=np.int32)
    pk = rng.integers(1, 8, size=256, dtype=np.int32)
    ht = build(jnp.asarray(bk))
    state, total_a, _ = mj.probe_count(ht, jnp.asarray(pk))
    total = int(total_a)
    r0, s0, _, f0 = mj.probe_materialize_groups(ht, state, 1 << 10, 1 << 16,
                                                profile=PROFILE)
    r1, s1, _, f1 = mj.probe_materialize_groups(ht, state, 1 << 10, 1 << 16,
                                                probe_base=100,
                                                profile=PROFILE)
    assert bool(f0) and bool(f1)
    np.testing.assert_array_equal(np.asarray(s1[:total]),
                                  np.asarray(s0[:total]) + 100)
