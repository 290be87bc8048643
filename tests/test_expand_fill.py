"""Fill+periodic expansion kernel (kernels.expand_fill) correctness.

Same contract as kernels.expand_groups (pairs of rowIDs compared as a
multiset, reference shared_stuff/shared.cpp:167-171) — every case is
checked against a NumPy expansion oracle or against the independently-
tested expand+take path (ops.merge_join.probe_materialize).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpujoin.kernels.expand_fill import expand_fill, NBMAX, SRC_SLABS
from tpujoin.ops import merge_join as mj
from tpujoin.ops.hash_join import build
from tpujoin.utils.shapes import round_up

# small static envelope (step, gw) so interpret-mode compiles stay fast
# on CPU; every case below fits it: group heads/step < gw
PROFILE = (4096, 6)
PROF_KW = dict(zip(("step", "gw"), PROFILE))


def numpy_expand(offsets, lo, counts, sid, src, capacity):
    r = np.full(capacity, -1, np.int64)
    s = np.full(capacity, -1, np.int64)
    for o, l, c, p in zip(offsets, lo, counts, sid):
        for j in range(c):
            if o + j < capacity:
                r[o + j] = src[l + j]
                s[o + j] = p
    return r, s


def run_case(counts, lo, sid, src, capacity=None, expect_fit=True):
    """counts/lo/sid are per-run; runs with identical lo (and counts) are
    one group. lo must be non-decreasing and counts equal within a group
    (the probe_count invariant for sorted probe keys)."""
    counts = np.asarray(counts, np.int32)
    lo = np.asarray(lo, np.int32)
    sid = np.asarray(sid, np.int32)
    src = np.asarray(src, np.int32)
    # fixed 8192 granules => interpret-mode tests share compiled
    # executables (each fresh static shape costs ~15 s of XLA CPU compile)
    src = np.pad(src, (0, round_up(max(len(src), 1), 8192) - len(src)))
    offsets = (np.cumsum(counts) - counts).astype(np.int32)
    total = int(counts.sum())
    capacity = capacity or round_up(total, 8192)

    is_head = np.ones(len(lo), bool)
    is_head[1:] = lo[1:] != lo[:-1]
    goff = offsets[is_head]
    glo = lo[is_head]
    gnb = counts[is_head]
    ngroups = int(is_head.sum())

    for slab in SRC_SLABS:
        r, s, fits = expand_fill(
            jnp.asarray(offsets), jnp.asarray(sid),
            jnp.asarray(goff), jnp.asarray(glo), jnp.asarray(gnb),
            jnp.asarray(src),
            jnp.int32(len(counts)), jnp.int32(ngroups), jnp.int32(total),
            capacity, src_slab=slab, **PROF_KW)
        if bool(fits):
            break
    if not expect_fit:
        assert not bool(fits)
        return
    assert bool(fits), "case expected to fit some kernel slab size"
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


def test_group_block_spanning_steps():
    # one group's block (7500 slots > the 4096-slot test step) crossing
    # grid-step boundaries; period 1500 near the NBMAX envelope
    run_case(counts=[1500] * 5, lo=[1] * 5, sid=list(range(5)),
             src=np.arange(4000))


def test_max_period():
    run_case(counts=[NBMAX] * 3, lo=[7] * 3, sid=[2, 0, 1],
             src=np.arange(NBMAX + 512))


def test_period_above_nbmax_reports_no_fit():
    # nb > NBMAX exceeds the periodic image: must refuse, never emit
    # garbage (the caller falls back to kernels.expand_groups)
    run_case(counts=[NBMAX + 4] * 2, lo=[0] * 2, sid=[0, 1],
             src=np.arange(NBMAX + 512), expect_fit=False)


def test_capacity_padding_marks_invalid():
    counts, lo, sid = [3, 3], [0, 0], [1, 2]
    src = np.arange(16)
    run_case(counts, lo, sid, src, capacity=10)


def test_empty_result():
    r, s, fits = expand_fill(
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.ones(4, jnp.int32), jnp.arange(8, dtype=jnp.int32),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), 8, **PROF_KW)
    np.testing.assert_array_equal(np.asarray(r), -np.ones(8))
    np.testing.assert_array_equal(np.asarray(s), -np.ones(8))


def test_dense_runs_no_w_constraint():
    """Unlike expand_groups there is NO run-density envelope: hundreds of
    1-slot runs per tile must still fit (one group, np=600, nb=1)."""
    k = 600
    run_case(counts=[1] * k, lo=[3] * k,
             sid=np.random.default_rng(0).permutation(k),
             src=np.arange(16))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_randomized_groups(seed):
    """Random workloads inside the kernel's envelope (group heads per
    step < gw): gnb*gnp >= ~1400 keeps heads/step <= 3."""
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
    """Many tiny groups (1 run of 1 slot each) exceed gw: the kernel must
    refuse via fits=False rather than emit garbage."""
    k = 512
    counts = np.ones(k, np.int32)
    lo = np.arange(k, dtype=np.int32)
    offsets = np.arange(k, dtype=np.int32)
    sid = np.arange(k, dtype=np.int32)
    src = np.arange(k + 8, dtype=np.int32)
    _, _, fits = expand_fill(
        jnp.asarray(offsets), jnp.asarray(sid),
        jnp.asarray(offsets), jnp.asarray(lo), jnp.asarray(counts),
        jnp.asarray(src), jnp.int32(k), jnp.int32(k), jnp.int32(k), k,
        **PROF_KW)
    assert not bool(fits)


@pytest.mark.parametrize("dup", [16, 32])
def test_pipeline_parity_with_expand_take(dup):
    """probe_materialize_fill must equal probe_materialize as a multiset
    on a real join (heavily duplicated keys on both sides => the fill
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
    r2, s2, t2, fits = mj.probe_materialize_fill(ht, state, k_cap, cap,
                                                 profile=PROFILE)
    assert bool(fits)
    assert int(t1) == int(t2) == total
    ref = sorted(zip(np.asarray(r1[:total]).tolist(),
                     np.asarray(s1[:total]).tolist()))
    got = sorted(zip(np.asarray(r2[:total]).tolist(),
                     np.asarray(s2[:total]).tolist()))
    assert ref == got


def test_all_matched_fast_path():
    """When every probe row matches, all_matched=True skips the
    compaction sort and must produce the identical pair MULTISET (the
    sort path may order ties differently — its sort is unstable)."""
    rng = np.random.default_rng(9)
    bk = rng.integers(1, 8, size=1024, dtype=np.int32)
    pk = rng.integers(1, 8, size=256, dtype=np.int32)  # domain covered
    ht = build(jnp.asarray(bk))
    state, total_a, nonzero_a = mj.probe_count(ht, jnp.asarray(pk))
    assert int(nonzero_a) == 256
    total = int(total_a)
    # capacity must hold the full result: 1024x256 over 7 keys is ~37.5k
    # pairs (the old 1 << 15 silently truncated r0[:total] via slice
    # clamping, hiding part of the multiset from the comparison)
    assert total <= 1 << 16
    r0, s0, _, f0 = mj.probe_materialize_fill(ht, state, 1 << 10, 1 << 16,
                                              profile=PROFILE)
    r1, s1, _, f1 = mj.probe_materialize_fill(ht, state, 1 << 10, 1 << 16,
                                              profile=PROFILE,
                                              all_matched=True)
    assert bool(f0) and bool(f1)

    def pairs(r, s):
        a = np.stack([np.asarray(r[:total]), np.asarray(s[:total])], axis=1)
        return a[np.lexsort(a.T[::-1])]
    np.testing.assert_array_equal(pairs(r0, s0), pairs(r1, s1))


def test_probe_base_offsets_sids():
    rng = np.random.default_rng(5)
    bk = rng.integers(1, 8, size=1024, dtype=np.int32)
    pk = rng.integers(1, 8, size=256, dtype=np.int32)
    ht = build(jnp.asarray(bk))
    state, total_a, _ = mj.probe_count(ht, jnp.asarray(pk))
    total = int(total_a)
    r0, s0, _, f0 = mj.probe_materialize_fill(ht, state, 1 << 10, 1 << 16,
                                              profile=PROFILE)
    r1, s1, _, f1 = mj.probe_materialize_fill(ht, state, 1 << 10, 1 << 16,
                                              probe_base=100,
                                              profile=PROFILE)
    assert bool(f0) and bool(f1)
    np.testing.assert_array_equal(np.asarray(s1[:total]),
                                  np.asarray(s0[:total]) + 100)
