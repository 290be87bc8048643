"""Factorized (RLE) join result + its native oracle check."""
import numpy as np
import pytest

from tpujoin import oracle
from tpujoin.ops.merge_join import merge_join_rle


def _rand(n, lo, hi, seed):
    return np.random.default_rng(seed).integers(lo, hi + 1, n).astype(np.int32)


@pytest.mark.parametrize("n,m,dom,seed", [
    (2000, 2000, 100, 0),   # dup-heavy (the RLE-worthwhile regime)
    (1000, 1500, 10**9, 1), # sparse
    (512, 512, 1, 2),       # one giant run
])
def test_rle_result_is_exact(n, m, dom, seed):
    rk = _rand(n, 1, dom, seed)
    sk = _rand(m, 1, dom, seed + 5)
    pid, lo, cnt, sbi = merge_join_rle(rk, sk, row_pad_multiple=1024)
    assert oracle.check_join_rle(rk, sk, sbi, pid, lo, cnt) == 1
    # expansion equals the pairwise driver's multiset
    res_r = np.concatenate([sbi[l:l + c] for l, c in zip(lo, cnt)]) \
        if len(pid) else np.empty(0, np.int32)
    res_s = np.repeat(pid, cnt) if len(pid) else np.empty(0, np.int32)
    assert oracle.check_join(rk, sk, res_r, res_s) == 1


def test_rle_empty():
    rk = np.arange(1, 100, dtype=np.int32)
    sk = np.arange(1000, 1100, dtype=np.int32)
    pid, lo, cnt, sbi = merge_join_rle(rk, sk)
    assert len(pid) == 0
    assert oracle.check_join_rle(rk, sk, sbi, pid, lo, cnt) == 1


def test_rle_oracle_rejects_wrong_run():
    rk = np.asarray([1, 2, 2], np.int32)
    sk = np.asarray([2], np.int32)
    sbi = np.asarray([0, 1, 2], np.int32)  # sorted by key: 1,2,2 -> ids 0,1,2
    # correct: probe row 0 matches build rows {1,2}
    assert oracle.check_join_rle(rk, sk, sbi,
                                 np.asarray([0], np.int32),
                                 np.asarray([1], np.int32),
                                 np.asarray([2], np.int32)) == 1
    # wrong lo -> run {0,1} != {1,2}
    assert oracle.check_join_rle(rk, sk, sbi,
                                 np.asarray([0], np.int32),
                                 np.asarray([0], np.int32),
                                 np.asarray([2], np.int32)) == 0
    # wrong total -> -1
    assert oracle.check_join_rle(rk, sk, sbi,
                                 np.asarray([0], np.int32),
                                 np.asarray([1], np.int32),
                                 np.asarray([1], np.int32)) == -1
