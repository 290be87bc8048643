import numpy as np
import pytest

from tpujoin import oracle


def test_native_library_builds():
    assert oracle.have_native(), "native oracle failed to build"


def test_check_contract_match_mismatch_size():
    rk = np.asarray([1, 2, 2, 3], np.int32)
    sk = np.asarray([2, 3, 9], np.int32)
    # expected pairs: (1,0),(2,0),(3,1)
    good_r = np.asarray([1, 2, 3], np.int32)
    good_s = np.asarray([0, 0, 1], np.int32)
    assert oracle.check_join(rk, sk, good_r, good_s) == 1
    # permuted order still matches (multiset semantics)
    assert oracle.check_join(rk, sk, good_r[::-1].copy(),
                             good_s[::-1].copy()) == 1
    # wrong pair -> 0 (reference shared.cpp:167-171)
    bad_r = np.asarray([1, 2, 0], np.int32)
    assert oracle.check_join(rk, sk, bad_r, good_s) == 0
    # wrong size -> -1 (reference shared.cpp:158-160)
    assert oracle.check_join(rk, sk, good_r[:2], good_s[:2]) == -1


def test_nested_and_sorted_oracles_agree():
    rng = np.random.default_rng(0)
    rk = rng.integers(1, 40, 500).astype(np.int32)
    sk = rng.integers(1, 40, 300).astype(np.int32)
    assert oracle.join_count(rk, sk, nested=True) == \
        oracle.join_count(rk, sk, nested=False)


def test_join_count():
    rk = np.asarray([7, 7, 7], np.int32)
    sk = np.asarray([7, 7], np.int32)
    assert oracle.join_count(rk, sk) == 6
