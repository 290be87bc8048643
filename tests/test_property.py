"""Property sweep: randomized workloads as fuzzing (the reference's
implicit strategy — fresh random relations every run, SURVEY.md §4.4 —
made explicit and reproducible)."""
import numpy as np
import pytest

from tpujoin import oracle
import tpujoin.ops.hash_join as hj
import tpujoin.ops.merge_join as mj


def _pad_no_match(keys, target, base):
    """Pad a key column to a shared static shape with DISTINCT sentinel
    keys outside the other side's domain (they join with nothing), so all
    property seeds share compiled executables — each fresh shape costs
    ~10 s of XLA CPU compile, and the accumulated per-process compile
    state from dozens of unique shapes has been observed to abort the
    XLA:CPU compiler late in the suite."""
    pad = target - len(keys)
    fill = base - np.arange(pad, dtype=np.int32)
    return np.concatenate([keys, fill])


@pytest.mark.parametrize("seed", range(8))
def test_random_workload_sweep(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(1, 3000))
    m = int(rng.integers(1, 3000))
    dom = int(rng.integers(1, 5000))
    rk = _pad_no_match(rng.integers(1, dom + 1, n).astype(np.int32),
                       3072, -1_000_000)
    sk = _pad_no_match(rng.integers(1, dom + 1, m).astype(np.int32),
                       3072, -2_000_000)

    a = hj.hash_join(rk, sk, result_pad_multiple=512)
    b = mj.merge_join(rk, sk, result_pad_multiple=512)
    assert oracle.check_join(rk, sk, a[0], a[1]) == 1
    assert oracle.check_join(rk, sk, b[0], b[1]) == 1
    assert len(a[0]) == len(b[0])


def test_adversarial_key_values():
    # extremes of the supported domain (sentinels excluded by contract)
    rk = np.asarray([1, 2**31 - 3, -5, 0, 1, 2**31 - 3], np.int32)
    sk = np.asarray([2**31 - 3, -5, 7, 1], np.int32)
    a = hj.hash_join(rk, sk, result_pad_multiple=64)
    assert oracle.check_join(rk, sk, a[0], a[1], nested=True) == 1
    b = mj.merge_join(rk, sk, result_pad_multiple=64)
    assert oracle.check_join(rk, sk, b[0], b[1], nested=True) == 1
