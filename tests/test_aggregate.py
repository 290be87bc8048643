import numpy as np
import pytest

from tpujoin import oracle
from tpujoin.ops.aggregate import group_by_count


@pytest.mark.parametrize("n,dom,seed", [
    (1000, 30, 0),
    (4096, 4096, 1),
    (777, 1, 2),       # single group
    (100, 10**9, 3),   # mostly unique keys
])
def test_group_by_count_matches_oracle(n, dom, seed):
    keys = np.random.default_rng(seed).integers(1, dom + 1, n).astype(np.int32)
    gk, gc = group_by_count(keys, pad_multiple=256)
    ok, oc = oracle.group_by_count(keys)
    np.testing.assert_array_equal(gk, ok)
    np.testing.assert_array_equal(gc, oc)
    assert gc.sum() == n
