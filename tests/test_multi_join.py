"""Multi-column join + filter pushdown (BASELINE config 2 capability)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpujoin.core.table import Table
from tpujoin.ops.multi_join import combined_key, hash_join_multi, join_with_pushdown


def _np_multi_join(r_cols, s_cols):
    """O(n*m) numpy oracle over composite keys."""
    n, m = len(r_cols[0]), len(s_cols[0])
    eq = np.ones((n, m), bool)
    for rc, sc in zip(r_cols, s_cols):
        eq &= rc[:, None] == sc[None, :]
    ri, si = np.nonzero(eq)
    return ri.astype(np.int32), si.astype(np.int32)


def _sorted_pairs(r, s):
    k = np.lexsort((s, r))
    return r[k], s[k]


@pytest.mark.parametrize("seed,dom", [(0, 8), (1, 40)])
def test_two_column_join_exact(seed, dom):
    rng = np.random.default_rng(seed)
    r = Table({"a": jnp.asarray(rng.integers(1, dom, 500), jnp.int32),
               "b": jnp.asarray(rng.integers(1, dom, 500), jnp.int32)})
    s = Table({"a": jnp.asarray(rng.integers(1, dom, 400), jnp.int32),
               "b": jnp.asarray(rng.integers(1, dom, 400), jnp.int32)})
    got_r, got_s = hash_join_multi(r, s, ["a", "b"], result_pad_multiple=1024)
    exp_r, exp_s = _np_multi_join(
        [np.asarray(r["a"]), np.asarray(r["b"])],
        [np.asarray(s["a"]), np.asarray(s["b"])])
    np.testing.assert_array_equal(_sorted_pairs(got_r, got_s),
                                  _sorted_pairs(exp_r, exp_s))


def test_single_column_reduces_to_plain_join():
    rng = np.random.default_rng(2)
    rk = rng.integers(1, 30, 300).astype(np.int32)
    sk = rng.integers(1, 30, 300).astype(np.int32)
    r = Table({"key": jnp.asarray(rk)})
    s = Table({"key": jnp.asarray(sk)})
    got_r, got_s = hash_join_multi(r, s, "key", result_pad_multiple=4096)
    from tpujoin import oracle
    assert oracle.check_join(rk, sk, got_r, got_s) == 1


def test_collision_pairs_are_filtered():
    # craft tuples whose combined hashes are forced through the same join
    # path: many rows share column a but differ in b — every (a-match,
    # b-mismatch) candidate must be dropped by the exact post-filter
    r = Table({"a": jnp.full((64,), 5, jnp.int32),
               "b": jnp.arange(64, dtype=jnp.int32)})
    s = Table({"a": jnp.full((64,), 5, jnp.int32),
               "b": jnp.arange(64, dtype=jnp.int32)})
    got_r, got_s = hash_join_multi(r, s, ["a", "b"], result_pad_multiple=256)
    assert len(got_r) == 64
    np.testing.assert_array_equal(np.sort(got_r), np.arange(64))
    np.testing.assert_array_equal(got_r, got_s)  # only b==b pairs survive


def test_combined_key_deterministic_and_order_sensitive():
    t = Table({"a": jnp.asarray([1, 2], jnp.int32),
               "b": jnp.asarray([2, 1], jnp.int32)})
    k_ab = np.asarray(combined_key(t, ["a", "b"]))
    k_ba = np.asarray(combined_key(t, ["b", "a"]))
    # row0 (1,2) vs row1 (2,1): under [a,b] they differ; swapping column
    # order maps row0's key to row1's — order sensitivity means (1,2)!=(2,1)
    assert k_ab[0] != k_ab[1]
    assert k_ab[0] == k_ba[1] and k_ab[1] == k_ba[0]


def test_filter_pushdown_ids_refer_to_original_tables():
    rng = np.random.default_rng(3)
    rk = rng.integers(1, 20, 400).astype(np.int32)
    sk = rng.integers(1, 20, 300).astype(np.int32)
    rv = rng.uniform(0, 160, 400).astype(np.float32)
    sv = rng.uniform(0, 160, 300).astype(np.float32)
    r = Table({"key": jnp.asarray(rk), "val": jnp.asarray(rv)})
    s = Table({"key": jnp.asarray(sk), "val": jnp.asarray(sv)})
    got_r, got_s = join_with_pushdown(
        r, s, "key",
        r_pred=lambda v: v < 80.0, r_pred_col="val",
        s_pred=lambda v: v < 40.0, s_pred_col="val",
        result_pad_multiple=1024)
    # numpy reference: filter then join, ids in original space
    rmask, smask = rv < 80.0, sv < 40.0
    exp = [(i, j) for i in np.nonzero(rmask)[0] for j in np.nonzero(smask)[0]
           if rk[i] == sk[j]]
    exp_r = np.asarray([p[0] for p in exp], np.int32)
    exp_s = np.asarray([p[1] for p in exp], np.int32)
    np.testing.assert_array_equal(_sorted_pairs(got_r, got_s),
                                  _sorted_pairs(exp_r, exp_s))
    # pushdown semantics: every surviving pair satisfies both predicates
    assert np.all(rv[got_r] < 80.0) and np.all(sv[got_s] < 40.0)


def test_pushdown_empty_side():
    r = Table({"key": jnp.asarray([1, 2, 3], jnp.int32),
               "val": jnp.asarray([100.0, 100.0, 100.0], jnp.float32)})
    s = Table({"key": jnp.asarray([1, 2], jnp.int32),
               "val": jnp.asarray([1.0, 1.0], jnp.float32)})
    got_r, got_s = join_with_pushdown(
        r, s, "key", r_pred=lambda v: v < 80.0, r_pred_col="val")
    assert len(got_r) == 0 and len(got_s) == 0
