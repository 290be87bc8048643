import jax.numpy as jnp
import numpy as np

from tpujoin import oracle
from tpujoin.core.table import Table
import tpujoin.ops.hash_join as hj
from tpujoin.ops.nested_loop_join import materialize_join_rows, nested_loop_join


def test_parity_with_oracle_and_hash_join():
    rng = np.random.default_rng(0)
    rk = rng.integers(1, 50, 300).astype(np.int32)
    sk = rng.integers(1, 50, 200).astype(np.int32)
    r1, s1 = nested_loop_join(rk, sk, pad_multiple=1024)
    assert oracle.check_join(rk, sk, r1, s1, nested=True) == 1
    r2, s2 = hj.hash_join(rk, sk, result_pad_multiple=1024)
    k1 = np.lexsort((s1, r1))
    k2 = np.lexsort((s2, r2))
    np.testing.assert_array_equal(r1[k1], r2[k2])
    np.testing.assert_array_equal(s1[k1], s2[k2])


def test_empty():
    r, s = nested_loop_join(np.asarray([1, 2], np.int32),
                            np.asarray([3, 4], np.int32))
    assert len(r) == 0 and len(s) == 0


def test_full_row_materialization_drops_duplicate_key():
    # reference nested-loop.mlir:170-183: result rows carry all columns of
    # both tables except S's copy of the join key
    r = Table({"key": jnp.asarray([1, 2, 3], jnp.int32),
               "a": jnp.asarray([10, 20, 30], jnp.int32)})
    s = Table({"key": jnp.asarray([2, 3, 2], jnp.int32),
               "b": jnp.asarray([200, 300, 201], jnp.int32)})
    rk, sk = np.asarray(r["key"]), np.asarray(s["key"])
    r_ids, s_ids = nested_loop_join(rk, sk, pad_multiple=16)
    out = materialize_join_rows(r, s, r_ids, s_ids)
    assert set(out.column_names) == {"r_key", "r_a", "s_b"}
    np.testing.assert_array_equal(np.asarray(out["r_key"]), rk[r_ids])
    np.testing.assert_array_equal(np.asarray(out["s_b"]),
                                  np.asarray(s["b"])[s_ids])
