"""Table-level join API: full row materialization per the reference's
nested-loop convention (all columns, S's key copy dropped)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpujoin.core.table import Table
from tpujoin.ops.table_join import join_tables


def _tables(seed=0, n=400, m=600, dom=50):
    rng = np.random.default_rng(seed)
    r = Table({"key": jnp.asarray(rng.integers(1, dom, n), jnp.int32),
               "a": jnp.asarray(rng.integers(0, 1000, n), jnp.int32)})
    s = Table({"key": jnp.asarray(rng.integers(1, dom, m), jnp.int32),
               "b": jnp.asarray(rng.integers(0, 1000, m), jnp.int32)})
    return r, s


def test_inner_join_tables():
    r, s = _tables()
    out = join_tables(r, s, "key")
    assert set(out.column_names) == {"r_key", "r_a", "s_b"}
    rk, sk = np.asarray(r["key"]), np.asarray(s["key"])
    expected_pairs = int((rk[:, None] == sk[None, :]).sum())
    assert out.num_rows == expected_pairs
    # spot-check pairing integrity via value lookup
    ra = np.asarray(r["a"])
    a_by_key = {}
    for k, a in zip(rk, ra):
        a_by_key.setdefault(k, set()).add(a)
    out_np = out.to_numpy()
    for k, a in zip(out_np["r_key"][:200], out_np["r_a"][:200]):
        assert a in a_by_key[k]


def test_left_join_tables_covers_probe():
    r, s = _tables(dom=120)  # some unmatched keys
    out = join_tables(r, s, "key", how="left")
    assert "r_matched" in out.column_names
    matched = np.asarray(out["r_matched"])
    # unmatched rows exist and carry the flag
    sk, rk = np.asarray(s["key"]), np.asarray(r["key"])
    assert (~matched).sum() == (~np.isin(sk, rk)).sum()


def test_semi_anti_tables_partition():
    r, s = _tables()
    semi = join_tables(r, s, "key", how="semi")
    anti = join_tables(r, s, "key", how="anti")
    assert semi.num_rows + anti.num_rows == s.num_rows
    assert set(semi.column_names) == set(s.column_names)
    rk = np.asarray(r["key"])
    assert np.isin(np.asarray(semi["key"]), rk).all()
    assert not np.isin(np.asarray(anti["key"]), rk).any()


def test_multi_key_inner_tables():
    rng = np.random.default_rng(1)
    r = Table({"k1": jnp.asarray(rng.integers(1, 10, 200), jnp.int32),
               "k2": jnp.asarray(rng.integers(1, 10, 200), jnp.int32),
               "a": jnp.arange(200, dtype=jnp.int32)})
    s = Table({"k1": jnp.asarray(rng.integers(1, 10, 300), jnp.int32),
               "k2": jnp.asarray(rng.integers(1, 10, 300), jnp.int32),
               "b": jnp.arange(300, dtype=jnp.int32)})
    out = join_tables(r, s, ["k1", "k2"])
    k1r = np.asarray(r["k1"]); k2r = np.asarray(r["k2"])
    k1s = np.asarray(s["k1"]); k2s = np.asarray(s["k2"])
    expected = int(((k1r[:, None] == k1s[None, :])
                    & (k2r[:, None] == k2s[None, :])).sum())
    assert out.num_rows == expected
    np.testing.assert_array_equal(np.asarray(out["r_k1"]),
                                  k1s[np.asarray(out["s_b"])])
