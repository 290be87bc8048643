import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpujoin.core.table import Table


def test_basic_properties():
    t = Table({"key": jnp.arange(10, dtype=jnp.int32),
               "val": jnp.ones(10, jnp.int32)})
    assert t.num_rows == 10
    assert set(t.column_names) == {"key", "val"}
    assert t["key"].dtype == jnp.int32


def test_ragged_rejected():
    with pytest.raises(ValueError):
        Table({"a": jnp.zeros(3), "b": jnp.zeros(4)})


def test_pytree_roundtrip_through_jit():
    t = Table({"key": jnp.arange(8, dtype=jnp.int32)})

    @jax.jit
    def bump(tab: Table) -> Table:
        return Table({n: c + 1 for n, c in tab.columns.items()})

    out = bump(t)
    np.testing.assert_array_equal(np.asarray(out["key"]), np.arange(1, 9))


def test_gather_and_select():
    t = Table({"key": jnp.asarray([5, 6, 7], jnp.int32),
               "v": jnp.asarray([50, 60, 70], jnp.int32)})
    g = t.gather(jnp.asarray([2, 0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(g["key"]), [7, 5])
    s = t.select("v")
    assert s.column_names == ("v",)


def test_arange_index():
    t = Table.arange_index(5)
    np.testing.assert_array_equal(np.asarray(t["rowid"]), np.arange(5))
