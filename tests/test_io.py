import numpy as np
import pytest

from tpujoin.core.io import (
    load_table_dir,
    load_table_npz,
    save_table_dir,
    save_table_npz,
)
from tpujoin.core.table import Table


@pytest.fixture
def table():
    rng = np.random.default_rng(0)
    return Table.from_numpy({
        "key": rng.integers(1, 100, 1000).astype(np.int32),
        "val": rng.uniform(0, 1, 1000).astype(np.float32),
    })


def test_npz_roundtrip(table, tmp_path):
    f = tmp_path / "t.npz"
    save_table_npz(table, f)
    back = load_table_npz(f)
    for c in table.column_names:
        np.testing.assert_array_equal(np.asarray(back[c]),
                                      np.asarray(table[c]))


@pytest.mark.parametrize("mmap", [True, False])
def test_dir_roundtrip(table, tmp_path, mmap):
    d = tmp_path / "tdir"
    save_table_dir(table, d)
    back = load_table_dir(d, mmap=mmap)
    assert back.num_rows == table.num_rows
    for c in table.column_names:
        np.testing.assert_array_equal(np.asarray(back[c]),
                                      np.asarray(table[c]))


def test_loaded_table_joins(table, tmp_path):
    d = tmp_path / "tdir"
    save_table_dir(table, d)
    back = load_table_dir(d)
    from tpujoin.ops.merge_join import merge_join
    from tpujoin import oracle
    rk = np.asarray(table["key"])
    r_ids, s_ids = merge_join(np.asarray(back["key"]), rk,
                              result_pad_multiple=4096)
    assert oracle.check_join(rk, rk, r_ids, s_ids) == 1
