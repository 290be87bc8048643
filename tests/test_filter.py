"""Selection/filter: parity with the reference's stream-compaction workload
(reference Experiments/selection.mlir:61 'val < 80.0')."""
import jax.numpy as jnp
import numpy as np

from tpujoin.core.table import Table
import tpujoin.ops.filter as flt


def test_threshold_filter_matches_numpy():
    rng = np.random.default_rng(0)
    vals = rng.uniform(0, 160, 4096).astype(np.float32)
    t = Table({"val": jnp.asarray(vals),
               "rowid": jnp.arange(4096, dtype=jnp.int32)})
    out = flt.filter_table(t, lambda v: v < 80.0, "val", pad_multiple=256)
    expected_ids = np.nonzero(vals < 80.0)[0]
    got_ids = np.sort(np.asarray(out["rowid"]))
    np.testing.assert_array_equal(got_ids, expected_ids)
    np.testing.assert_array_equal(
        np.sort(np.asarray(out["val"])), np.sort(vals[vals < 80.0]))


def test_filter_preserves_order():
    vals = jnp.asarray([5, 90, 3, 91, 4], jnp.float32)
    t = Table({"val": vals, "rowid": jnp.arange(5, dtype=jnp.int32)})
    out = flt.filter_table(t, lambda v: v < 80.0, "val", pad_multiple=8)
    np.testing.assert_array_equal(np.asarray(out["rowid"]), [0, 2, 4])


def test_empty_and_full():
    t = Table({"val": jnp.arange(100, dtype=jnp.float32)})
    none = flt.filter_table(t, lambda v: v < -1.0, "val")
    assert none.num_rows == 0
    everything = flt.filter_table(t, lambda v: v < 1e9, "val", pad_multiple=128)
    assert everything.num_rows == 100


def test_fixed_capacity_device_api():
    vals = jnp.asarray(np.random.default_rng(1).uniform(0, 160, 1000),
                       jnp.float32)
    ids, total = flt.filter_device(vals, 80.0, capacity=1024)
    total = int(total)
    assert total == int((np.asarray(vals) < 80.0).sum())
    assert np.all(np.asarray(ids[total:]) == -1)
    assert np.all(np.asarray(vals)[np.asarray(ids[:total])] < 80.0)
