import jax.numpy as jnp
import numpy as np

from tpujoin.core.table import Table
from tpujoin.ops.radix import hash32, partition_ids, radix_partition, radix_sort
from tpujoin.ops.sort import sort_by_key, sort_with_ids


def test_sort_with_ids():
    keys = np.asarray([5, -3, 5, 1, 0], np.int32)
    sk, sid = sort_with_ids(jnp.asarray(keys))
    np.testing.assert_array_equal(np.asarray(sk), np.sort(keys))
    np.testing.assert_array_equal(keys[np.asarray(sid)], np.asarray(sk))


def test_sort_by_key_table():
    t = Table({"key": jnp.asarray([3, 1, 2], jnp.int32),
               "v": jnp.asarray([30, 10, 20], jnp.int32)})
    s = sort_by_key(t)
    np.testing.assert_array_equal(np.asarray(s["key"]), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(s["v"]), [10, 20, 30])


def test_radix_sort_including_negatives():
    rng = np.random.default_rng(0)
    keys = rng.integers(-2**31, 2**31 - 1, 5000).astype(np.int32)
    sk, perm = radix_sort(jnp.asarray(keys))
    np.testing.assert_array_equal(np.asarray(sk), np.sort(keys))
    np.testing.assert_array_equal(keys[np.asarray(perm)], np.asarray(sk))


def test_partition_ids_uniform_and_deterministic():
    keys = jnp.arange(1, 100_001, dtype=jnp.int32)
    pid = np.asarray(partition_ids(keys, 8))
    assert pid.min() >= 0 and pid.max() < 8
    counts = np.bincount(pid, minlength=8)
    assert counts.min() > 0.8 * counts.mean()  # hashing decorrelates
    np.testing.assert_array_equal(pid, np.asarray(partition_ids(keys, 8)))


def test_hash32_equal_keys_collide():
    a = hash32(jnp.asarray([42, 42, 7], jnp.int32))
    a = np.asarray(a)
    assert a[0] == a[1] and a[0] != a[2]


def test_radix_partition_csr_invariants():
    rng = np.random.default_rng(1)
    keys = rng.integers(1, 1000, 2048).astype(np.int32)
    ids = np.arange(2048, dtype=np.int32)
    P = 16
    pkeys, pids, offsets, counts = radix_partition(
        jnp.asarray(keys), jnp.asarray(ids), P)
    pkeys, pids = np.asarray(pkeys), np.asarray(pids)
    offsets, counts = np.asarray(offsets), np.asarray(counts)
    assert counts.sum() == 2048
    np.testing.assert_array_equal(offsets, np.cumsum(counts) - counts)
    # every row is present exactly once and lands in its hash partition
    np.testing.assert_array_equal(np.sort(pids), ids)
    expected_pid = np.asarray(partition_ids(jnp.asarray(keys), P))
    for p in range(P):
        seg = pids[offsets[p]: offsets[p] + counts[p]]
        np.testing.assert_array_equal(expected_pid[seg], p)
    # reorder preserves key/id pairing
    np.testing.assert_array_equal(keys[pids], pkeys)
