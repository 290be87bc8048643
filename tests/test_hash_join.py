"""Hash join: multiset parity with the oracle across sizes / seeds /
selectivities — the engine analogue of the reference's per-run check
(reference join_v1.mlir:628-632)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpujoin import oracle
import tpujoin.ops.hash_join as hj


def _rand(n, lo, hi, seed):
    return np.random.default_rng(seed).integers(lo, hi + 1, n).astype(np.int32)


@pytest.mark.parametrize("n,m,dom,seed", [
    (100, 100, 20, 0),       # heavy duplication
    (1000, 500, 1000, 1),    # ~1 match/row
    (513, 1023, 7, 2),       # non-power-of-2, tiny domain
    (2048, 2048, 10**9, 3),  # almost no matches
])
def test_multiset_parity(n, m, dom, seed):
    rk = _rand(n, 1, dom, seed)
    sk = _rand(m, 1, dom, seed + 100)
    r_ids, s_ids = hj.hash_join(rk, sk, result_pad_multiple=256)
    assert oracle.check_join(rk, sk, r_ids, s_ids) == 1
    # results reference actual matching keys
    if len(r_ids):
        np.testing.assert_array_equal(rk[r_ids], sk[s_ids])


def test_empty_result():
    rk = np.arange(1, 101, dtype=np.int32)
    sk = np.arange(1001, 1101, dtype=np.int32)
    r_ids, s_ids = hj.hash_join(rk, sk)
    assert len(r_ids) == 0 and len(s_ids) == 0
    assert oracle.check_join(rk, sk, r_ids, s_ids) == 1


def test_chunked_probe_matches_unchunked():
    rk = _rand(4000, 1, 300, 5)
    sk = _rand(4000, 1, 300, 6)
    a = hj.hash_join(rk, sk, result_pad_multiple=512)
    b = hj.hash_join(rk, sk, probe_chunk_rows=700, result_pad_multiple=512)
    sa = np.lexsort((a[1], a[0]))
    sb = np.lexsort((b[1], b[0]))
    np.testing.assert_array_equal(a[0][sa], b[0][sb])
    np.testing.assert_array_equal(a[1][sa], b[1][sb])
    assert oracle.check_join(rk, sk, b[0], b[1]) == 1


def test_all_equal_keys():
    # worst-case skew: every row matches every row
    rk = np.full(64, 7, np.int32)
    sk = np.full(32, 7, np.int32)
    r_ids, s_ids = hj.hash_join(rk, sk, result_pad_multiple=4096)
    assert len(r_ids) == 64 * 32
    assert oracle.check_join(rk, sk, r_ids, s_ids, nested=True) == 1


def test_device_fixed_capacity_api():
    rk = jnp.asarray(_rand(256, 1, 50, 8))
    sk = jnp.asarray(_rand(256, 1, 50, 9))
    r_ids, s_ids, total, fits = hj.hash_join_device(rk, sk, capacity=4096)
    assert bool(fits)
    total = int(total)
    assert total == oracle.join_count(np.asarray(rk), np.asarray(sk))
    # pad slots are -1, valid slots within range
    assert np.all(np.asarray(r_ids[total:]) == -1)
    assert oracle.check_join(np.asarray(rk), np.asarray(sk),
                             np.asarray(r_ids[:total]),
                             np.asarray(s_ids[:total])) == 1


def test_count_phase_exact():
    rk = _rand(1000, 1, 100, 10)
    sk = _rand(777, 1, 100, 11)
    ht = hj.build(jnp.asarray(rk))
    _, counts = hj.probe_count(ht, jnp.asarray(sk))
    expected = np.asarray([(rk == k).sum() for k in sk])
    np.testing.assert_array_equal(np.asarray(counts), expected)
