"""Pallas merge-count kernel vs the jnp reference implementation."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpujoin.kernels.merge_count import merge_count


def _ref(build_sorted, probe_sorted):
    lo = np.searchsorted(build_sorted, probe_sorted, side="left")
    hi = np.searchsorted(build_sorted, probe_sorted, side="right")
    return lo.astype(np.int32), (hi - lo).astype(np.int32)


@pytest.mark.parametrize("n,m,dom,seed", [
    (5000, 3000, 400, 0),     # heavy duplication, windows span chunks
    (2048, 2048, 10**9, 1),   # sparse matches
    (100, 4096, 50, 2),       # tiny build, many probes per window
    (4096, 100, 10, 3),       # tiny probe (single padded tile)
    (1024, 1024, 1, 4),       # all keys equal: one giant duplicate run
])
def test_matches_reference(n, m, dom, seed):
    rng = np.random.default_rng(seed)
    b = np.sort(rng.integers(1, dom + 1, n).astype(np.int32))
    p = np.sort(rng.integers(1, dom + 1, m).astype(np.int32))
    lo, cnt = merge_count(jnp.asarray(b), jnp.asarray(p), interpret=True)
    exp_lo, exp_cnt = _ref(b, p)
    np.testing.assert_array_equal(np.asarray(cnt), exp_cnt)
    # lo only meaningful where there are matches (rank still checked there)
    np.testing.assert_array_equal(np.asarray(lo)[exp_cnt > 0],
                                  exp_lo[exp_cnt > 0])
    # where matched, the full run [lo, lo+cnt) equals the probe key
    for j in np.nonzero(exp_cnt)[0][:50]:
        seg = b[int(lo[j]): int(lo[j]) + int(cnt[j])]
        assert (seg == p[j]).all()


def test_empty_probe_and_build():
    b = jnp.asarray(np.sort(np.random.default_rng(0).integers(1, 100, 256)
                            .astype(np.int32)))
    p_empty = jnp.asarray(np.empty(0, np.int32))
    lo, cnt = merge_count(b, p_empty, interpret=True)
    assert lo.shape == (0,) and cnt.shape == (0,)

    b_empty = jnp.asarray(np.empty(0, np.int32))
    p = jnp.asarray(np.arange(1, 100, dtype=np.int32))
    lo, cnt = merge_count(b_empty, p, interpret=True)
    assert int(jnp.sum(cnt)) == 0


def test_big_metadata_path_matches_prefetch_path():
    """The big-m variant (per-step HBM->SMEM metadata slab DMAs instead
    of scalar prefetch) must agree exactly with the default path — forced
    here with a tiny smem_tile_budget so it runs at CPU-test sizes."""
    import numpy as np
    import jax.numpy as jnp
    from tpujoin.kernels.merge_count import merge_count

    rng = np.random.default_rng(42)
    b = np.sort(rng.integers(1, 5000, 8192)).astype(np.int32)
    p = np.sort(rng.integers(1, 5000, 8192)).astype(np.int32)
    lo0, c0 = merge_count(jnp.asarray(b), jnp.asarray(p), interpret=True)
    lo1, c1 = merge_count(jnp.asarray(b), jnp.asarray(p), interpret=True,
                          smem_tile_budget=2)
    np.testing.assert_array_equal(np.asarray(lo0), np.asarray(lo1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
