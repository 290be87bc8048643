"""Pallas expansion kernel vs a numpy reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpujoin.kernels.expand import expand


def _make_case(rng, k, max_count, lo_dom):
    counts = rng.integers(1, max_count + 1, k).astype(np.int32)
    offsets = (np.cumsum(counts) - counts).astype(np.int32)
    lo = np.sort(rng.integers(0, lo_dom, k)).astype(np.int32)
    sid = rng.permutation(k).astype(np.int32)
    total = int(counts.sum())
    return counts, offsets, lo, sid, total


def _ref(counts, offsets, lo, sid, total):
    bpos = np.empty(total, np.int32)
    s = np.empty(total, np.int32)
    for r in range(len(counts)):
        for j in range(counts[r]):
            t = offsets[r] + j
            bpos[t] = lo[r] + j
            s[t] = sid[r]
    return bpos, s


@pytest.mark.parametrize("k,max_count,seed", [
    (1000, 1, 0),      # all singleton matches
    (300, 20, 1),      # mixed run lengths
    (1, 5000, 2),      # one giant run (skew)
    (2000, 3, 3),
])
def test_matches_reference(k, max_count, seed):
    rng = np.random.default_rng(seed)
    counts, offsets, lo, sid, total = _make_case(rng, k, max_count, 10**6)
    bpos, sout = expand(jnp.asarray(offsets), jnp.asarray(lo),
                        jnp.asarray(sid), capacity=total, interpret=True)
    exp_b, exp_s = _ref(counts, offsets, lo, sid, total)
    np.testing.assert_array_equal(np.asarray(bpos), exp_b)
    np.testing.assert_array_equal(np.asarray(sout), exp_s)


def test_capacity_padding_is_maskable():
    rng = np.random.default_rng(4)
    counts, offsets, lo, sid, total = _make_case(rng, 100, 4, 1000)
    cap = total + 333
    bpos, sout = expand(jnp.asarray(offsets), jnp.asarray(lo),
                        jnp.asarray(sid), capacity=cap, interpret=True)
    exp_b, exp_s = _ref(counts, offsets, lo, sid, total)
    np.testing.assert_array_equal(np.asarray(bpos)[:total], exp_b)
    np.testing.assert_array_equal(np.asarray(sout)[:total], exp_s)
