"""Distributed shuffle hash join over a device mesh.

The scale-out path BASELINE.json requires (configs 3-5) and the reference
explicitly lacks (single GPU; "Partitioned Hash-Join" / "Relations that
don't fit on GPU" are future work, reference projectDescription.md:23-24).

Design (TPU-native, per the scaling-book recipe — mesh + sharding
annotations + XLA collectives):

1. Tables are row-sharded across a 1-D mesh. Each device assigns every local
   row a target device with a multiplicative hash of its key
   (:func:`tpujoin.ops.radix.partition_ids`) — co-partitioning: equal keys
   land on the same device.
2. Because ``all_to_all`` needs static shapes, each device compacts its rows
   into a fixed-capacity [P, C] send buffer (per-peer capacity C with slack
   over the expected n_local/P; unused slots carry id = -1). Ragged-to-fixed
   is the TPU answer to the reference's exact-size memcpys.
3. One ``jax.lax.all_to_all`` per table exchanges the buffers over ICI/DCN.
4. Each device joins its received R rows against its received S rows with
   the SAME v2 Pallas sort-merge pipeline as the single-chip headline
   (sort probe -> kernels.merge_count -> compact -> kernels.expand,
   :mod:`tpujoin.ops.merge_join`), at a static local result capacity; for
   high-duplication shards :func:`distributed_hash_join_rle` returns the
   factorized run-length result instead (no pair-capacity at all). The
   Pallas kernels self-select interpret mode on the CPU backend, so the
   emulated-mesh tests exercise the identical program.
5. ``psum`` reduces the exact global result count (the distributed analogue
   of the reference's result-size memcpy, join_v1.mlir:140-144).

Reserved sentinels in this path: build keys must not equal INT32_MAX and
probe keys must not equal INT32_MIN (both far outside the benchmark key
domain [1, 1e9], reference shared.cpp:13-14).

Overflow of a send buffer or the local result capacity is *detected* (max
over counts, psum'd out) and surfaced to the driver, which retries with more
slack — never silently dropped. Heavy-hitter splitting for Zipf skew builds
on this: see :func:`recommended_slack`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpujoin.ops.radix import partition_ids
from tpujoin.parallel.mesh import ROW_AXIS, make_mesh
from tpujoin.utils.shapes import cdiv, round_up

_BUILD_PAD_KEY = jnp.int32(0x7FFFFFFF)   # sorts last, never matches a probe
_PROBE_PAD_KEY = jnp.int32(-0x80000000)  # never matches a build key
_SS = "sort"


def _send_buffer(keys, ids, num_peers: int, capacity: int, pad_key):
    """Compact local rows into a [num_peers, capacity] buffer by target
    device. Rows with id < 0 (driver padding) are dropped. Returns
    (buf_keys, buf_ids, max_count) — max_count > capacity means overflow.

    After the partition sort each peer's rows are CONTIGUOUS, so the
    ragged->fixed re-layout is ``num_peers`` big dynamic-slice copies
    (bandwidth-bound) — never a [P, C] element gather, which at XLA's
    ~73M idx/s would cost seconds per 100M-row shard on TPU."""
    pid = partition_ids(keys, num_peers)
    pid = jnp.where(ids < 0, jnp.int32(num_peers), pid)  # padding sorts last
    spid, skeys, sids = jax.lax.sort((pid, keys, ids), num_keys=1)
    peers = jnp.arange(num_peers, dtype=jnp.int32)
    starts = jnp.searchsorted(spid, peers, side="left", method=_SS).astype(jnp.int32)
    ends = jnp.searchsorted(spid, peers, side="right", method=_SS).astype(jnp.int32)
    counts = ends - starts
    # pad the tail so no slice ever clamps (starts <= n, slice len = C)
    skeys_p = jnp.concatenate(
        [skeys, jnp.full((capacity,), pad_key, jnp.int32)])
    sids_p = jnp.concatenate([sids, jnp.full((capacity,), -1, jnp.int32)])
    c = jnp.arange(capacity, dtype=jnp.int32)
    rows_k, rows_i = [], []
    for p in range(num_peers):
        k_p = jax.lax.dynamic_slice_in_dim(skeys_p, starts[p], capacity)
        i_p = jax.lax.dynamic_slice_in_dim(sids_p, starts[p], capacity)
        valid = c < counts[p]
        rows_k.append(jnp.where(valid, k_p, pad_key))
        rows_i.append(jnp.where(valid, i_p, -1))
    buf_keys = jnp.stack(rows_k)
    buf_ids = jnp.stack(rows_i)
    return buf_keys, buf_ids, jnp.max(counts)


def _sort_build(bk, bid):
    """Sort received build rows once (pad rows sink to the tail)."""
    bk = jnp.where(bid < 0, _BUILD_PAD_KEY, bk)
    return jax.lax.sort((bk, bid), num_keys=1)


def _count_sorted(sk, pk, pid_):
    """Count phase of the local join on the v2 Pallas pipeline: sort the
    received probe rows once, then kernels.merge_count against the sorted
    build keys (the same sort-merge engine that earns the single-chip
    headline — VERDICT r2 flagged the old searchsorted probe as the
    6 s-class design). Returns (psk, ppid, lo, cnt) in sorted-probe
    order."""
    from tpujoin.kernels.merge_count import merge_count

    pk_eff = jnp.where(pid_ < 0, _PROBE_PAD_KEY, pk)
    psk, ppid = jax.lax.sort((pk_eff, pid_), num_keys=1)
    lo, cnt = merge_count(sk, psk)
    return psk, ppid, lo, cnt


def _probe_sorted(sk, sid, pk, pid_, capacity: int):
    """Probe pre-sorted build rows at static result capacity: v2 pipeline
    (sort probe -> Pallas merge_count -> stable-sort compaction -> Pallas
    expand). Mirrors ops.merge_join.probe_materialize with the received
    buffers' global ids carried through."""
    from tpujoin.kernels.expand import expand

    _, ppid, lo, cnt = _count_sorted(sk, pk, pid_)
    # compact3 idiom (see ops.merge_join._compact): flag folded into the
    # key, tail lo clamped out of the sentinel
    mlo = jnp.where(cnt > 0, lo, jnp.int32(0x7FFFFFFF))
    mlo_c, cnt_c, sid_c = jax.lax.sort((mlo, cnt, ppid), num_keys=1)
    lo_c = jnp.where(cnt_c > 0, mlo_c, 0)
    offs_c = jnp.cumsum(cnt_c) - cnt_c
    total = jnp.sum(cnt)
    bpos, sid_out = expand(offs_c, lo_c, sid_c, capacity)
    t = jnp.arange(capacity, dtype=jnp.int32)
    valid = t < total
    bpos = jnp.clip(bpos, 0, sk.shape[0] - 1)
    r_ids = jnp.where(valid, jnp.take(sid, bpos), -1)
    s_ids = jnp.where(valid, sid_out, -1)
    return r_ids.astype(jnp.int32), s_ids.astype(jnp.int32), total.astype(jnp.int32)


def _local_join(bk, bid, pk, pid_, capacity: int):
    """Sorted-build equi-join of the received rows, at static result
    capacity. Mirrors ops.hash_join.{build,probe_count,probe_materialize}
    but carries explicit global row ids through the exchange."""
    sk, sid = _sort_build(bk, bid)
    return _probe_sorted(sk, sid, pk, pid_, capacity)


def make_shuffle_join_pipelined_fn(
    mesh,
    send_cap_r: int,
    send_cap_s: int,
    chunk_result_cap: int,
    num_chunks: int = 2,
):
    """Pipelined shuffle-join step: the probe side is exchanged in
    ``num_chunks`` slices, and slice c's all_to_all carries no data
    dependency on slice c-1's local join — XLA's async collectives can
    overlap the ICI/DCN exchange with probe compute (the double-buffered
    overlap BASELINE.json's north star asks for). The build side is
    exchanged and sorted once up front.

    Local probe shards must be divisible by num_chunks (driver pads).
    Returns per-chunk padded results stacked on a leading axis, per-device
    per-chunk counts, and the overflow telemetry vector."""
    num_peers = mesh.shape[ROW_AXIS]

    def shard_fn(r_keys, r_ids, s_keys, s_ids):
        rbk, rbi, r_max = _send_buffer(r_keys, r_ids, num_peers, send_cap_r,
                                       _BUILD_PAD_KEY)
        rbk = jax.lax.all_to_all(rbk, ROW_AXIS, 0, 0)
        rbi = jax.lax.all_to_all(rbi, ROW_AXIS, 0, 0)
        sk, sid = _sort_build(rbk.reshape(-1), rbi.reshape(-1))

        m_loc = s_keys.shape[0]
        chunk = m_loc // num_chunks
        sends = []
        s_max = jnp.int32(0)
        for c in range(num_chunks):
            ck = jax.lax.dynamic_slice_in_dim(s_keys, c * chunk, chunk)
            ci = jax.lax.dynamic_slice_in_dim(s_ids, c * chunk, chunk)
            bk_c, bi_c, mx = _send_buffer(ck, ci, num_peers, send_cap_s,
                                          _PROBE_PAD_KEY)
            sends.append((bk_c, bi_c))
            s_max = jnp.maximum(s_max, mx)

        # software pipeline: issue exchange c+1 before joining chunk c, so
        # the collective and the local probe have no mutual dependency
        recvs = [None] * num_chunks
        recvs[0] = (jax.lax.all_to_all(sends[0][0], ROW_AXIS, 0, 0),
                    jax.lax.all_to_all(sends[0][1], ROW_AXIS, 0, 0))
        outs = []
        totals = []
        for c in range(num_chunks):
            if c + 1 < num_chunks:
                recvs[c + 1] = (
                    jax.lax.all_to_all(sends[c + 1][0], ROW_AXIS, 0, 0),
                    jax.lax.all_to_all(sends[c + 1][1], ROW_AXIS, 0, 0))
            pk_c, pi_c = recvs[c]
            r_out, s_out, tot = _probe_sorted(
                sk, sid, pk_c.reshape(-1), pi_c.reshape(-1),
                chunk_result_cap)
            outs.append((r_out, s_out))
            totals.append(tot)

        r_stack = jnp.concatenate([o[0] for o in outs])
        s_stack = jnp.concatenate([o[1] for o in outs])
        totals = jnp.stack(totals)
        ovf = jnp.stack([
            jax.lax.pmax(r_max, ROW_AXIS),
            jax.lax.pmax(s_max, ROW_AXIS),
            jax.lax.pmax(jnp.max(totals), ROW_AXIS),
        ])
        return r_stack, s_stack, totals, ovf

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)),
        out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P()),
        # Pallas kernels inside the shard have no vma annotations
        check_vma=False,
    )
    return jax.jit(fn)


def make_shuffle_join_fn(
    mesh,
    send_cap_r: int,
    send_cap_s: int,
    local_result_cap: int,
):
    """Build the shard_map'd distributed join step for a given mesh + static
    capacities. Returns fn(r_keys, r_ids, s_keys, s_ids) operating on
    row-sharded global arrays, yielding row-sharded padded results plus
    per-device exact counts and an overflow telemetry vector."""
    num_peers = mesh.shape[ROW_AXIS]

    def shard_fn(r_keys, r_ids, s_keys, s_ids):
        rbk, rbi, r_max = _send_buffer(r_keys, r_ids, num_peers, send_cap_r,
                                       _BUILD_PAD_KEY)
        sbk, sbi, s_max = _send_buffer(s_keys, s_ids, num_peers, send_cap_s,
                                       _PROBE_PAD_KEY)
        # exchange: received[q] = what device q sent to me (ICI/DCN all_to_all)
        rbk = jax.lax.all_to_all(rbk, ROW_AXIS, 0, 0)
        rbi = jax.lax.all_to_all(rbi, ROW_AXIS, 0, 0)
        sbk = jax.lax.all_to_all(sbk, ROW_AXIS, 0, 0)
        sbi = jax.lax.all_to_all(sbi, ROW_AXIS, 0, 0)
        r_ids_out, s_ids_out, local_total = _local_join(
            rbk.reshape(-1), rbi.reshape(-1),
            sbk.reshape(-1), sbi.reshape(-1),
            local_result_cap,
        )
        # telemetry: [send_r overflow, send_s overflow, result overflow]
        ovf = jnp.stack([
            jax.lax.pmax(r_max, ROW_AXIS),
            jax.lax.pmax(s_max, ROW_AXIS),
            jax.lax.pmax(local_total, ROW_AXIS),
        ])
        return r_ids_out, s_ids_out, local_total[None], ovf

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)),
        out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P()),
        # Pallas kernels inside the shard have no vma annotations
        check_vma=False,
    )
    return jax.jit(fn)


def make_shuffle_join_rle_fn(mesh, send_cap_r: int, send_cap_s: int):
    """Factorized (RLE) distributed join step: each device returns its
    local join in run-length form — (probe_id, lo, cnt) per received probe
    row over its sorted build ids — instead of materialized pairs. The
    distributed analogue of ops.merge_join.probe_rle: on high-duplication
    shards the materialized local result can exceed any static
    local_result_cap (the single-chip Zipf config reaches ~5e11 pairs),
    while the RLE form is always one fixed-size buffer per device.

    Returns fn(...) -> (ppid, lo, cnt, build_ids, pair_lo32, pair_hi30,
    ovf): per-device RLE columns (zero-count rows included — they expand
    to nothing), the device's sorted build ids, the exact per-device pair
    count split into two i32 halves (lo 30 bits / high bits, keeping the
    shard_map boundary x32 while Zipf totals exceed 2^31), and send-buffer
    overflow telemetry."""
    num_peers = mesh.shape[ROW_AXIS]

    def shard_fn(r_keys, r_ids, s_keys, s_ids):
        rbk, rbi, r_max = _send_buffer(r_keys, r_ids, num_peers, send_cap_r,
                                       _BUILD_PAD_KEY)
        sbk, sbi, s_max = _send_buffer(s_keys, s_ids, num_peers, send_cap_s,
                                       _PROBE_PAD_KEY)
        rbk = jax.lax.all_to_all(rbk, ROW_AXIS, 0, 0)
        rbi = jax.lax.all_to_all(rbi, ROW_AXIS, 0, 0)
        sbk = jax.lax.all_to_all(sbk, ROW_AXIS, 0, 0)
        sbi = jax.lax.all_to_all(sbi, ROW_AXIS, 0, 0)
        sk, sid = _sort_build(rbk.reshape(-1), rbi.reshape(-1))
        _, ppid, lo, cnt = _count_sorted(sk, sbk.reshape(-1),
                                         sbi.reshape(-1))
        with jax.enable_x64(True):
            pairs = jnp.sum(cnt.astype(jnp.int64))
            pair_lo = (pairs & jnp.int64((1 << 30) - 1)).astype(jnp.int32)
            pair_hi = (pairs >> 30).astype(jnp.int32)
        ovf = jnp.stack([jax.lax.pmax(r_max, ROW_AXIS),
                         jax.lax.pmax(s_max, ROW_AXIS)])
        return (ppid, lo, cnt, sid, pair_lo[None], pair_hi[None], ovf)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)),
        out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS),
                   P(ROW_AXIS), P(ROW_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_hash_join_rle(
    r_keys,
    s_keys,
    *,
    mesh=None,
    slack: float = 2.0,
    max_retries: int = 3,
):
    """Driver: distributed join in factorized (RLE) form — the scale-out
    path for high-duplication workloads where materialized pairs would not
    fit any per-device result buffer.

    Returns (shards, total_pairs): ``shards`` is a list of per-device
    dicts {probe_ids, lo, cnt, build_ids} (numpy; the expansion of run r
    on device d is pairs (build_ids[lo[r]+j], probe_ids[r]) for
    j < cnt[r]), ``total_pairs`` the exact global pair count (Python int,
    not bounded by int32)."""
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.shape[ROW_AXIS]
    r_keys = np.asarray(r_keys, np.int32)
    s_keys = np.asarray(s_keys, np.int32)
    n, m_rows = len(r_keys), len(s_keys)
    rk, ri = _pad_sharded(r_keys, np.arange(n, dtype=np.int32), ndev)
    sk, si = _pad_sharded(s_keys, np.arange(m_rows, dtype=np.int32), ndev)
    shard = NamedSharding(mesh, P(ROW_AXIS))
    rk, ri, sk, si = (jax.device_put(x, shard) for x in (rk, ri, sk, si))

    cap_r = round_up(int(cdiv(len(np.asarray(rk)) // ndev, ndev) * slack) + 64, 64)
    cap_s = round_up(int(cdiv(len(np.asarray(sk)) // ndev, ndev) * slack) + 64, 64)
    for _ in range(max_retries):
        fn = make_shuffle_join_rle_fn(mesh, cap_r, cap_s)
        ppid, lo, cnt, bid, pl, ph, ovf = fn(rk, ri, sk, si)
        ovf = np.asarray(ovf)
        if ovf[0] <= cap_r and ovf[1] <= cap_s:
            break
        cap_r = max(cap_r, round_up(int(ovf[0]), 64))
        cap_s = max(cap_s, round_up(int(ovf[1]), 64))
    else:
        raise RuntimeError(f"RLE shuffle join send caps did not converge: {ovf}")

    ppid = np.asarray(ppid).reshape(ndev, -1)
    lo = np.asarray(lo).reshape(ndev, -1)
    cnt = np.asarray(cnt).reshape(ndev, -1)
    bid = np.asarray(bid).reshape(ndev, -1)
    pl = np.asarray(pl).reshape(-1).astype(np.int64)
    ph = np.asarray(ph).reshape(-1).astype(np.int64)
    total_pairs = int(((ph << 30) + pl).sum())
    shards = [
        {"probe_ids": ppid[d], "lo": lo[d], "cnt": cnt[d],
         "build_ids": bid[d]}
        for d in range(ndev)
    ]
    return shards, total_pairs


def make_shuffle_semi_fn(mesh, send_cap_r: int, send_cap_s: int):
    """Distributed semi/anti step: count-phase-only — after the exchange,
    each device reports (probe_id, matched) for every received probe row.
    No result capacity exists to overflow; only send buffers carry
    telemetry. Semi = ids with matched, anti = ids without (the same
    count-state partition ops.merge_join.semi_join/anti_join use on one
    chip)."""
    num_peers = mesh.shape[ROW_AXIS]

    def shard_fn(r_keys, r_ids, s_keys, s_ids):
        rbk, rbi, r_max = _send_buffer(r_keys, r_ids, num_peers, send_cap_r,
                                       _BUILD_PAD_KEY)
        sbk, sbi, s_max = _send_buffer(s_keys, s_ids, num_peers, send_cap_s,
                                       _PROBE_PAD_KEY)
        rbk = jax.lax.all_to_all(rbk, ROW_AXIS, 0, 0)
        rbi = jax.lax.all_to_all(rbi, ROW_AXIS, 0, 0)
        sbk = jax.lax.all_to_all(sbk, ROW_AXIS, 0, 0)
        sbi = jax.lax.all_to_all(sbi, ROW_AXIS, 0, 0)
        sk, _ = _sort_build(rbk.reshape(-1), rbi.reshape(-1))
        _, ppid, _, cnt = _count_sorted(sk, sbk.reshape(-1),
                                        sbi.reshape(-1))
        matched = (cnt > 0).astype(jnp.int32)
        ovf = jnp.stack([jax.lax.pmax(r_max, ROW_AXIS),
                         jax.lax.pmax(s_max, ROW_AXIS)])
        return ppid, matched, ovf

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)),
        out_specs=(P(ROW_AXIS), P(ROW_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _distributed_match_ids(r_keys, s_keys, mesh, slack, max_retries):
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.shape[ROW_AXIS]
    r_keys = np.asarray(r_keys, np.int32)
    s_keys = np.asarray(s_keys, np.int32)
    rk, ri = _pad_sharded(r_keys, np.arange(len(r_keys), dtype=np.int32),
                          ndev)
    sk, si = _pad_sharded(s_keys, np.arange(len(s_keys), dtype=np.int32),
                          ndev)
    shard = NamedSharding(mesh, P(ROW_AXIS))
    rk, ri, sk, si = (jax.device_put(x, shard) for x in (rk, ri, sk, si))
    cap_r = round_up(int(cdiv(len(np.asarray(rk)) // ndev, ndev) * slack) + 64, 64)
    cap_s = round_up(int(cdiv(len(np.asarray(sk)) // ndev, ndev) * slack) + 64, 64)
    for _ in range(max_retries):
        fn = make_shuffle_semi_fn(mesh, cap_r, cap_s)
        ppid, matched, ovf = fn(rk, ri, sk, si)
        ovf = np.asarray(ovf)
        if ovf[0] <= cap_r and ovf[1] <= cap_s:
            break
        cap_r = max(cap_r, round_up(int(ovf[0]), 64))
        cap_s = max(cap_s, round_up(int(ovf[1]), 64))
    else:
        raise RuntimeError(f"semi join send caps did not converge: {ovf}")
    ppid = np.asarray(ppid)
    matched = np.asarray(matched)
    valid = ppid >= 0
    return ppid[valid], matched[valid] > 0


def distributed_semi_join(r_keys, s_keys, *, mesh=None, slack: float = 2.0,
                          max_retries: int = 3):
    """Probe-side distributed semi join: sorted global ids of s rows with
    >= 1 match in r. Multiset-equal to ops.merge_join.semi_join."""
    ids, matched = _distributed_match_ids(r_keys, s_keys, mesh, slack,
                                          max_retries)
    return np.sort(ids[matched])


def distributed_anti_join(r_keys, s_keys, *, mesh=None, slack: float = 2.0,
                          max_retries: int = 3):
    """Probe-side distributed anti join: sorted global ids of s rows with
    NO match in r. Multiset-equal to ops.merge_join.anti_join."""
    ids, matched = _distributed_match_ids(r_keys, s_keys, mesh, slack,
                                          max_retries)
    return np.sort(ids[~matched])


def _pad_sharded(a, ids, mult):
    """Pad (keys, ids) to a multiple of the mesh size (pad ids = -1)."""
    target = round_up(max(len(a), 1), mult)
    if target == len(a):
        return a, ids
    pad_n = target - len(a)
    return (np.concatenate([a, np.zeros(pad_n, np.int32)]),
            np.concatenate([ids, np.full(pad_n, -1, np.int32)]))


def recommended_slack(distribution: str = "uniform") -> float:
    """Send-buffer slack factor over the uniform expectation n_local/P.
    Zipf workloads need more headroom until a heavy hitter exceeds one
    device's share; the driver's retry loop covers the tail either way."""
    return 2.0 if distribution == "uniform" else 4.0


def distributed_hash_join(
    r_keys,
    s_keys,
    *,
    mesh=None,
    slack: float = 2.0,
    expected_matches: int | None = None,
    max_retries: int = 3,
    skew: bool = False,
    pipeline_chunks: int = 1,
):
    """Driver: exact-size distributed equi-join over all mesh devices.

    ``skew=True`` routes through the heavy-hitter splitting path
    (:mod:`tpujoin.parallel.skew`) — use for Zipf-like key distributions.
    ``pipeline_chunks > 1`` exchanges the probe side in that many slices
    with the collective for slice c+1 overlapping the local join of slice c.

    Pads both tables to a multiple of the mesh size, row-shards them,
    runs the shuffle-join step, and trims each device's padded result to its
    exact count. Retries with doubled capacities on detected overflow.

    Returns (r_ids, s_ids) numpy arrays — global row-id pairs, multiset-equal
    to the single-chip :func:`tpujoin.ops.hash_join.hash_join` result.
    """
    if skew:
        from tpujoin.parallel.skew import distributed_hash_join_skew

        return distributed_hash_join_skew(
            r_keys, s_keys, mesh=mesh, slack=slack,
            expected_matches=expected_matches)
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.shape[ROW_AXIS]
    r_keys = np.asarray(r_keys)
    s_keys = np.asarray(s_keys)
    n, m_rows = len(r_keys), len(s_keys)

    def pad_to(a, ids, mult):
        target = round_up(max(len(a), 1), mult)
        if target == len(a):
            return a, ids
        pad_n = target - len(a)
        a = np.concatenate([a, np.zeros(pad_n, np.int32)])
        ids = np.concatenate([ids, np.full(pad_n, -1, np.int32)])
        return a, ids

    r_ids_in = np.arange(n, dtype=np.int32)
    s_ids_in = np.arange(m_rows, dtype=np.int32)
    rk, ri = pad_to(r_keys.astype(np.int32), r_ids_in, ndev)
    sk, si = pad_to(s_keys.astype(np.int32), s_ids_in,
                    ndev * max(pipeline_chunks, 1))

    shard = NamedSharding(mesh, P(ROW_AXIS))
    rk, ri, sk, si = (jax.device_put(x, shard) for x in (rk, ri, sk, si))

    if expected_matches is None:
        expected_matches = max(n, m_rows)  # conservative default
    nchunks = max(pipeline_chunks, 1)
    cap_r = round_up(int(cdiv(len(np.asarray(rk)) // ndev, ndev) * slack) + 64, 64)
    cap_s = round_up(
        int(cdiv(len(np.asarray(sk)) // (ndev * nchunks), ndev) * slack) + 64,
        64)
    cap_res = round_up(
        int(expected_matches / (ndev * nchunks) * slack) + 64, 64)

    for _ in range(max_retries):
        if nchunks > 1:
            fn = make_shuffle_join_pipelined_fn(mesh, cap_r, cap_s, cap_res,
                                                num_chunks=nchunks)
        else:
            fn = make_shuffle_join_fn(mesh, cap_r, cap_s, cap_res)
        r_out, s_out, totals, ovf = fn(rk, ri, sk, si)
        ovf = np.asarray(ovf)
        if ovf[0] <= cap_r and ovf[1] <= cap_s and ovf[2] <= cap_res:
            break
        cap_r = max(cap_r, round_up(int(ovf[0]), 64))
        cap_s = max(cap_s, round_up(int(ovf[1]), 64))
        cap_res = max(cap_res, round_up(int(ovf[2]), 64))
    else:
        raise RuntimeError(f"shuffle join capacities did not converge: {ovf}")

    r_out = np.asarray(r_out).reshape(ndev * nchunks, -1)
    s_out = np.asarray(s_out).reshape(ndev * nchunks, -1)
    totals = np.asarray(totals).reshape(-1)
    parts_r = [r_out[d, : totals[d]] for d in range(ndev * nchunks)]
    parts_s = [s_out[d, : totals[d]] for d in range(ndev * nchunks)]
    return (
        np.concatenate(parts_r) if parts_r else np.empty(0, np.int32),
        np.concatenate(parts_s) if parts_s else np.empty(0, np.int32),
    )
