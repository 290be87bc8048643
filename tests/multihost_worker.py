"""Worker process for tests/test_multihost.py: joins a 2-process CPU
jax.distributed cluster, builds the global mesh, runs ONE shuffle-join
step on deterministic data, and writes its process-local verification to
a JSON file (the parent test sums locals and compares to numpy).

Run: python tests/multihost_worker.py <pid> <nproc> <port> <outdir>
"""
from __future__ import annotations

import json
import os
import sys
import traceback


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    out_path = os.path.join(outdir, f"worker_{pid}.json")

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    try:
        # initialize BEFORE importing the engine: package imports may touch
        # the backend (jax.distributed.initialize must run first — the same
        # order a pod deployment uses)
        from tpujoin.parallel import multihost

        multihost.initialize(coordinator_address=f"localhost:{port}",
                             num_processes=nproc, process_id=pid)
        from tpujoin.parallel.shuffle_join import make_shuffle_join_fn
        assert multihost.is_multiprocess(), "process_count() == 1"
        mesh = multihost.make_global_mesh()
        ndev = len(jax.devices())
        assert ndev == 2 * nproc, f"global device count {ndev}"

        # identical deterministic data in every process
        rows_per_dev = 64
        n = rows_per_dev * ndev
        rng = np.random.default_rng(0)
        rk = rng.integers(1, 64, n).astype(np.int32)
        sk = rng.integers(1, 64, n).astype(np.int32)
        ids = np.arange(n, dtype=np.int32)

        rk_d = multihost.put_row_sharded(rk, mesh)
        ri_d = multihost.put_row_sharded(ids, mesh)
        sk_d = multihost.put_row_sharded(sk, mesh)
        si_d = multihost.put_row_sharded(ids, mesh)

        srk = np.sort(rk)
        expected = int((np.searchsorted(srk, sk, "right")
                        - np.searchsorted(srk, sk, "left")).sum())
        cap = max(4096, expected + 64)
        step = make_shuffle_join_fn(mesh, send_cap_r=n, send_cap_s=n,
                                    local_result_cap=cap)
        r_out, s_out, totals, ovf = step(rk_d, ri_d, sk_d, si_d)
        jax.block_until_ready((r_out, s_out, totals, ovf))

        # process-local verification: this process's shards' pairs must be
        # key-equal; local totals go to the parent for the global check
        t_by_dev = {}
        for sh in totals.addressable_shards:
            t_by_dev[sh.index[0].start] = int(np.asarray(sh.data)[0])
        r_by_dev = {sh.index[0].start // cap: np.asarray(sh.data)
                    for sh in r_out.addressable_shards}
        s_by_dev = {sh.index[0].start // cap: np.asarray(sh.data)
                    for sh in s_out.addressable_shards}
        local_total = 0
        for d, t in t_by_dev.items():
            local_total += t
            r_d, s_d = r_by_dev[d][:t], s_by_dev[d][:t]
            assert (r_d >= 0).all() and (s_d >= 0).all()
            assert (rk[r_d] == sk[s_d]).all(), f"device {d} pair mismatch"

        with open(out_path, "w") as f:
            json.dump({"ok": True, "local_total": local_total,
                       "process_count": int(jax.process_count())}, f)
    except Exception as e:  # noqa: BLE001 — parent decides skip vs fail
        with open(out_path, "w") as f:
            json.dump({"ok": False, "error": f"{type(e).__name__}: {e}",
                       "traceback": traceback.format_exc()}, f)
        raise


if __name__ == "__main__":
    main()
