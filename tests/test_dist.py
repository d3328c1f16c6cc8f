"""Distributed coordinator/worker control plane (dist/)."""

import threading
import time

from keyhuntm1cpu_tpu.dist import (
    CoordinatorServer,
    DistributedWorker,
    WorkCoordinator,
)
from keyhuntm1cpu_tpu.dist.coordinator import rpc


def _serve(coord):
    srv = CoordinatorServer(("127.0.0.1", 0), coord)
    srv.start_background()
    return srv, srv.server_address[1]


class TestCoordinator:
    def test_unit_partitioning_alignment(self):
        c = WorkCoordinator(0x1000, 0x2000, n_units=3, align=0x400)
        units = []
        c.register("w")
        while True:
            r = c.request_work("w")
            if r["unit"] is None:
                break
            units.append((int(r["unit"]["start"], 16), int(r["unit"]["end"], 16)))
        # full disjoint cover
        assert units[0][0] == 0x1000
        assert units[-1][1] == 0x2000
        for (a1, b1), (a2, _) in zip(units, units[1:]):
            assert b1 == a2
            assert (b1 - a1) % 0x400 == 0

    def test_lease_expiry_reassigns(self):
        c = WorkCoordinator(0, 100, n_units=1, lease_s=0.05)
        c.register("w1")
        r = c.request_work("w1")
        assert r["unit"] is not None
        assert c.request_work("w2")["unit"] is None  # leased out
        time.sleep(0.08)
        r2 = c.request_work("w2")  # expired -> reassigned
        assert r2["unit"] is not None
        assert r2["unit"]["unit_id"] == r["unit"]["unit_id"]

    def test_heartbeat_renews_lease(self):
        c = WorkCoordinator(0, 100, n_units=1, lease_s=0.1)
        r = c.request_work("w1")
        uid = r["unit"]["unit_id"]
        for _ in range(3):
            time.sleep(0.06)
            c.heartbeat("w1", uid)
            assert c.request_work("w2")["unit"] is None  # still held

    def test_stop_on_first(self):
        c = WorkCoordinator(0, 100, n_units=10, stop_on_first=True)
        r = c.request_work("w1")
        resp = c.report("w1", r["unit"]["unit_id"], "found", found=["abc123"])
        assert resp["stop"]
        assert c.request_work("w2")["done"]
        assert c.found_keys()[0]["private_key"] == "abc123"

    def test_failed_unit_requeued(self):
        c = WorkCoordinator(0, 100, n_units=1)
        r = c.request_work("w1")
        c.report("w1", r["unit"]["unit_id"], "failed")
        assert c.request_work("w2")["unit"] is not None

    def test_completion(self):
        c = WorkCoordinator(0, 100, n_units=2, stop_on_first=False)
        while True:
            r = c.request_work("w")
            if r["unit"] is None:
                break
            c.report("w", r["unit"]["unit_id"], "done")
        assert c.is_done()
        st = c.status()
        assert st["completed"] == 2 and st["pending"] == 0


class TestEndToEnd:
    def test_workers_find_planted_key_over_tcp(self):
        # plant a "key" at 777; search_fn = trivial range scan
        coord = WorkCoordinator(0, 1000, n_units=8, stop_on_first=True)
        srv, port = _serve(coord)
        try:
            def search(a, b):
                return [f"{777:x}"] if a <= 777 < b else []

            workers = [
                DistributedWorker("127.0.0.1", port, search, heartbeat_s=0.5)
                for _ in range(3)
            ]
            threads = [threading.Thread(target=w.run) for w in workers]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            found = coord.found_keys()
            assert [f["private_key"] for f in found] == ["309"]  # 777 hex
            st = coord.status()
            assert st["stopped"]
        finally:
            srv.shutdown()

    def test_rpc_status(self):
        coord = WorkCoordinator(0, 10, n_units=1)
        srv, port = _serve(coord)
        try:
            st = rpc("127.0.0.1", port, {"op": "status"})
            assert st["ok"] and st["n_units"] == 1
            bad = rpc("127.0.0.1", port, {"op": "bogus"})
            assert not bad["ok"]
        finally:
            srv.shutdown()

    def test_all_units_processed_no_key(self):
        coord = WorkCoordinator(0, 64, n_units=4, stop_on_first=True)
        srv, port = _serve(coord)
        try:
            w = DistributedWorker("127.0.0.1", port, lambda a, b: [])
            w.run()
            assert w.units_done == 4
            assert coord.is_done()
            assert coord.found_keys() == []
        finally:
            srv.shutdown()


class TestElasticRecovery:
    def test_coordinator_restart_restores_progress(self, tmp_path):
        sf = str(tmp_path / "coord.json")
        c1 = WorkCoordinator(0, 100, n_units=4, stop_on_first=False,
                             state_file=sf)
        r1 = c1.request_work("w")
        c1.report("w", r1["unit"]["unit_id"], "done")
        r2 = c1.request_work("w")
        c1.report("w", r2["unit"]["unit_id"], "found", found=["beef"])
        # "crash" -> new coordinator over the same range and state file
        c2 = WorkCoordinator(0, 100, n_units=4, stop_on_first=False,
                             state_file=sf)
        st = c2.status()
        assert st["completed"] == 2
        assert st["pending"] == 2
        assert [f["private_key"] for f in c2.found_keys()] == ["beef"]
        # remaining units are exactly the not-yet-done ones
        remaining = set()
        while True:
            r = c2.request_work("w2")
            if r["unit"] is None:
                break
            remaining.add(r["unit"]["unit_id"])
        done_ids = {r1["unit"]["unit_id"], r2["unit"]["unit_id"]}
        assert remaining == {0, 1, 2, 3} - done_ids


def test_two_workers_real_bsgs_engine_with_lease_expiry():
    """e2e with the REAL BSGS engine (not a toy fn): 2 workers share a
    coordinator; one unit's lease is force-expired mid-run and reassigned;
    the planted key is recovered exactly once at the coordinator."""
    import threading

    from keyhuntm1cpu_tpu.dist.worker import DistributedWorker, bsgs_search_fn
    from keyhuntm1cpu_tpu.engine.bsgs import BSGSParams, host_baby_table
    from keyhuntm1cpu_tpu.ref import ecref

    key = 0xA0B2C3  # inside [0xA00000, 0xA00000 + 8*8192)
    params = BSGSParams(m=256, block_u=16, steps_per_chunk=2, chain_len=8)
    table = host_baby_table(params.m)
    window = params.block_u * 2 * params.m  # 8192 keys
    coord = WorkCoordinator(
        0xA00000, 0xA00000 + 8 * window, n_units=8, align=window,
        lease_s=60.0, stop_on_first=False,
    )
    srv = CoordinatorServer(("127.0.0.1", 0), coord)
    port = srv.server_address[1]
    srv.start_background()
    try:
        # force one lease to expire before workers start: claim a unit as
        # a ghost worker and backdate its deadline
        ghost = coord.request_work("ghost")
        assert ghost["unit"] is not None
        with coord._lock:
            uid = int(ghost["unit"]["unit_id"])
            unit, lease = coord._assigned[uid]
            coord._assigned[uid] = (unit, type(lease)("ghost", 0.0))

        pubs = [ecref.scalar_mult(key)]
        workers = [
            DistributedWorker(
                "127.0.0.1", port,
                bsgs_search_fn(pubs, params, table=table),
                worker_id=f"w{i}", poll_s=0.1,
            )
            for i in range(2)
        ]
        threads = [threading.Thread(target=w.run) for w in workers]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive()
        st = coord.status()
        assert st["completed"] == 8  # incl. the expired+reassigned unit
        keys = [f["private_key"] for f in coord.found_keys()]
        assert keys == [f"{key:x}"]
        assert sum(w.units_done for w in workers) >= 8
    finally:
        srv.shutdown()


def test_worker_real_brute_engine_finds_all_hits():
    """e2e with the REAL brute engine: a worker fleet-scans an rmd160
    target list over leased units and reports every hit in its range
    (brute_search_fn defaults to exhaustive units, unlike the
    stop_on_first BSGS fn)."""
    import threading

    from keyhuntm1cpu_tpu.dist.worker import DistributedWorker, brute_search_fn
    from keyhuntm1cpu_tpu.engine.brute import BruteParams
    from keyhuntm1cpu_tpu.ref import ecref, hashref
    from keyhuntm1cpu_tpu.utils.targets import TargetSet

    keys = [0x90100, 0x90500]  # both inside the first two units
    raw = [hashref.pubkey_to_hash160(ecref.scalar_mult(k), compressed=True)
           for k in keys]
    ts = TargetSet(kind="hash160", raw=raw, labels=[str(k) for k in keys])
    params = BruteParams(walkers=2, block_u=32, steps_per_chunk=2)
    coord = WorkCoordinator(
        0x90000, 0x90000 + 4 * 1024, n_units=4, align=1,
        lease_s=60.0, stop_on_first=False,
    )
    srv = CoordinatorServer(("127.0.0.1", 0), coord)
    port = srv.server_address[1]
    srv.start_background()
    try:
        w = DistributedWorker(
            "127.0.0.1", port,
            brute_search_fn(ts, mode="rmd160", params=params),
            worker_id="bw0", poll_s=0.1,
        )
        t = threading.Thread(target=w.run)
        t.start()
        t.join(timeout=300)
        assert not t.is_alive()
        assert coord.status()["completed"] == 4
        got = sorted(int(f["private_key"], 16) for f in coord.found_keys())
        assert got == sorted(keys)
    finally:
        srv.shutdown()


def test_worker_graceful_stop_requeues_partial_unit():
    """When the process-wide stop flag is set mid-unit (SIGTERM), the
    worker reports the unit FAILED (partial coverage must requeue), not
    done, and exits its loop."""
    import threading

    from keyhuntm1cpu_tpu.dist.worker import DistributedWorker
    from keyhuntm1cpu_tpu.engine import common

    coord = WorkCoordinator(0, 4096, n_units=4, align=1, lease_s=60.0)
    srv = CoordinatorServer(("127.0.0.1", 0), coord)
    port = srv.server_address[1]
    srv.start_background()
    try:
        def search_fn(a, b):
            common.request_stop()  # preemption arrives mid-search
            return []

        w = DistributedWorker("127.0.0.1", port, search_fn,
                              worker_id="gs0", poll_s=0.1)
        t = threading.Thread(target=w.run)
        t.start()
        t.join(timeout=60)
        assert not t.is_alive()
        st = coord.status()
        assert w.units_done == 0  # partial unit not counted as done
        assert st["completed"] == 0  # requeued, not completed
        assert st["pending"] == 4  # all units still to do
    finally:
        common.clear_stop()
        srv.shutdown()


def test_worker_vanity_composition_args():
    """Worker -v wiring: intervals/prefixes reach the search fn; vanity-
    only (no -f) builds an empty target set; bad combos error."""
    import pytest

    from keyhuntm1cpu_tpu.dist import worker as wk

    captured = {}

    def fake_brute_search_fn(targets, mode, params, intervals=None,
                             prefixes=None):
        captured.update(targets=targets, mode=mode,
                        intervals=intervals, prefixes=prefixes)
        return lambda a, b: []

    class FakeWorker:
        def __init__(self, *a, **kw):
            self.worker_id = "t"
            self.units_done = 0

        def run(self):
            return []

    orig_fn, orig_w = wk.brute_search_fn, wk.DistributedWorker
    wk.brute_search_fn, wk.DistributedWorker = fake_brute_search_fn, FakeWorker
    try:
        wk.main(["-c", "h:1", "-m", "rmd160", "-v", "1Love"])
        assert captured["mode"] == "rmd160"
        assert len(captured["targets"].raw) == 0
        assert captured["prefixes"] == ["1Love"]
        assert len(captured["intervals"]) >= 1
        with pytest.raises(SystemExit):
            wk.main(["-c", "h:1", "-m", "xpoint", "-v", "1Love"])
        with pytest.raises(SystemExit):
            wk.main(["-c", "h:1", "-m", "rmd160"])  # no -f, no -v
        with pytest.raises(SystemExit):
            wk.main(["-c", "h:1", "-m", "bsgs"])  # bsgs needs -f
    finally:
        wk.brute_search_fn, wk.DistributedWorker = orig_fn, orig_w
