"""Device-error handling: throttle + hand jobs back to the planner
(reference: band/worker.cc:101-110, worker_device_queue.cc:110-125)."""

import time

import pytest

import band_tpu as bt
from band_tpu.common import Job, JobStatus
from band_tpu.config import WorkerSpec
from band_tpu.errors import ExecutionError
from band_tpu.runtime.worker import DeviceQueueWorker
from tests.mock_engine import MockEngine


class FailingEngine(MockEngine):
    def __init__(self, fail_times=1, **kw):
        super().__init__(**kw)
        self.fail_times = fail_times
        self.invokes = 0

    def try_copy_input_tensors(self, job):
        # band raises inside Invoke; ExecutionError on the copy path
        # exercises the same handler
        self.invokes += 1
        if self.invokes <= self.fail_times:
            raise ExecutionError("injected device failure")
        return []


def test_device_error_requeues_and_throttles():
    eng = FailingEngine(fail_times=1)
    key = eng.whole_key(0, 0)
    eng.latency[key] = 100
    w = DeviceQueueWorker(eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU))
    w.start()
    try:
        j1 = Job(model_id=0, job_id=1)
        j1.subgraph_key = key
        j2 = Job(model_id=0, job_id=2)
        j2.subgraph_key = key
        w.enqueue_job(j1)
        w.enqueue_job(j2)
        deadline = time.monotonic() + 5
        while not eng.enqueued and time.monotonic() < deadline:
            time.sleep(0.01)
        # the failed job AND its queued sibling went back to the planner
        assert {j.job_id for j in eng.enqueued} == {1, 2}
        for j in eng.enqueued:
            assert j.status == JobStatus.QUEUED
            assert not j.subgraph_key.is_valid()  # assignment reset
        # worker throttles for a bit after the failure
        assert not w.is_available()
    finally:
        w.stop()


def test_generic_failure_reports_invoke_failure():
    class BoomEngine(MockEngine):
        def invoke(self, key, inputs):
            raise RuntimeError("boom")

    eng = BoomEngine()
    key = eng.whole_key(0, 0)
    eng.latency[key] = 100
    w = DeviceQueueWorker(eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU))
    w.start()
    try:
        j = Job(model_id=0, job_id=1)
        j.subgraph_key = key
        w.enqueue_job(j)
        deadline = time.monotonic() + 5
        while not eng.finished and time.monotonic() < deadline:
            time.sleep(0.01)
        assert eng.finished[0].status == JobStatus.INVOKE_FAILURE
    finally:
        w.stop()


def test_engine_fault_injection_reroutes_end_to_end():
    """Chaos hook through the REAL engine: a fault injected on the
    chosen worker drives throttle + re-enqueue, the planner reroutes to
    the healthy worker, and the request still succeeds."""
    import numpy as np
    from tests.conftest import has_model, model_path

    if not has_model("add"):
        pytest.skip("reference model not available")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        x = np.full((1, 8, 8, 3), 2.0, np.float32)
        # warm path
        out = eng.request_sync(mid, [x], timeout=60)
        np.testing.assert_allclose(out[0], 6.0, rtol=1e-5)

        # break both workers once each: every first routing choice fails,
        # recovery must still complete the request on a retried worker
        eng.inject_fault(0, 1)
        eng.inject_fault(1, 1)
        out = eng.request_sync(mid, [x], timeout=60)
        np.testing.assert_allclose(out[0], 6.0, rtol=1e-5)
    finally:
        eng.shutdown()


def test_device_recovery_probes_until_available():
    """After a device error the worker re-probes the failed subgraph on
    the configured interval and only reports available once a probe
    succeeds (reference: band/worker.cc:101-110 WaitUntilDeviceAvailable
    + band/config.h:53 availability_check_interval_ms)."""

    class RecoveringEngine(FailingEngine):
        def __init__(self, probe_failures, **kw):
            super().__init__(**kw)
            self.probe_failures = probe_failures
            self.probes = 0
            self.probed_keys = []

        def probe_subgraph(self, key):
            self.probes += 1
            self.probed_keys.append(key)
            return self.probes > self.probe_failures

    eng = RecoveringEngine(probe_failures=2, fail_times=1)
    key = eng.whole_key(0, 0)
    eng.latency[key] = 100
    w = DeviceQueueWorker(
        eng, 0,
        WorkerSpec(device=bt.DeviceFlag.CPU,
                   availability_check_interval_ms=20),
    )
    w.start()
    try:
        j = Job(model_id=0, job_id=1)
        j.subgraph_key = key
        w.enqueue_job(j)
        deadline = time.monotonic() + 5
        while w.is_available() and time.monotonic() < deadline:
            time.sleep(0.005)
        assert not w.is_available()  # recovering
        while not w.is_available() and time.monotonic() < deadline:
            time.sleep(0.005)
        assert w.is_available(), "worker never recovered"
        # exactly probe_failures failed probes + 1 success, all on the
        # subgraph that failed
        assert eng.probes == 3
        assert all(k == key for k in eng.probed_keys)
    finally:
        w.stop()


def test_engine_fault_recovery_end_to_end():
    """inject_fault drives the full loop on a real engine: invoke fails
    -> worker unavailable -> probes consume remaining faults -> probe
    succeeds -> worker serves again."""
    from tests.conftest import has_model, model_path

    if not has_model("add"):
        pytest.skip("reference model not available")
    import numpy as np

    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  availability_check_interval_ms=30))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        x = np.full((1, 8, 8, 3), 2.0, np.float32)
        np.testing.assert_allclose(eng.request_sync(mid, [x])[0], x * 3.0)

        # fault worker 0: 1 for the serving invoke (if routed there) or
        # a probe, +2 more so recovery needs several probe rounds
        eng.inject_fault(0, 3)
        # burst of requests: the failure reroutes them to worker 1
        ids = [eng.request_async(mid, [x]) for _ in range(6)]
        st = eng.wait_all(ids, timeout=30, raise_on_incomplete=True)
        assert all(s == bt.JobStatus.SUCCESS for s in st.values()), st

        # eventually worker 0 recovers (probes burn the fault budget)
        deadline = time.monotonic() + 10
        while not eng.workers[0].is_available() and (
            time.monotonic() < deadline
        ):
            time.sleep(0.02)
        assert eng.workers[0].is_available(), "worker 0 never recovered"
        np.testing.assert_allclose(eng.request_sync(mid, [x])[0], x * 3.0)
    finally:
        eng.shutdown()
