"""Worker / latency-estimator / planner unit tests against the mock
engine (mirrors band/test/worker_test.cc, latency_estimator_test.cc,
planner_test.cc)."""

import os
import time

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.common import Job, JobStatus, SubgraphKey
from band_tpu.config import WorkerSpec
from band_tpu.runtime.latency_estimator import LatencyEstimator
from band_tpu.runtime.worker import (
    LARGE_WAITING_TIME,
    DeviceQueueWorker,
    GlobalQueueWorker,
)
from tests.conftest import has_model, model_path
from tests.mock_engine import MockEngine


class InvokeCountingEngine(MockEngine):
    def __init__(self, sleep_s=0.0, **kw):
        super().__init__(**kw)
        self.invokes = 0
        self.sleep_s = sleep_s

    def invoke(self, key, inputs):
        self.invokes += 1
        if self.sleep_s:
            time.sleep(self.sleep_s)
        return []


@pytest.mark.parametrize("cls", [DeviceQueueWorker, GlobalQueueWorker])
def test_worker_executes_and_reports(cls):
    eng = InvokeCountingEngine()
    key = eng.whole_key(0, 0)
    eng.latency[key] = 100
    w = cls(eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU))
    w.start()
    try:
        job = Job(model_id=0, job_id=1)
        job.subgraph_key = key
        assert w.enqueue_job(job)
        deadline = time.monotonic() + 5
        while not eng.finished and time.monotonic() < deadline:
            time.sleep(0.01)
        assert eng.invokes == 1
        assert eng.finished[0].status == JobStatus.SUCCESS
        assert eng.finished[0].end_time >= eng.finished[0].invoke_time
    finally:
        w.stop()


@pytest.mark.parametrize("cls", [DeviceQueueWorker, GlobalQueueWorker])
def test_worker_rejects_invalid_job(cls):
    eng = InvokeCountingEngine()
    w = cls(eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU))
    assert not w.enqueue_job(Job(model_id=0, job_id=1))  # invalid key


def test_global_queue_single_slot():
    eng = InvokeCountingEngine(sleep_s=0.2)
    key = eng.whole_key(0, 0)
    eng.latency[key] = 300_000  # 0.3 s expected: still "remaining" below
    w = GlobalQueueWorker(eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU))
    w.start()
    try:
        j1 = Job(model_id=0, job_id=1)
        j1.subgraph_key = key
        j2 = Job(model_id=0, job_id=2)
        j2.subgraph_key = key
        assert w.enqueue_job(j1)
        time.sleep(0.05)
        # busy: second enqueue must be rejected (single in-flight slot)
        assert not w.enqueue_job(j2)
        assert not w.is_enqueue_ready()
        assert w.get_waiting_time() > 0
        w.wait_until_idle()
    finally:
        w.stop()


def test_device_queue_waiting_time_accumulates():
    eng = InvokeCountingEngine()
    key = eng.whole_key(0, 0)
    eng.latency[key] = 5000
    w = DeviceQueueWorker(eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU))
    # worker not started: queue just accumulates
    for i in range(3):
        j = Job(model_id=0, job_id=i)
        j.subgraph_key = key
        w.enqueue_job(j)
    assert w.get_waiting_time() == 15000
    # unknown expected latency -> LARGE
    j = Job(model_id=9, job_id=9)
    j.subgraph_key = SubgraphKey(9, 0, frozenset([0]))
    w.enqueue_job(j)
    assert w.get_waiting_time() == LARGE_WAITING_TIME


def test_worker_pause_resume():
    eng = InvokeCountingEngine()
    key = eng.whole_key(0, 0)
    eng.latency[key] = 100
    w = DeviceQueueWorker(eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU))
    w.start()
    try:
        w.pause()
        j = Job(model_id=0, job_id=1)
        j.subgraph_key = key
        w.enqueue_job(j)
        time.sleep(0.3)
        assert eng.invokes == 0  # paused
        w.resume()
        deadline = time.monotonic() + 5
        while eng.invokes == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert eng.invokes == 1
    finally:
        w.stop()


# ---------------------------------------------------------------------------
def test_latency_estimator_ema():
    est = LatencyEstimator(smoothing_factor=0.1)
    key = SubgraphKey(0, 0, frozenset([0]))
    est.set_profiled(key, 1000)
    assert est.get_expected(key) == 1000
    est.update(key, 2000)
    # 0.1*2000 + 0.9*1000 = 1100
    assert est.get_expected(key) == 1100
    est.update(key, 2000)
    assert est.get_expected(key) == int(0.1 * 2000 + 0.9 * 1100)


def test_latency_estimator_profile_counts():
    est = LatencyEstimator(num_warmups=2, num_runs=3)
    key = SubgraphKey(0, 0, frozenset([0]))
    calls = []
    est.profile(key, lambda: calls.append(1))
    assert len(calls) == 5  # warmups + runs
    assert est.get_profiled(key) >= 0


def test_latency_estimator_stale_hash_ignored(tmp_path):
    path = str(tmp_path / "p.json")
    est = LatencyEstimator(config_hash="aaa", profile_data_path=path)
    key = SubgraphKey(0, 1, frozenset([0, 1]))
    est.set_profiled(key, 1234)
    est.dump_profile()
    ok = LatencyEstimator(config_hash="aaa").load_profile.__self__  # noqa
    est2 = LatencyEstimator(config_hash="aaa")
    assert est2.load_profile(path)
    assert est2.get_profiled(key) == 1234
    est3 = LatencyEstimator(config_hash="bbb")
    assert not est3.load_profile(path)


# ---------------------------------------------------------------------------
def test_fc_int8_model_bit_exact(rng):
    """Generated int8 model covering quantized FULLY_CONNECTED."""
    path = os.path.join(os.path.dirname(__file__), "data", "fc_int8.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    import jax

    from band_tpu.backend.program import build_program
    from band_tpu.tflite.parser import parse_tflite_file
    from tests.conftest import make_tfl_interpreter

    g = parse_tflite_file(path)
    assert g.op_histogram().get("FULLY_CONNECTED", 0) == 2
    it = make_tfl_interpreter(path)
    x = rng.integers(-128, 128, (1, 16, 16, 8)).astype(np.int8)
    it.allocate_tensors()
    it.set_tensor(it.get_input_details()[0]["index"], x)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])

    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    out = np.asarray(
        fn({k: np.asarray(v) for k, v in prog.params.items()}, [x])[0]
    )
    np.testing.assert_array_equal(out, ref)


def test_link_cost_table_defaults_and_overrides():
    from band_tpu.runtime.link_costs import (
        DCN, H2D, HOST, ICI, LinkCostTable,
    )

    t = LinkCostTable()
    assert t.cost_us(H2D, 0) == 30
    assert t.cost_us(H2D, 100_000) == 40
    assert t.cost_us(ICI, 450_000) == 15
    t.update_from_dict({"dcn": [100, 500], "host": [2, 1000]})
    assert t.cost_us(DCN, 5_000) == 110
    assert t.cost_us(HOST, 1_000) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.update_from_dict({"warp": [1, 1]})
    # round trip
    t2 = LinkCostTable()
    t2.update_from_dict(t.to_dict())
    assert (t2.table == t.table).all()


def test_link_cost_measurement_on_cpu():
    """measure() runs and produces sane positive entries on the CPU
    platform (h2d probes are skipped: no accelerator devices)."""
    import jax

    from band_tpu.runtime.link_costs import HOST, LinkCostTable, measure

    t = measure(jax.devices("cpu"), LinkCostTable())
    assert (t.table[:, 0] >= 0).all() and (t.table[:, 1] >= 1).all()
    # host memcpy was actually probed: a 4 MB copy should be priced
    # well under a second
    assert t.cost_us(HOST, 1 << 22) < 1_000_000


def test_engine_probe_link_costs_config():
    """probe_link_costs=True measures at engine init; link_costs dict
    overrides defaults."""
    import band_tpu as bt

    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    cfg.link_costs = {"dcn": [123, 456]}
    eng = bt.Engine.create(cfg)
    try:
        from band_tpu.runtime.link_costs import DCN

        assert eng.link_costs.table[DCN, 0] == 123
        assert eng.link_costs.table[DCN, 1] == 456
    finally:
        eng.shutdown()


def test_backend_factory_seam():
    """Second-backend seam (reference: band/backend_factory.h:195-203):
    a custom registered backend is selected per worker and actually
    serves requests through the engine."""
    import numpy as np

    import band_tpu as bt
    from band_tpu.backend.executor import ModelExecutor
    from band_tpu.backend.factory import (
        available_backends,
        create_executor,
        register_backend,
    )
    from band_tpu.errors import ConfigError
    import pytest as _pytest

    assert "xla" in available_backends()
    with _pytest.raises(ConfigError):
        create_executor("no-such-backend", 0, None, 0, [])

    calls = []

    class CountingExecutor(ModelExecutor):
        def execute(self, key, inputs):
            calls.append(key)
            return super().execute(key, inputs)

    register_backend("counting", CountingExecutor)
    try:
        from tests.conftest import has_model, model_path

        if not has_model("add"):
            _pytest.skip("reference model not available")
        cfg = (
            bt.RuntimeConfigBuilder()
            .add_scheduler(bt.SchedulerType.FIXED_WORKER)
            .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU,
                                      device_ids=(0,), backend="counting"))
            .profile_warmups(0)
            .profile_runs(1)
            .build()
        )
        eng = bt.Engine.create(cfg)
        try:
            mid = eng.register_model(bt.Model.from_path(model_path("add")))
            x = np.ones((1, 8, 8, 3), np.float32)
            out = eng.request_sync(mid, [x])
            np.testing.assert_allclose(out[0], 3 * x, rtol=1e-5)
            assert calls, "custom backend executor was never invoked"
        finally:
            eng.shutdown()
    finally:
        from band_tpu.backend import factory as F

        F._REGISTRY.pop("counting", None)
