"""Config validation, logger, and chrome-trace units (reference test
analogues: config_builder_test.cc defaults/validity, logger reporter
semantics, chrome_tracer JSON emit)."""

import json

import pytest

import band_tpu as bt
from band_tpu.common import Job, SubgraphKey
from band_tpu.config import (
    DistributedConfig,
    MonitorConfig,
    PlannerConfig,
    RuntimeConfig,
    WorkerSpec,
    config_from_dict,
)
from band_tpu.errors import ConfigError
from band_tpu.tracing.job_tracer import JobTracer
from band_tpu.tracing.logger import Logger, LogSeverity


# ---------------------------------------------------------------------------
# config validation (≙ band/test/config_builder_test.cc)
# ---------------------------------------------------------------------------

def test_default_config_is_valid():
    RuntimeConfig().validate()


def test_scheduler_count_rules():
    with pytest.raises(ConfigError):
        PlannerConfig(schedulers=[]).validate()
    with pytest.raises(ConfigError):
        PlannerConfig(schedulers=[bt.SchedulerType.FIXED_WORKER] * 3).validate()
    PlannerConfig(
        schedulers=[bt.SchedulerType.FIXED_WORKER,
                    bt.SchedulerType.ROUND_ROBIN]
    ).validate()


def test_mixed_worker_type_schedulers_rejected():
    # HEFT is global-queue, round-robin is device-queue (planner.cc:95-99)
    with pytest.raises(ConfigError):
        PlannerConfig(
            schedulers=[
                bt.SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME,
                bt.SchedulerType.ROUND_ROBIN,
            ]
        ).validate()


def test_worker_spec_rules():
    with pytest.raises(ConfigError):
        WorkerSpec(device_ids=()).validate()
    with pytest.raises(ConfigError):
        WorkerSpec(device_ids=(0, 1, 2), mesh_shape=(2, 2)).validate()
    with pytest.raises(ConfigError):
        WorkerSpec(dispatch_depth=0).validate()
    WorkerSpec(device_ids=(0, 1, 2, 3), mesh_shape=(2, 2)).validate()


def test_monitor_and_distributed_rules():
    with pytest.raises(ConfigError):
        MonitorConfig(monitor_interval_ms=0).validate()
    with pytest.raises(ConfigError):
        MonitorConfig(hbm_limit_fraction=1.5).validate()
    with pytest.raises(ConfigError):
        DistributedConfig(coordinator_address="x:1", num_processes=0).validate()
    DistributedConfig().validate()


def test_json_schema_window_and_scheduler_names():
    cfg = config_from_dict({
        "schedulers": ["least_slack_time_first"],
        "schedule_window_size": 5,
        "workers": [{"device": "cpu", "device_ids": [0]}],
    })
    assert cfg.planner.schedule_window_size == 5
    assert cfg.planner.schedulers == [bt.SchedulerType.LEAST_SLACK_TIME_FIRST]


# ---------------------------------------------------------------------------
# logger (≙ band/logger.{h,cc} reporter/verbosity/last-log semantics)
# ---------------------------------------------------------------------------

def test_logger_reporter_verbosity_and_last_log():
    lg = Logger()  # fresh instance, not the singleton
    seen = []
    handle = lg.add_reporter(lambda sev, msg: seen.append((sev, msg)))

    lg.set_verbosity(LogSeverity.WARNING)
    lg.log(LogSeverity.INFO, "quiet %d", 1)
    assert seen == []  # below verbosity: suppressed...
    assert lg.get_last_log() == (LogSeverity.INFO, "quiet 1")  # ...but recorded

    lg.log(LogSeverity.ERROR, "boom")
    assert seen == [(LogSeverity.ERROR, "boom")]

    lg.remove_reporter(handle)
    lg.log(LogSeverity.ERROR, "after removal")
    assert len(seen) == 1


def test_logger_log_once():
    lg = Logger()
    seen = []
    lg.add_reporter(lambda sev, msg: seen.append(msg))
    lg.set_verbosity(LogSeverity.DEBUG)
    for _ in range(3):
        lg.log_once("key", LogSeverity.INFO, "only once")
    assert seen == ["only once"]


# ---------------------------------------------------------------------------
# chrome trace (≙ chrome_tracer/tracer.cc:194-265 JSON emit)
# ---------------------------------------------------------------------------

def test_job_tracer_emits_valid_chrome_trace(tmp_path):
    tr = JobTracer()
    tr.enable()
    tr.register_worker(0, "tpu:0")
    job = Job(model_id=3, job_id=7)
    job.subgraph_key = SubgraphKey(model_id=3, worker_id=0,
                                   unit_indices=frozenset({0, 1}))
    tr.begin_subgraph(job)
    tr.end_subgraph(job)
    tr.instant("slo_drop", {"job": 7})
    out = tmp_path / "trace.json"
    tr.dump(str(out))

    payload = json.loads(out.read_text())
    events = payload["traceEvents"]
    phases = [e["ph"] for e in events]
    assert "M" in phases and "B" in phases and "E" in phases and "i" in phases
    b = next(e for e in events if e["ph"] == "B")
    assert b["tid"] == 0 and "job7" in b["name"]
    meta = next(e for e in events if e["ph"] == "M")
    assert meta["args"]["name"] == "tpu:0"

    # disabled tracer records nothing
    tr2 = JobTracer()
    tr2.begin_subgraph(job)
    tr2.end_subgraph(job)
    assert tr2._events == []


def test_device_trace_hooks(tmp_path):
    """Engine.start/stop_device_trace wrap jax.profiler (xprof) and
    leave a trace dump in the target dir."""
    import os

    import band_tpu as bt

    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        import numpy as np

        mid = eng.register_model(
            bt.Model.from_path(
                "/root/reference/band/test/data/add.tflite"
            )
        )
        trace_dir = str(tmp_path / "xprof")
        eng.start_device_trace(trace_dir)
        eng.request_sync(mid, [np.ones((1, 8, 8, 3), np.float32)])
        eng.stop_device_trace()
        found = []
        for root, _, files in os.walk(trace_dir):
            found += files
        assert any(f.endswith(".xplane.pb") or "trace" in f for f in found)
    finally:
        eng.shutdown()
