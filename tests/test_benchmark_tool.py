"""Benchmark tool tests (reference: band/test/tool/benchmark_test.cc):
config load success/failure + a short run."""

import json

import pytest

import band_tpu as bt
from band_tpu.tools.benchmark import Benchmark, BenchmarkConfig
from tests.conftest import has_model, model_path


def _mini_config(tmp_path, mode="stream", scheduler="round_robin",
                 running_ms=400):
    return {
        "models": [
            {
                "graph": model_path("add"),
                "period_ms": 50,
                "batch_size": 2,
                "slo_scale": 100.0,
            }
        ],
        "schedulers": [scheduler],
        "execution_mode": mode,
        "workers": [
            {"device": "cpu", "device_ids": [0]},
            {"device": "cpu", "device_ids": [1]},
        ],
        "running_time_ms": running_ms,
        "profile_online": True,
        "profile_warmup_runs": 1,
        "profile_num_runs": 1,
    }


def test_config_load_failures():
    with pytest.raises(bt.ConfigError):
        BenchmarkConfig.from_dict({"models": []})
    with pytest.raises(bt.ConfigError):
        BenchmarkConfig.from_dict(
            {"models": [{"graph": "x.tflite"}], "execution_mode": "bogus",
             "workers": ["cpu"]}
        )
    with pytest.raises(bt.ConfigError):
        BenchmarkConfig.from_dict(
            {"models": [{"graph": "x.tflite"}], "workers": []}
        )


def test_reference_schema_keys_accepted(tmp_path):
    """The reference config_samples schema parses (legacy device names,
    profile_warmup_runs, cpu_masks ignored...)."""
    d = {
        "models": [{"graph": "m.tflite", "period_ms": 30, "batch_size": 3}],
        "log_path": str(tmp_path / "log.json"),
        "schedulers": ["heterogeneous_earliest_finish_time"],
        "minimum_subgraph_size": 1,
        "subgraph_preparation_type": "merge_unit_subgraph",
        "execution_mode": "stream",
        "cpu_masks": "ALL",
        "num_threads": 1,
        "planner_cpu_masks": "PRIMARY",
        "workers": [
            {"device": "CPU", "num_threads": 2, "cpu_masks": "BIG"},
            {"device": "CPU", "num_threads": 2, "cpu_masks": "LITTLE"},
            {"device": "GPU", "num_threads": 1, "cpu_masks": "ALL"},
            {"device": "DSP", "num_threads": 1, "cpu_masks": "PRIMARY"},
            {"device": "NPU", "num_threads": 1, "cpu_masks": "PRIMARY"},
        ],
        "running_time_ms": 10000,
        "profile_smoothing_factor": 0.1,
        "profile_online": True,
        "profile_warmup_runs": 3,
        "profile_num_runs": 50,
        "allow_work_steal": True,
        "availability_check_interval_ms": 30000,
        "schedule_window_size": 10,
    }
    cfg = BenchmarkConfig.from_dict(d)
    assert cfg.execution_mode == "stream"
    assert len(cfg.runtime.worker.workers) == 5
    assert cfg.runtime.profile.num_warmups == 3
    devs = [w.device for w in cfg.runtime.worker.workers]
    assert devs.count(bt.DeviceFlag.CPU) == 2
    assert devs.count(bt.DeviceFlag.TPU) == 3


@pytest.mark.parametrize("mode", ["stream", "periodic"])
def test_short_run(tmp_path, mode):
    if not has_model("add"):
        pytest.skip("reference model not available")
    cfg = BenchmarkConfig.from_dict(_mini_config(tmp_path, mode=mode))
    bench = Benchmark(cfg, stage_inputs_on_device=False)
    try:
        report = bench.run()
    finally:
        bench.shutdown()
    assert report["total"]["processed"] > 0
    m0 = report["model_0"]
    assert m0["processed"] > 0
    assert m0["avg_latency_ms"] > 0
    assert 0.0 <= m0.get("slo_satisfaction", 1.0) <= 1.0


def test_workload_mode(tmp_path):
    if not has_model("add"):
        pytest.skip("reference model not available")
    d = _mini_config(tmp_path, mode="stream")
    d["execution_mode"] = "workload"
    d["workload"] = [
        {"time_ms": t, "model": 0, "batch": 2} for t in range(0, 100, 20)
    ]
    cfg = BenchmarkConfig.from_dict(d)
    bench = Benchmark(cfg, stage_inputs_on_device=False)
    try:
        report = bench.run()
    finally:
        bench.shutdown()
    assert report["total"]["processed"] == 10
    assert report["total"]["canceled"] == 0


def test_workload_mode_requires_trace(tmp_path):
    d = _mini_config(tmp_path)
    d["execution_mode"] = "workload"
    with pytest.raises(bt.ConfigError):
        BenchmarkConfig.from_dict(d)


def test_stream_co_dispatch_fuses_rounds(tmp_path):
    """The fused capacity-stream shape (configs/benchmark_slo_mix_
    stream.json): models pinned to one DeviceQueue worker with
    co_dispatch > 1 pre-warm their combined executable at setup and
    every steady-state round serves as fused dispatches."""
    if not has_model("add"):
        pytest.skip("reference model not available")
    d = {
        "models": [
            {
                "graph": model_path("add"),
                "batch_size": 4,
                "worker_id": 0,
                "slo_us": -1,
            },
            {
                "graph": "tests/data/fc_int8.tflite",
                "batch_size": 4,
                "worker_id": 0,
                "slo_us": -1,
            },
        ],
        "schedulers": ["fixed_worker"],
        "execution_mode": "stream",
        "workers": [
            {
                "device": "cpu",
                "device_ids": [0],
                "max_batch": 4,
                "dispatch_depth": 4,
                "co_dispatch": 2,
            }
        ],
        "running_time_ms": 400,
        "profile_online": True,
        "profile_warmup_runs": 1,
        "profile_num_runs": 1,
    }
    cfg = BenchmarkConfig.from_dict(d)
    bench = Benchmark(cfg, stage_inputs_on_device=False)
    try:
        # setup pre-built the 2-model combo (per-model batch sizes)
        assert bench.engine._combo_state, "no combo scheduled at setup"
        report = bench.run()
        fused = bench.engine.co_dispatch_count
    finally:
        bench.shutdown()
    assert report["total"]["processed"] > 0
    assert report["total"]["canceled"] == 0
    assert fused > 0, "stream rounds never fused"
