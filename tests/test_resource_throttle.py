"""Resource-aware worker throttling: the ResourceMonitor consumer the
reference wired but never implemented (band/resource_monitor.h:88-95,
SURVEY §5.5).  Thermal pressure throttles host workers; schedulers see
them as unavailable and route around; recovery restores them."""

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.runtime.worker import LARGE_WAITING_TIME
from tests.conftest import has_model, model_path


@pytest.fixture
def engine():
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.ROUND_ROBIN)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    cfg.monitor.thermal_limit_mc = 90_000.0
    eng = bt.Engine.create(cfg)
    yield eng
    eng.shutdown()


def test_thermal_throttle_and_recovery(engine):
    assert engine.get_idle_workers() == [0, 1]

    engine._on_resource_update({"thermal_zone0_mC": 95_000.0})
    assert not engine.is_worker_available(0)
    assert not engine.is_worker_available(1)
    assert engine.workers[0].get_waiting_time() == LARGE_WAITING_TIME

    engine._on_resource_update({"thermal_zone0_mC": 60_000.0})
    assert engine.is_worker_available(0)
    assert engine.is_worker_available(1)


def test_throttled_worker_still_serves_after_recovery(engine):
    if not has_model("add"):
        pytest.skip("reference model not available")
    mid = engine.register_model(bt.Model.from_path(model_path("add")))
    x = np.ones((1, 8, 8, 3), np.float32)

    engine._on_resource_update({"thermal_zone1_mC": 99_000.0})
    engine._on_resource_update({"thermal_zone1_mC": 50_000.0})
    out = engine.request_sync(mid, [x], timeout=60)
    np.testing.assert_allclose(out[0], 3 * x, rtol=1e-5)


def test_hbm_throttle_targets_only_that_device():
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.ROUND_ROBIN)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    cfg.monitor.hbm_limit_fraction = 0.9
    eng = bt.Engine.create(cfg)
    try:
        # CPU workers are host workers: HBM policy must not touch them
        eng._on_resource_update({
            "dev0_hbm_in_use_bytes": 99.0,
            "dev0_hbm_limit_bytes": 100.0,
        })
        assert eng.is_worker_available(0)
        assert eng.is_worker_available(1)
    finally:
        eng.shutdown()
