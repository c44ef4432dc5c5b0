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


def test_fake_metrics_source_feeds_snapshots():
    """Pluggable device-metric sources (devfreq clocks / libtpu duty
    cycle, VERDICT r2 missing #2) merge into every monitor snapshot."""
    from band_tpu.monitor.resource_monitor import ResourceMonitor

    calls = {"n": 0}

    def fake_source():
        calls["n"] += 1
        return {"devfreq_tpu0_hz": 940_000_000.0,
                "tpu0_duty_cycle_pct": 55.0}

    mon = ResourceMonitor(interval_ms=10, metrics_sources=[fake_source])
    mon.start()
    import time

    deadline = time.monotonic() + 5.0
    snap = {}
    while time.monotonic() < deadline:
        snap = mon.status()
        if "devfreq_tpu0_hz" in snap:
            break
        time.sleep(0.01)
    mon.stop()
    assert snap.get("devfreq_tpu0_hz") == 940_000_000.0
    assert snap.get("tpu0_duty_cycle_pct") == 55.0
    assert calls["n"] >= 1


def test_broken_metrics_source_is_ignored():
    from band_tpu.monitor.resource_monitor import ResourceMonitor

    def broken():
        raise RuntimeError("no metrics here")

    mon = ResourceMonitor(interval_ms=10, metrics_sources=[broken])
    snap = mon._collect()
    assert "ts" in snap  # collection survives the failing source


def _clock_policy_engine():
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.ROUND_ROBIN)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    return cfg


def test_device_clock_policy_throttles_accelerators(monkeypatch):
    """A downclocked device (thermal throttling, the devfreq signal the
    reference polled) marks accelerator workers unavailable; recovery
    restores them."""
    cfg = _clock_policy_engine()
    cfg.monitor.min_device_clock_hz = 900_000_000.0
    eng = bt.Engine.create(cfg)
    try:
        # treat worker 1 as an accelerator for the policy check
        monkeypatch.setattr(
            eng, "_worker_is_host", lambda wid: wid == 0
        )
        eng._on_resource_update({"devfreq_tpu0_hz": 500_000_000.0})
        assert eng.is_worker_available(0)       # host untouched
        assert not eng.is_worker_available(1)   # accelerator throttled
        eng._on_resource_update({"devfreq_tpu0_hz": 940_000_000.0})
        assert eng.is_worker_available(1)
    finally:
        eng.shutdown()


def test_duty_cycle_policy_throttles_and_recovers(monkeypatch):
    cfg = _clock_policy_engine()
    cfg.monitor.max_duty_cycle_pct = 95.0
    eng = bt.Engine.create(cfg)
    try:
        monkeypatch.setattr(
            eng, "_worker_is_host", lambda wid: wid == 0
        )
        eng._on_resource_update({"tpu0_duty_cycle_pct": 99.0})
        assert not eng.is_worker_available(1)
        eng._on_resource_update({"tpu0_duty_cycle_pct": 60.0})
        assert eng.is_worker_available(1)
    finally:
        eng.shutdown()


def test_hbm_and_clock_policies_compose(monkeypatch):
    """One policy clearing must not un-throttle a worker another policy
    still wants throttled (OR-composition of decisions)."""
    cfg = _clock_policy_engine()
    cfg.monitor.hbm_limit_fraction = 0.9
    cfg.monitor.min_device_clock_hz = 900_000_000.0
    eng = bt.Engine.create(cfg)
    try:
        monkeypatch.setattr(
            eng, "_worker_is_host", lambda wid: wid == 0
        )
        devs = eng._worker_devices[1]
        did = getattr(devs[0], "id", 0)
        # HBM pressure AND healthy clock: still throttled
        eng._on_resource_update({
            f"dev{did}_hbm_in_use_bytes": 99.0,
            f"dev{did}_hbm_limit_bytes": 100.0,
            "devfreq_tpu0_hz": 940_000_000.0,
        })
        assert not eng.is_worker_available(1)
        # both clear: recovers
        eng._on_resource_update({
            f"dev{did}_hbm_in_use_bytes": 10.0,
            f"dev{did}_hbm_limit_bytes": 100.0,
            "devfreq_tpu0_hz": 940_000_000.0,
        })
        assert eng.is_worker_available(1)
    finally:
        eng.shutdown()
