"""Engine end-to-end tests on the CPU platform (the desktop-fallback
analogue of the reference's tfl_minimal_test.cc / tfl_subgraph_test.cc)."""

import numpy as np
import pytest

import band_tpu as bt
from tests.conftest import has_model, model_path


def make_engine(scheduler=bt.SchedulerType.FIXED_WORKER, n_workers=2,
                **kw):
    b = bt.RuntimeConfigBuilder().add_scheduler(scheduler)
    for i in range(n_workers):
        b.add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(i,)))
    b.profile_warmups(1).profile_runs(1)
    for k, v in kw.items():
        getattr(b, k)(v)
    return bt.Engine.create(b.build())


@pytest.fixture
def add_engine():
    if not has_model("add"):
        pytest.skip("reference model not available")
    eng = make_engine()
    yield eng
    eng.shutdown()


def test_register_and_sync_request(add_engine, rng):
    m = bt.Model.from_path(model_path("add"))
    mid = add_engine.register_model(m)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    out = add_engine.request_sync(mid, [x])
    # add.tflite computes (x+x)+x = 3x
    np.testing.assert_allclose(out[0], 3 * x, rtol=1e-5)


def test_async_batch_and_callbacks(add_engine, rng):
    m = bt.Model.from_path(model_path("add"))
    mid = add_engine.register_model(m)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    done = []
    add_engine.register_callback(lambda jid, status: done.append((jid, status)))
    ids = add_engine.request_async_batch([mid] * 8, [[x]] * 8)
    statuses = add_engine.wait_all(ids)
    assert len(statuses) == 8
    assert all(s == bt.JobStatus.SUCCESS for s in statuses.values())
    assert sorted(j for j, _ in done) == sorted(ids)


def test_round_robin_multimodel(rng):
    if not has_model("add"):
        pytest.skip("reference model not available")
    eng = make_engine(scheduler=bt.SchedulerType.ROUND_ROBIN)
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        ids = eng.request_async_batch([mid] * 6, [[x]] * 6)
        statuses = eng.wait_all(ids)
        assert all(s == bt.JobStatus.SUCCESS for s in statuses.values())
        counts = eng.get_model_execution_counts()
        assert counts[mid] == 6
    finally:
        eng.shutdown()


def test_slo_violation_is_reported(rng):
    if not has_model("add"):
        pytest.skip("reference model not available")
    eng = make_engine()
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        # 1 µs SLO can never be met -> planner early-drops
        with pytest.raises(bt.DeadlineExceeded):
            eng.request_sync(
                mid, [x], bt.RequestOption(slo_us=1)
            )
    finally:
        eng.shutdown()


def test_latency_estimator_learns(rng):
    if not has_model("add"):
        pytest.skip("reference model not available")
    eng = make_engine()
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        rec = eng.model_record(mid)
        key = rec.subgraph_keys[0]
        assert eng.latency_estimator.get_profiled(key) > 0
        x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        eng.request_sync(mid, [x])
        assert eng.get_expected_latency(key) > 0
    finally:
        eng.shutdown()


def test_profile_persistence(tmp_path, rng):
    if not has_model("add"):
        pytest.skip("reference model not available")
    path = str(tmp_path / "profile.json")
    eng = make_engine(profile_data_path=path)
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        rec = eng.model_record(mid)
        key = rec.subgraph_keys[0]
        profiled = eng.latency_estimator.get_profiled(key)
        assert profiled > 0
    finally:
        eng.shutdown()
    # second engine with same config: loads instead of re-profiling
    eng2 = make_engine(profile_data_path=path)
    try:
        assert eng2.latency_estimator.load_profile(path)
        assert eng2.latency_estimator.get_profiled(key) == profiled
    finally:
        eng2.shutdown()


def test_wait_all_beyond_finished_ring_capacity():
    """wait_all over MORE ids than the finished ring holds
    (NUM_FINISHED_RECORDS=1000, reference parity) must still return
    every status: statuses are harvested incrementally as records land
    (round 4: the bench waited on 8000 ids and timed out with every
    thread idle because the old wait required all ids in the ring
    simultaneously)."""
    import band_tpu as bt
    from band_tpu.runtime.planner import NUM_FINISHED_RECORDS

    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU,
                                  device_ids=(0,), max_batch=32,
                                  dispatch_depth=8))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid = eng.register_model(
            bt.Model.from_path(model_path("add"))
        )
        import jax

        # staged device input (the serving mode): bypasses the input
        # ring, whose 128-slot validity window is the intended
        # backpressure for un-staged floods
        x = jax.device_put(
            np.full((1, 8, 8, 3), 2.0, np.float32),
            jax.devices("cpu")[0],
        )
        n = 3 * NUM_FINISHED_RECORDS
        ids = []
        while len(ids) < n:
            k = min(32, n - len(ids))
            ids += eng.request_async_batch([mid] * k, [[x]] * k)
        st = eng.wait_all(ids, timeout=120)
        assert len(st) == n, f"missing {n - len(st)} statuses"
        assert all(s == bt.JobStatus.SUCCESS for s in st.values())
    finally:
        eng.shutdown()
