"""Engine.unregister_model (reference: engine.cc:291-316, which erases
its executor/spec/ring maps; ours additionally drains safely)."""

import threading
import time

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.errors import NotFound
DATA = "/root/reference/band/test/data"


def make_engine():
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .profile_warmups(1)
        .profile_runs(1)
        .build()
    )
    return bt.Engine.create(cfg)


@pytest.fixture
def engine():
    eng = make_engine()
    yield eng
    eng.shutdown()


def _register_add(engine):
    return engine.register_model(bt.Model.from_path(f"{DATA}/add.tflite"))


def test_unregister_then_request_raises(engine):
    model_id = _register_add(engine)
    x = np.full((1, 8, 8, 3), 2.0, np.float32)
    out = engine.request_sync(model_id, [x])
    np.testing.assert_allclose(out[0], x * 3.0)

    engine.unregister_model(model_id)
    assert not engine.has_model(model_id)
    with pytest.raises(NotFound):
        engine.request_sync(model_id, [x])
    # double unregister is NotFound too
    with pytest.raises(NotFound):
        engine.unregister_model(model_id)


def test_unregister_is_per_model(engine):
    a = _register_add(engine)
    b = _register_add(engine)
    x = np.full((1, 8, 8, 3), 1.5, np.float32)
    engine.unregister_model(a)
    out = engine.request_sync(b, [x])
    np.testing.assert_allclose(out[0], x * 3.0)
    assert engine.has_model(b) and not engine.has_model(a)


def test_mixed_batch_is_all_or_nothing(engine):
    """A batch mixing a valid model with an unregistered one must not
    partially enqueue: no ring slot allocated, no job id issued for the
    valid requests (VERDICT r3 weak #7; reference vector-request
    contract engine.cc:455-529)."""
    good = _register_add(engine)
    bad = _register_add(engine)
    engine.unregister_model(bad)
    x = np.full((1, 8, 8, 3), 2.0, np.float32)

    rec = engine._rec(good)
    in_head = rec.input_ring._head
    out_head = rec.output_ring._head
    counts_before = engine.get_model_execution_counts()

    with pytest.raises(NotFound):
        engine.request_async_batch([good, bad], [[x], [x]])

    # nothing staged or enqueued for the valid model
    assert rec.input_ring._head == in_head
    assert rec.output_ring._head == out_head
    time.sleep(0.1)
    assert engine.get_model_execution_counts() == counts_before
    # the engine still serves the valid model normally
    out = engine.request_sync(good, [x])
    np.testing.assert_allclose(out[0], x * 3.0)


def test_unregister_under_load_drains_cleanly(engine):
    """Unregister while requests stream in: no crash, the survivor model
    keeps serving, and the unregistered model's queued jobs fail instead
    of wedging the planner."""
    a = _register_add(engine)
    b = _register_add(engine)
    x = np.full((1, 8, 8, 3), 2.0, np.float32)

    stop = threading.Event()
    errors = []

    def pump(model_id):
        # bounded + paced so the post-churn assertion isn't queued behind
        # an unbounded backlog (the point is the race, not the load)
        for _ in range(300):
            if stop.is_set():
                return
            try:
                engine.request_async(model_id, [x])
            except NotFound:
                return  # expected once unregistered
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return
            time.sleep(0.001)

    threads = [
        threading.Thread(target=pump, args=(m,)) for m in (a, a, b)
    ]
    for t in threads:
        t.start()
    try:
        engine.unregister_model(a)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=10)
    assert not errors
    # engine still serves the survivor after the churn
    out = engine.request_sync(b, [x], timeout=30)
    np.testing.assert_allclose(out[0], x * 3.0)
