"""Soak: sustained concurrent serving with model churn and malformed
requests.  The engine must stay healthy — no dead planner/worker
threads, every well-formed request completes, and a final request is
still answered correctly (SURVEY §5.2: the rebuild owes stronger
concurrency assurance than the reference's none)."""

import threading
import time

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.errors import NotFound

ADD = "/root/reference/band/test/data/add.tflite"
SOAK_SECONDS = 8.0


@pytest.fixture
def engine():
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  max_batch=4))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,),
                                  max_batch=4))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    yield eng
    eng.shutdown()


def test_soak_serving_with_churn(engine):
    base = engine.register_model(bt.Model.from_path(ADD))
    x = np.full((1, 8, 8, 3), 2.0, np.float32)
    stop = threading.Event()
    unexpected = []
    completed = [0]
    lock = threading.Lock()

    def pump():
        while not stop.is_set():
            try:
                jid = engine.request_async(base, [x])
                st = engine.wait_all([jid], timeout=30)
                assert st.get(jid) == bt.JobStatus.SUCCESS, st
                with lock:
                    completed[0] += 1
            except Exception as e:  # pragma: no cover
                unexpected.append(e)
                return
            time.sleep(0.002)

    def churn():
        # register/unregister a second instance in a loop (hot swap)
        while not stop.is_set():
            try:
                mid = engine.register_model(bt.Model.from_path(ADD))
                for _ in range(3):
                    engine.request_async(mid, [x])
                engine.unregister_model(mid)
            except Exception as e:  # pragma: no cover
                unexpected.append(e)
                return
            time.sleep(0.01)

    def abuse():
        # malformed requests must fail on the caller, never the engine
        while not stop.is_set():
            try:
                engine.request_sync(base, [np.zeros((2, 2), np.float32)],
                                    timeout=5)
            except Exception:
                pass  # expected: shape mismatch / failed job
            try:
                engine.request_async(12345, [x])
            except NotFound:
                pass
            time.sleep(0.02)

    threads = [
        threading.Thread(target=pump),
        threading.Thread(target=pump),
        threading.Thread(target=churn),
        threading.Thread(target=abuse),
    ]
    for t in threads:
        t.start()
    time.sleep(SOAK_SECONDS)
    stop.set()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "soak thread wedged"

    assert not unexpected, unexpected
    assert completed[0] > 50  # sustained throughput, not a stall
    # planner + workers still alive and correct after the churn
    assert engine.planner._thread.is_alive()
    for w in engine.workers:
        assert w._thread.is_alive()
    out = engine.request_sync(base, [x], timeout=30)
    np.testing.assert_allclose(out[0], x * 3.0)


def test_batched_executable_cache_is_bounded(engine):
    """Per-(subgraph, bucket) executables must stay bounded by the
    power-of-two bucket set (<= log2(max_batch)+1 per subgraph), no
    matter how many window sizes serve (VERDICT r2 #6: jit-cache growth
    under endurance load).  Also: the finished-record ring stays at its
    cap."""
    import math

    mid = engine.register_model(bt.Model.from_path(ADD))
    x = np.full((1, 8, 8, 3), 2.0, np.float32)
    # fire windows of every size 1..max_batch, several rounds
    for _ in range(3):
        for b in range(1, 5):
            ids = engine.request_async_batch(
                [mid] * b, [[x]] * b
            )
            st = engine.wait_all(ids, timeout=60)
            assert all(
                s == bt.JobStatus.SUCCESS for s in st.values()
            ), st
    rec = engine.model_record(mid)
    max_batch = 4
    bound = int(math.log2(max_batch)) + 1
    for ex in rec.executors.values():
        for key, buckets in getattr(ex, "_batched", {}).items():
            assert len(buckets) <= bound, (key, sorted(buckets))
            assert all((b & (b - 1)) == 0 for b in buckets), buckets
    from band_tpu.runtime.planner import NUM_FINISHED_RECORDS

    assert len(engine.planner._finished) <= NUM_FINISHED_RECORDS
