"""Continuous batching under global-queue schedulers (TPU-native
extension): HEFT stacks same-(model, progress) window jobs onto the
claimed idle worker, and the GlobalQueueWorker executes them as ONE
batched dispatch while keeping single-slot semantics
(reference baseline: worker_global_queue.cc's one-job slot)."""

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.common import Job, SubgraphKey
from band_tpu.config import WorkerSpec
from band_tpu.runtime.worker import GlobalQueueWorker
from band_tpu.schedulers.heft import HEFTScheduler
from tests.mock_engine import MockEngine


class BatchMockEngine(MockEngine):
    def __init__(self, *a, batch_limit=4, **kw):
        super().__init__(*a, **kw)
        self.batch_limit = batch_limit

    def get_worker_batch_limit(self, worker_id):
        return self.batch_limit


def _jobs(model_id, n):
    return [Job(model_id=model_id, job_id=i, enqueue_time=1) for i in range(n)]


def test_heft_stacks_same_model_jobs():
    eng = BatchMockEngine(num_workers=2, num_units_per_model={0: 1},
                          batch_limit=3)
    k0 = eng.whole_key(0, 0)
    k1 = eng.whole_key(0, 1)
    eng.set_latency(k0, 100)
    eng.set_latency(k1, 150)  # attractive once worker 0 is claimed (+100)
    sched = HEFTScheduler(eng)
    import collections

    q = collections.deque(_jobs(0, 5))
    actions = sched.schedule(q)
    # worker 0 (fastest) claimed by the most urgent job + 2 stacked;
    # next round's pick lands on worker 1, stacking the last one
    keys = [k for _, k in actions]
    assert keys.count(k0) == 3
    assert keys.count(k1) == 2
    assert len(q) == 0


def test_heft_no_stacking_when_limit_1():
    eng = BatchMockEngine(num_workers=1, num_units_per_model={0: 1},
                          batch_limit=1)
    k0 = eng.whole_key(0, 0)
    eng.set_latency(k0, 100)
    sched = HEFTScheduler(eng)
    import collections

    q = collections.deque(_jobs(0, 3))
    actions = sched.schedule(q)
    assert len(actions) == 1  # single slot, rest wait for next round


def test_global_worker_accepts_same_key_batch():
    eng = MockEngine(num_workers=1, num_units_per_model={0: 1, 1: 1})
    k0 = eng.whole_key(0, 0)
    k1 = eng.whole_key(1, 0)
    eng.set_latency(k0, 100)
    eng.set_latency(k1, 100)
    w = GlobalQueueWorker(eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU,
                                             max_batch=2))
    j0, j1, j2 = _jobs(0, 3)
    other = Job(model_id=1, job_id=9, enqueue_time=1)
    for j in (j0, j1, j2):
        j.subgraph_key = k0
    other.subgraph_key = k1
    assert w.enqueue_job(j0)
    assert not w.enqueue_job(other)  # different subgraph
    assert w.enqueue_job(j1)         # same key, within window
    assert not w.enqueue_job(j2)     # window full (max_batch=2)
    assert not w.is_enqueue_ready()
    got = w._dequeue_many()
    assert got == [j0, j1]
    assert not w.has_job()  # started: nothing left to dequeue


def test_heft_batched_end_to_end(rng):
    """Full engine: HEFT + max_batch → batch members share one dispatch
    (same invoke_time), everything succeeds."""
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  max_batch=8))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        import os

        path = os.path.join(os.path.dirname(__file__), "data",
                            "fc_int8.tflite")
        if not os.path.exists(path):
            pytest.skip("generated model missing")
        mid = eng.register_model(bt.Model.from_path(path))
        # buckets warm in the background since round 5; drain so the
        # burst below can stack (while warming, windows cap at the
        # largest warm bucket — tests/test_background_buckets.py)
        assert eng.wait_buckets_ready(timeout=60)
        g = eng.model_record(mid).model.graph
        feeds = [
            [
                rng.integers(-128, 128,
                             [max(s, 1) for s in g.tensor(t).shape]).astype(
                    g.tensor(t).dtype)
                for t in g.inputs
            ]
            for _ in range(16)
        ]
        ids = eng.request_async_batch([mid] * 16, feeds)
        st = eng.wait_all(ids, timeout=120)
        assert all(v == bt.JobStatus.SUCCESS for v in st.values())
        jobs = [eng.planner.get_finished_job(i) for i in ids]
        times = [j.invoke_time for j in jobs if j is not None]
        # at least one batched dispatch happened: shared invoke stamps
        assert len(set(times)) < len(times)
        # serial-vs-batched correctness: one more request, same input as
        # feeds[0], must match the batched result
        want = eng.request_sync(mid, feeds[0], timeout=60)
        got = jobs[0].final_outputs
        for w_, g_ in zip(want, got.values()):
            np.testing.assert_array_equal(np.asarray(g_), w_)
    finally:
        eng.shutdown()
