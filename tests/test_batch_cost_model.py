"""Batch-aware cost model + noise-robust latency estimation.

Round-3 fixes for the batch-blind scheduler pricing (a stacked b8
window costs ~5x one b1 dispatch, docs/performance.md) and for the
transport-noise-poisoned EMA: the estimator keeps one record per
power-of-two bucket, interpolates between profiled buckets, takes the
median of profiling runs, and clips online EMA samples.

Reference contracts: band/latency_estimator.cc:32-45 (plain EMA — the
baseline to beat), band/worker_global_queue.cc:125-164 (waiting-time
contract the batched pricing must keep truthful)."""

import time

import pytest

import band_tpu as bt
from band_tpu.common import Job, SubgraphKey
from band_tpu.config import WorkerSpec
from band_tpu.runtime.latency_estimator import LatencyEstimator, bucketize
from band_tpu.runtime.worker import DeviceQueueWorker, GlobalQueueWorker
from band_tpu.schedulers.heft import HEFTScheduler
from tests.mock_engine import MockEngine


KEY = SubgraphKey(0, 0, frozenset([0]))


# ----------------------------------------------------------------------
# estimator: buckets
# ----------------------------------------------------------------------
def test_bucketize():
    assert [bucketize(b) for b in (1, 2, 3, 4, 5, 8, 9, 16)] == [
        1, 2, 4, 4, 8, 8, 16, 16,
    ]


def test_exact_bucket_lookup():
    est = LatencyEstimator()
    est.override(KEY, 100, batch=1)
    est.override(KEY, 500, batch=8)
    assert est.get_expected(KEY) == 100
    assert est.get_expected(KEY, 8) == 500
    assert est.get_expected(KEY, 5) == 500  # 5 buckets to 8


def test_bucket_interpolation_between_endpoints():
    est = LatencyEstimator()
    est.override(KEY, 100, batch=1)
    est.override(KEY, 800, batch=8)
    # linear in batch between (1, 100) and (8, 800)
    assert est.get_expected(KEY, 2) == 200
    assert est.get_expected(KEY, 4) == 400


def test_bucket_extrapolation_above_max():
    est = LatencyEstimator()
    est.override(KEY, 100, batch=1)
    est.override(KEY, 500, batch=8)
    # above the largest bucket: scale by average per-request cost
    assert est.get_expected(KEY, 16) == 1000
    assert est.get_expected(KEY, 32) == 2000


def test_bucket_below_min_floors_at_smallest():
    est = LatencyEstimator()
    est.override(KEY, 500, batch=8)
    # a batched program never gets cheaper than its smallest bucket
    assert est.get_expected(KEY, 1) == 500


def test_only_b1_known_assumes_linear_scaling():
    est = LatencyEstimator()
    est.override(KEY, 100, batch=1)
    # conservative (over-)estimate beats the 5x underestimate of
    # batch-flat pricing
    assert est.get_expected(KEY, 8) == 800


def test_updates_keep_buckets_separate():
    est = LatencyEstimator(smoothing_factor=1.0)
    est.update(KEY, 100, batch=1)
    est.update(KEY, 500, batch=8)
    est.update(KEY, 520, batch=7)  # same bucket as 8
    assert est.get_expected(KEY, 1) == 100
    assert est.get_expected(KEY, 8) == 520


# ----------------------------------------------------------------------
# estimator: noise robustness
# ----------------------------------------------------------------------
def test_ema_clips_latency_spike():
    """A 5x transport spike moves the estimate < 20% (VERDICT #7)."""
    est = LatencyEstimator(smoothing_factor=0.1)
    est.update(KEY, 1000)
    est.update(KEY, 5000)
    moved = abs(est.get_expected(KEY) - 1000) / 1000.0
    assert moved < 0.20, est.get_expected(KEY)
    # symmetric: a 5x dip is clipped too
    est2 = LatencyEstimator(smoothing_factor=0.1)
    est2.update(KEY, 1000)
    est2.update(KEY, 200)
    assert abs(est2.get_expected(KEY) - 1000) / 1000.0 < 0.20


def test_ema_converges_to_genuine_shift():
    """Clipping slows but does not block convergence to a real 3x
    regression (each update still moves toward the new level)."""
    est = LatencyEstimator(smoothing_factor=0.1)
    est.update(KEY, 1000)
    for _ in range(60):
        est.update(KEY, 3000)
    assert est.get_expected(KEY) > 2700


def test_clip_disabled_matches_reference_ema():
    est = LatencyEstimator(smoothing_factor=0.1, outlier_clip=0.0)
    est.update(KEY, 1000)
    est.update(KEY, 5000)
    assert est.get_expected(KEY) == int(0.1 * 5000 + 0.9 * 1000)


def test_profile_uses_median_of_runs():
    est = LatencyEstimator(num_warmups=0, num_runs=5)
    delays_ms = iter([1, 1, 30, 1, 1])  # one spike mid-profile

    def invoke():
        time.sleep(next(delays_ms) / 1000.0)

    us = est.profile(KEY, invoke)
    assert us < 10_000, us  # median ~1 ms; the mean would be ~6.8 ms


# ----------------------------------------------------------------------
# estimator: persistence
# ----------------------------------------------------------------------
def test_bucketed_profile_roundtrip(tmp_path):
    path = str(tmp_path / "profile.json")
    est = LatencyEstimator(profile_data_path=path, config_hash="h1")
    est.override(KEY, 100, batch=1)
    est.override(KEY, 500, batch=8)
    est.dump_profile()
    est2 = LatencyEstimator(profile_data_path=path, config_hash="h1")
    assert est2.get_expected(KEY, 1) == 100
    assert est2.get_expected(KEY, 8) == 500
    # stale hash ignored
    est3 = LatencyEstimator(profile_data_path=path, config_hash="h2")
    assert est3.get_expected(KEY, 1) == -1


def test_legacy_flat_profile_loads_as_bucket1(tmp_path):
    import json

    path = str(tmp_path / "profile.json")
    with open(path, "w") as f:
        json.dump(
            {
                "hash": "h",
                "latency": {
                    "0:0:0": {"profiled": 123, "moving_averaged": 140}
                },
            },
            f,
        )
    est = LatencyEstimator(profile_data_path=path, config_hash="h")
    assert est.get_expected(KEY, 1) == 140
    assert est.get_profiled(KEY) == 123


# ----------------------------------------------------------------------
# workers: batch-aware waiting times
# ----------------------------------------------------------------------
class BatchMockEngine(MockEngine):
    def __init__(self, *a, batch_limit=8, **kw):
        super().__init__(*a, **kw)
        self.batch_limit = batch_limit

    def get_worker_batch_limit(self, worker_id):
        return self.batch_limit


def _same_key_jobs(key, n):
    jobs = [Job(model_id=key.model_id, job_id=i, enqueue_time=1)
            for i in range(n)]
    for j in jobs:
        j.subgraph_key = key
    return jobs


def test_device_queue_prices_queued_window_at_bucket_cost():
    eng = MockEngine(num_workers=1, num_units_per_model={0: 1})
    key = eng.whole_key(0, 0)
    eng.set_latency(key, 100)
    eng.batch_latency[(key, 8)] = 500
    w = DeviceQueueWorker(
        eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU, max_batch=8)
    )
    for j in _same_key_jobs(key, 8):
        w._queue.append(j)  # enqueue without starting the thread
    # one 8-wide dispatch at its bucket cost — not 8x100, not 1x100
    assert w.get_waiting_time() == 500


def test_device_queue_prices_mixed_queue_per_dispatch():
    eng = MockEngine(num_workers=1, num_units_per_model={0: 1, 1: 1})
    k0, k1 = eng.whole_key(0, 0), eng.whole_key(1, 0)
    eng.set_latency(k0, 100)
    eng.set_latency(k1, 40)
    eng.batch_latency[(k0, 2)] = 150
    w = DeviceQueueWorker(
        eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU, max_batch=4)
    )
    for j in _same_key_jobs(k0, 2):
        w._queue.append(j)
    w._queue.append(_same_key_jobs(k1, 1)[0])
    # [k0, k0] coalesce to one b2 dispatch (150) + k1 alone (40)
    assert w.get_waiting_time() == 190


def test_device_queue_caps_runs_at_max_batch():
    eng = MockEngine(num_workers=1, num_units_per_model={0: 1})
    key = eng.whole_key(0, 0)
    eng.set_latency(key, 100)
    eng.batch_latency[(key, 2)] = 150
    w = DeviceQueueWorker(
        eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU, max_batch=2)
    )
    for j in _same_key_jobs(key, 4):
        w._queue.append(j)
    # coalesces into two b2 dispatches
    assert w.get_waiting_time() == 300


def test_device_queue_prices_inflight_group_once():
    eng = MockEngine(num_workers=1, num_units_per_model={0: 1})
    key = eng.whole_key(0, 0)
    eng.set_latency(key, 100)
    eng.batch_latency[(key, 4)] = 300
    w = DeviceQueueWorker(
        eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU, max_batch=4)
    )
    jobs = _same_key_jobs(key, 4)
    for j in jobs:
        j.invoke_time = 0  # not yet launched (no progress discount)
    w._inflight_jobs.extend(jobs)
    assert w.get_waiting_time() == 300


def test_global_queue_prices_batch_at_bucket_cost():
    eng = MockEngine(num_workers=1, num_units_per_model={0: 1})
    key = eng.whole_key(0, 0)
    eng.set_latency(key, 100)
    eng.batch_latency[(key, 4)] = 300
    w = GlobalQueueWorker(
        eng, 0, WorkerSpec(device=bt.DeviceFlag.CPU, max_batch=4)
    )
    for j in _same_key_jobs(key, 4):
        assert w.enqueue_job(j)
    assert w.get_waiting_time() == 300


# ----------------------------------------------------------------------
# HEFT: stacked windows priced at bucket cost
# ----------------------------------------------------------------------
def test_heft_stacking_prices_bucket_cost_and_stamps_batch_size():
    import collections

    eng = BatchMockEngine(
        num_workers=1, num_units_per_model={0: 1}, batch_limit=4
    )
    key = eng.whole_key(0, 0)
    eng.set_latency(key, 100)
    eng.batch_latency[(key, 4)] = 300
    sched = HEFTScheduler(eng)
    q = collections.deque(
        Job(model_id=0, job_id=i, enqueue_time=1) for i in range(4)
    )
    actions = sched.schedule(q)
    assert len(actions) == 4
    assert all(j.batch_size == 4 for j, _ in actions)


def test_heft_second_window_sees_bucket_cost_in_waiting():
    """With two workers and 8 same-model jobs at batch limit 4, the
    second window must see the first worker's waiting time as the b4
    bucket cost (300), not one b1 latency (100) — so it lands on the
    other worker despite its slower b1 latency."""
    import collections

    eng = BatchMockEngine(
        num_workers=2, num_units_per_model={0: 1}, batch_limit=4
    )
    k0, k1 = eng.whole_key(0, 0), eng.whole_key(0, 1)
    eng.set_latency(k0, 100)
    eng.set_latency(k1, 220)  # slower b1, but beats 300 + 100 waiting
    eng.batch_latency[(k0, 4)] = 300
    eng.batch_latency[(k1, 4)] = 660
    sched = HEFTScheduler(eng)
    q = collections.deque(
        Job(model_id=0, job_id=i, enqueue_time=1) for i in range(8)
    )
    actions = sched.schedule(q)
    keys = [k for _, k in actions]
    assert keys.count(k0) == 4
    assert keys.count(k1) == 4
