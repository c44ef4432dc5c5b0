"""Hermetic scheduler tests against the mock engine (mirrors the
parameterized sweeps of band/test/scheduler_test.cc)."""

import collections

import pytest

from band_tpu.common import Job, JobStatus, SubgraphKey, now_us
from band_tpu.schedulers.fixed_worker import FixedWorkerScheduler
from band_tpu.schedulers.heft import HEFTScheduler
from band_tpu.schedulers.least_slack_first import LeastSlackFirstScheduler
from band_tpu.schedulers.round_robin import RoundRobinScheduler
from band_tpu.schedulers.shortest_expected_latency import (
    ShortestExpectedLatencyScheduler,
)
from tests.mock_engine import MockEngine


def make_queue(*jobs):
    return collections.deque(jobs)


def test_fixed_worker_uses_model_assignment():
    eng = MockEngine(num_workers=3)
    eng.model_workers = {0: 2}
    eng.latency[eng.whole_key(0, 2)] = 100
    sched = FixedWorkerScheduler(eng)
    q = make_queue(Job(model_id=0, job_id=1))
    actions = sched.schedule(q)
    assert len(actions) == 1
    job, key = actions[0]
    assert key.worker_id == 2
    assert not q


def test_fixed_worker_explicit_target_wins():
    eng = MockEngine(num_workers=3)
    eng.model_workers = {0: 2}
    eng.latency[eng.whole_key(0, 1)] = 100
    sched = FixedWorkerScheduler(eng)
    q = make_queue(Job(model_id=0, job_id=1, target_worker_id=1))
    actions = sched.schedule(q)
    assert actions[0][1].worker_id == 1


def test_round_robin_spreads_across_idle_workers():
    eng = MockEngine(num_workers=2)
    for w in range(2):
        eng.latency[eng.whole_key(0, w)] = 100
        eng.latency[eng.whole_key(1, w)] = 100
    sched = RoundRobinScheduler(eng)
    q = make_queue(Job(model_id=0, job_id=1), Job(model_id=1, job_id=2))
    actions = sched.schedule(q)
    assert len(actions) == 2
    assert {key.worker_id for _, key in actions} == {0, 1}
    assert not q


def test_round_robin_skips_busy_workers():
    eng = MockEngine(num_workers=2)
    eng.idle_workers = [1]
    for w in range(2):
        eng.latency[eng.whole_key(0, w)] = 100
    sched = RoundRobinScheduler(eng)
    q = make_queue(Job(model_id=0, job_id=1), Job(model_id=0, job_id=2))
    actions = sched.schedule(q)
    assert len(actions) == 1
    assert actions[0][1].worker_id == 1
    assert len(q) == 1


def test_sel_picks_fastest_worker_and_books_time():
    eng = MockEngine(num_workers=2)
    eng.latency[eng.whole_key(0, 0)] = 1000
    eng.latency[eng.whole_key(0, 1)] = 200
    sched = ShortestExpectedLatencyScheduler(eng)
    q = make_queue(Job(model_id=0, job_id=1), Job(model_id=0, job_id=2))
    actions = sched.schedule(q)
    assert len(actions) == 2
    # first lands on the fast worker; second should see the booked
    # waiting time (200) and still pick worker 1 (400 < 1000)
    assert actions[0][1].worker_id == 1
    assert actions[1][1].worker_id == 1


def test_sel_balances_when_queues_fill():
    eng = MockEngine(num_workers=2)
    eng.latency[eng.whole_key(0, 0)] = 300
    eng.latency[eng.whole_key(0, 1)] = 200
    sched = ShortestExpectedLatencyScheduler(eng)
    jobs = [Job(model_id=0, job_id=i) for i in range(4)]
    actions = sched.schedule(make_queue(*jobs))
    by_worker = collections.Counter(key.worker_id for _, key in actions)
    # 200/300: worker1 gets jobs at t=200,400; worker0 at t=300,600
    assert by_worker[1] >= 2 and by_worker[0] >= 1


def test_heft_only_dispatches_to_idle():
    eng = MockEngine(num_workers=2)
    eng.idle_workers = [0]
    eng.latency[eng.whole_key(0, 0)] = 300
    eng.latency[eng.whole_key(0, 1)] = 100
    sched = HEFTScheduler(eng)
    q = make_queue(Job(model_id=0, job_id=1))
    actions = sched.schedule(q)
    # best worker (1) is busy -> job yielded, not scheduled
    assert actions == []
    assert len(q) == 1


def test_heft_dispatches_when_best_idle():
    eng = MockEngine(num_workers=2)
    eng.latency[eng.whole_key(0, 0)] = 300
    eng.latency[eng.whole_key(0, 1)] = 100
    sched = HEFTScheduler(eng)
    q = make_queue(Job(model_id=0, job_id=1))
    actions = sched.schedule(q)
    assert len(actions) == 1
    assert actions[0][1].worker_id == 1


def test_lsf_orders_by_slack_and_drops_expired():
    eng = MockEngine(num_workers=1)
    eng.latency[eng.whole_key(0, 0)] = 100
    eng.latency[eng.whole_key(1, 0)] = 100
    sched = LeastSlackFirstScheduler(eng)
    now = now_us()
    tight = Job(model_id=0, job_id=1, slo_us=500)
    tight.enqueue_time = now
    loose = Job(model_id=1, job_id=2, slo_us=50_000)
    loose.enqueue_time = now
    expired = Job(model_id=0, job_id=3, slo_us=10)
    expired.enqueue_time = now - 1000
    q = make_queue(loose, expired, tight)
    actions = sched.schedule(q)
    # expired dropped and reported
    assert [j.job_id for j in eng.finished] == [3]
    assert eng.finished[0].status == JobStatus.SLO_VIOLATION
    # tightest slack scheduled first (single worker -> one action)
    assert len(actions) == 1
    assert actions[0][0].job_id == 1


def test_sel_multi_hop_uses_resolved_units():
    eng = MockEngine(num_workers=2, num_units_per_model={0: 2})
    k01 = SubgraphKey(0, 0, frozenset([0]))
    k11 = SubgraphKey(0, 1, frozenset([1]))
    eng.latency[k01] = 100
    eng.latency[k11] = 100
    sched = ShortestExpectedLatencyScheduler(eng)
    job = Job(model_id=0, job_id=1)
    job.resolved_unit_subgraphs = frozenset([0])
    actions = sched.schedule(make_queue(job))
    assert len(actions) == 1
    assert actions[0][1] == k11
