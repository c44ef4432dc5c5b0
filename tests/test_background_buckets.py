"""Background bucket warming (VERDICT r4 next-round #5).

register_model compiles and profiles only the b1 executable
synchronously; continuous-batching buckets warm on a background thread.
Contracts:
 * registration does not execute any bucket > 1 synchronously
 * while warming, workers cap coalescing at the largest warm bucket
   (no dispatch ever pays a first-run bucket compile)
 * wait_buckets_ready drains the warmer; afterwards every bucket is
   warm and the top bucket has a profiled latency (interpolation
   endpoint for the batch-aware cost model)
 * background_buckets=False restores the synchronous round-4 path
"""

import threading
import time

import numpy as np
import pytest

import band_tpu as bt

ADD = "/root/reference/band/test/data/add.tflite"


def _build(background: bool, max_batch: int = 8):
    b = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                                  max_batch=max_batch))
        .profile_warmups(0)
        .profile_runs(1)
    )
    cfg = b.build()
    cfg.profile.background_buckets = background
    return cfg


def test_registration_skips_synchronous_bucket_compiles():
    eng = bt.Engine.create(_build(background=True))
    try:
        seen = []
        import band_tpu.backend.executor as ex_mod

        orig = ex_mod.ModelExecutor.execute_batched

        def spy(self, key, inputs_batch):
            seen.append((threading.current_thread().name, len(inputs_batch)))
            return orig(self, key, inputs_batch)

        ex_mod.ModelExecutor.execute_batched = spy
        try:
            t0 = time.monotonic()
            mid = eng.register_model(bt.Model.from_path(ADD))
            reg_names = {n for n, _ in seen}
            # no bucket execution ran on the registering thread
            assert not any("Main" in n or "pytest" in n for n in reg_names), seen
            # serving works immediately at b1
            x = np.full((1, 8, 8, 3), 2.0, np.float32)
            np.testing.assert_allclose(
                eng.request_sync(mid, [x], timeout=30)[0], x * 3.0
            )
            assert eng.wait_buckets_ready(timeout=60)
            # warmer executed buckets 2..8 on its own thread
            warm_names = {n for n, _ in seen}
            assert any("bucket-warmer" in n for n in warm_names), seen
        finally:
            ex_mod.ModelExecutor.execute_batched = orig
        rec = eng.model_record(mid)
        for key in rec.subgraph_keys:
            ex = rec.executors[key.worker_id]
            for b in (2, 4, 8):
                assert ex.is_warm(key, b), (key, b)
            # top bucket profiled -> batch-aware interpolation endpoint
            assert eng.latency_estimator.get_profiled(key, 8) > 0
            # warm-up drained: the cap is lifted
            assert eng.ready_batch_limit(key) >= 8
    finally:
        eng.shutdown()


def test_window_capped_at_largest_warm_bucket():
    """A batched request burst arriving before buckets warm must not
    trigger a compile at dispatch: windows stay within the largest
    warm bucket while the key is warming."""
    eng = bt.Engine.create(_build(background=True, max_batch=8))
    try:
        # stall the warmer so the ramp state is observable
        gate = threading.Event()
        orig_warm = eng._warm_one_bucket
        warmed = []

        def slow_warm(key, bucket):
            gate.wait(30.0)
            warmed.append(bucket)
            return orig_warm(key, bucket)

        eng._warm_one_bucket = slow_warm
        mid = eng.register_model(bt.Model.from_path(ADD))
        rec = eng.model_record(mid)
        key = rec.subgraph_keys[0]
        assert eng.ready_batch_limit(key) == 1  # nothing warm yet

        dispatched = []
        ex = rec.executors[key.worker_id]
        orig_exec = ex.execute_batched

        def spy(k, inputs_batch):
            dispatched.append(len(inputs_batch))
            return orig_exec(k, inputs_batch)

        ex.execute_batched = spy
        x = np.full((1, 8, 8, 3), 2.0, np.float32)
        jids = eng.request_async_batch([mid] * 12, [[x]] * 12)
        st = eng.wait_all(jids, timeout=30)
        assert all(s == bt.JobStatus.SUCCESS for s in st.values()), st
        # every dispatch stayed at b1 (the only warm bucket)
        assert all(b == 1 for b in dispatched), dispatched
        # release the warmer; the window grows to the full bucket set
        gate.set()
        assert eng.wait_buckets_ready(timeout=60)
        assert eng.ready_batch_limit(key) >= 8
        dispatched.clear()
        jids = eng.request_async_batch([mid] * 12, [[x]] * 12)
        st = eng.wait_all(jids, timeout=30)
        assert all(s == bt.JobStatus.SUCCESS for s in st.values()), st
        assert any(b > 1 for b in dispatched), dispatched
    finally:
        gate.set()
        eng.shutdown()


def test_sync_mode_precompiles_all_buckets():
    eng = bt.Engine.create(_build(background=False))
    try:
        mid = eng.register_model(bt.Model.from_path(ADD))
        rec = eng.model_record(mid)
        for key in rec.subgraph_keys:
            ex = rec.executors[key.worker_id]
            for b in (2, 4, 8):
                assert ex.is_warm(key, b), (key, b)
            assert eng.latency_estimator.get_profiled(key, 8) > 0
        assert not eng._warming_keys
    finally:
        eng.shutdown()
