"""Continuous batching: same-subgraph requests merge into one vmapped
dispatch without changing results."""

import numpy as np
import pytest

import band_tpu as bt
from tests.conftest import has_model, model_path


def test_batched_requests_match_serial(rng):
    if not has_model("add"):
        pytest.skip("reference model not available")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(
            bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,),
                          max_batch=8)
        )
        .profile_warmups(1)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        xs = [
            rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
            for _ in range(32)
        ]
        ids = eng.request_async_batch([mid] * 32, [[x] for x in xs])
        statuses = eng.wait_all(ids)
        assert all(s == bt.JobStatus.SUCCESS for s in statuses.values())
        for jid, x in zip(ids, xs):
            out = eng.get_outputs(jid)
            np.testing.assert_allclose(out[0], 3 * x, rtol=1e-5)
    finally:
        eng.shutdown()


def test_executor_execute_batched_direct(rng):
    if not has_model("ICN_quant"):
        pytest.skip("reference model not available")
    from band_tpu.backend.executor import ModelExecutor
    from band_tpu.tflite.parser import parse_tflite_file
    import jax

    g = parse_tflite_file(model_path("ICN_quant"))
    ex = ModelExecutor(0, g, 0, [jax.devices("cpu")[0]])
    key = ex.prepare_subgraph(range(len(g.ops)), [0])
    ins = [
        [rng.integers(-128, 128, (1, 14, 14, 3)).astype(np.int8)]
        for _ in range(4)
    ]
    batched = ex.execute_batched(key, ins)
    for ins_i, outs_i in zip(ins, batched):
        ref = ex.execute(key, ins_i)
        np.testing.assert_array_equal(
            np.asarray(outs_i[0]), np.asarray(ref[0])
        )
