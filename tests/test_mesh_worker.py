"""Mesh (multi-device, tensor-sharded) worker tests on the virtual
8-device CPU platform — the multi-chip serving tier without TPU pods."""

import numpy as np
import pytest

import band_tpu as bt
from tests.conftest import has_model, model_path


def test_mesh_worker_equals_single_device(rng):
    if not has_model("ICN_quant"):
        pytest.skip("reference model not available")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(
            bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0, 1, 2, 3))
        )
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(4,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid = eng.register_model(
            bt.Model.from_path(model_path("ICN_quant"))
        )
        x = rng.integers(-128, 128, (1, 14, 14, 3)).astype(np.int8)
        out_mesh = eng.request_sync(
            mid, [x], bt.RequestOption(target_worker=0)
        )
        out_single = eng.request_sync(
            mid, [x], bt.RequestOption(target_worker=1)
        )
        np.testing.assert_array_equal(out_mesh[0], out_single[0])
    finally:
        eng.shutdown()


def test_sharded_program_collectives(rng):
    """Direct ShardedProgram check: tp-sharded weights over 4 devices,
    dp-sharded batch over 2 — output must match the unsharded program."""
    if not has_model("ICN_quant"):
        pytest.skip("reference model not available")
    import jax

    from band_tpu.backend.program import build_program
    from band_tpu.parallel.mesh import ShardedProgram, make_mesh
    from band_tpu.tflite.parser import parse_tflite_file

    g = parse_tflite_file(model_path("ICN_quant"))
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    mesh = make_mesh(jax.devices("cpu")[:8], dp=2, tp=4)
    sp = ShardedProgram(prog, mesh, batch_size=2)
    x = rng.integers(-128, 128, (2, 1, 14, 14, 3)).astype(np.int8)
    out = np.asarray(sp([x])[0])

    fn = jax.jit(prog.make_fn())
    params = {k: np.asarray(v) for k, v in prog.params.items()}
    ref0 = np.asarray(fn(params, [x[0]])[0])
    ref1 = np.asarray(fn(params, [x[1]])[0])
    np.testing.assert_array_equal(out[0], ref0)
    np.testing.assert_array_equal(out[1], ref1)


def test_mesh_worker_batched_window_single_dispatch(rng):
    """A mesh worker must execute a 16-request continuous-batching
    window as ONE sharded dispatch (batch on "dp", weights on "tp"),
    with HEFT's global-queue stacking driving it (VERDICT r1 next-round
    #4: replaces the serial per-request fallback)."""
    if not has_model("add"):
        pytest.skip("reference model not available")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME)
        .add_worker(
            bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0, 1, 2, 3),
                          mesh_shape=(2, 2), max_batch=16)
        )
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    calls = []
    orig = eng.invoke_batched

    def counting_invoke_batched(key, inputs_list):
        calls.append(len(inputs_list))
        return orig(key, inputs_list)

    eng.invoke_batched = counting_invoke_batched
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        # the executor is a dp=2 x tp=2 mesh
        rec = eng.model_record(mid)
        ex = rec.executors[0]
        assert ex.mesh_dims() == (2, 2)
        xs = [
            rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
            for _ in range(16)
        ]
        ids = eng.request_async_batch([mid] * 16, [[x] for x in xs])
        st = eng.wait_all(ids, timeout=120, raise_on_incomplete=True)
        assert all(s == bt.JobStatus.SUCCESS for s in st.values())
        for jid, x in zip(ids, xs):
            out = eng.get_outputs(jid)[0]
            np.testing.assert_allclose(out, 3 * x, rtol=1e-5)
        # the whole window rode batched dispatches (HEFT stacking), not
        # 16 serial ones; with the single planner pass this is one
        # 16-request dispatch
        assert max(calls) == 16, calls
        # and the batched executable was the sharded-mesh one
        key = rec.subgraph_keys[0]
        assert 16 in ex._batched[key]
    finally:
        eng.shutdown()


def test_mesh_batched_fn_matches_unsharded(rng):
    """make_batched_fn output must equal per-request unsharded execution
    bit-for-bit (int8 model, dp=2 x tp=2)."""
    if not has_model("ICN_quant"):
        pytest.skip("reference model not available")
    import jax

    from band_tpu.backend.program import build_program
    from band_tpu.parallel.mesh import (
        ShardedProgram,
        make_batched_fn,
        make_mesh,
    )
    from band_tpu.tflite.parser import parse_tflite_file

    g = parse_tflite_file(model_path("ICN_quant"))
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    mesh = make_mesh(jax.devices("cpu")[:4], dp=2, tp=2)
    sp = ShardedProgram(prog, mesh, batch_size=1)
    fn = make_batched_fn(prog, mesh, batch=4)
    xs = [
        rng.integers(-128, 128, (1, 14, 14, 3)).astype(np.int8)
        for _ in range(4)
    ]
    outs = fn(sp.params, tuple((x,) for x in xs))

    ref_fn = jax.jit(prog.make_fn())
    params = {k: np.asarray(v) for k, v in prog.params.items()}
    for b, x in enumerate(xs):
        ref = np.asarray(ref_fn(params, [x])[0])
        np.testing.assert_array_equal(np.asarray(outs[b][0]), ref)
