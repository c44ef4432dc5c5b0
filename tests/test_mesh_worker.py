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
