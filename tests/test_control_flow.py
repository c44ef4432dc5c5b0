"""Control-flow ops: WHILE and IF over sibling subgraphs, compiled as
one XLA computation (lax.while_loop / lax.cond) and verified against
the TFLite interpreter's control-flow kernels."""

import os

import jax
import numpy as np
import pytest

import band_tpu as bt
from band_tpu.backend.program import build_program
from band_tpu.tflite.parser import parse_tflite_file
from tests.conftest import make_tfl_interpreter

DATA = os.path.join(os.path.dirname(__file__), "data")


def _run_band(path, feeds_by_pos):
    g = parse_tflite_file(path)
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    by_tid = dict(zip(g.inputs, feeds_by_pos))
    outs = fn({k: np.asarray(v) for k, v in prog.params.items()},
              [by_tid[t] for t in prog.input_ids])
    return [np.asarray(o) for o in outs]


def _run_tfl(path, feeds_by_pos):
    it = make_tfl_interpreter(path)
    it.allocate_tensors()
    dets = it.get_input_details()
    for d, v in zip(dets, feeds_by_pos):
        it.set_tensor(d["index"], v)
    it.invoke()
    return [it.get_tensor(d["index"]) for d in it.get_output_details()]


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "while_loop.tflite")),
    reason="generated model missing",
)
def test_while_loop_matches_interpreter(rng):
    path = os.path.join(DATA, "while_loop.tflite")
    x = rng.standard_normal((1, 8)).astype(np.float32)
    ref = _run_tfl(path, [x])
    got = _run_band(path, [x])
    assert len(got) == len(ref)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "cond.tflite")),
    reason="generated model missing",
)
def test_if_matches_interpreter_both_branches(rng):
    path = os.path.join(DATA, "cond.tflite")
    g = parse_tflite_file(path)
    # input order by tensor id: find which input is the bool flag
    for flag_val in (True, False):
        feeds = []
        for t in g.inputs:
            td = g.tensor(t)
            if td.dtype == np.bool_:
                feeds.append(np.asarray(flag_val))
            else:
                feeds.append(
                    rng.standard_normal(
                        [max(s, 1) for s in td.shape]
                    ).astype(np.float32)
                )
        ref = _run_tfl(path, feeds)
        got = _run_band(path, feeds)
        for r, o in zip(ref, got):
            np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "while_loop.tflite")),
    reason="generated model missing",
)
def test_while_served_through_engine(rng):
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        path = os.path.join(DATA, "while_loop.tflite")
        mid = eng.register_model(bt.Model.from_path(path))
        x = rng.standard_normal((1, 8)).astype(np.float32)
        out = eng.request_sync(mid, [x])
        ref = _run_tfl(path, [x])
        np.testing.assert_allclose(out[0], ref[0], rtol=1e-5, atol=1e-6)
    finally:
        eng.shutdown()


def test_keras3_dynamic_while_lstm_matches_interpreter(rng):
    """keras-3-converted LSTMs lower recurrence as WHILE bodies whose
    TensorArray writes are dynamically shaped slice/concat chains; the
    lowering rewrites `concat(buf[:i], v, buf[i+1:])` into one
    `lax.dynamic_update_slice` so the whole loop still compiles with
    static shapes."""
    path = os.path.join(DATA, "lstm_seq_while.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    x = rng.standard_normal((1, 12, 16)).astype(np.float32)
    ref = _run_tfl(path, [x])
    got = _run_band(path, [x])
    for r, o in zip(ref, got):
        np.testing.assert_allclose(o, r, rtol=2e-5, atol=2e-6)


def test_keras3_gru_while_matches_interpreter(rng):
    """GRU has no fused TFLite builtin — keras-3 converts it as WHILE
    loops too, exercising the TensorArray rewrite on another cell."""
    path = os.path.join(DATA, "gru_seq_while.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    x = rng.standard_normal((1, 10, 12)).astype(np.float32)
    ref = _run_tfl(path, [x])
    got = _run_band(path, [x])
    for r, o in zip(ref, got):
        np.testing.assert_allclose(o, r, rtol=2e-5, atol=2e-6)
