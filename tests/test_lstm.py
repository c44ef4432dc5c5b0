"""Recurrent model family: fused UNIDIRECTIONAL_SEQUENCE_LSTM (the op
keras LSTM layers convert to; reference backend runs it via TFLite's
lstm_eval float kernel).  Verified against the interpreter and served
end-to-end through the engine."""

import os

import jax
import numpy as np
import pytest

import band_tpu as bt
from band_tpu.backend.program import build_program
from band_tpu.tflite.parser import parse_tflite_file
from tests.conftest import make_tfl_interpreter, random_feeds

DATA = os.path.join(os.path.dirname(__file__), "data")
MODEL = os.path.join(DATA, "lstm_seq.tflite")


def _oracle(path, rng):
    it = make_tfl_interpreter(path)
    it.allocate_tensors()
    feeds = random_feeds(it, rng)
    for d in it.get_input_details():
        it.set_tensor(d["index"], feeds[d["index"]])
    it.invoke()
    ref = {d["index"]: it.get_tensor(d["index"])
           for d in it.get_output_details()}
    return feeds, ref


@pytest.mark.skipif(not os.path.exists(MODEL), reason="generated model missing")
def test_fused_lstm_matches_interpreter(rng):
    feeds, ref = _oracle(MODEL, rng)
    g = parse_tflite_file(MODEL)
    hist = g.op_histogram()
    assert hist.get("UNIDIRECTIONAL_SEQUENCE_LSTM", 0) == 2
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    outs = fn({k: np.asarray(v) for k, v in prog.params.items()},
              [feeds[t] for t in prog.input_ids])
    got = {t: np.asarray(o) for t, o in zip(prog.output_ids, outs)}
    for tid, r in ref.items():
        np.testing.assert_allclose(got[tid], r, rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(not os.path.exists(MODEL), reason="generated model missing")
def test_lstm_served_through_engine(rng):
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
        mid = eng.register_model(bt.Model.from_path(MODEL))
        x = rng.standard_normal((1, 12, 16)).astype(np.float32)
        out = eng.request_sync(mid, [x])
        assert out[0].shape == (1, 10)
        np.testing.assert_allclose(out[0].sum(), 1.0, rtol=1e-4)

        it = make_tfl_interpreter(MODEL)
        it.allocate_tensors()
        it.set_tensor(it.get_input_details()[0]["index"], x)
        it.invoke()
        ref = it.get_tensor(it.get_output_details()[0]["index"])
        np.testing.assert_allclose(out[0], ref, rtol=2e-5, atol=2e-6)
    finally:
        eng.shutdown()


MODEL_INT8 = os.path.join(DATA, "lstm_seq_int8.tflite")


@pytest.mark.skipif(not os.path.exists(MODEL_INT8),
                    reason="generated model missing")
def test_full_int8_lstm_within_1_lsb(rng):
    """Full-integer LSTM (the 8x8_16 kernel: int8 gates and output
    state, int16 cell state).  Lowered as a dequantized float scan with
    per-step state fake-quantization, which tracks the interpreter's
    integer kernel within 1 LSB of the int8 output."""
    g = parse_tflite_file(MODEL_INT8)
    assert g.op_histogram().get("UNIDIRECTIONAL_SEQUENCE_LSTM", 0) == 2
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    it = make_tfl_interpreter(MODEL_INT8)
    it.allocate_tensors()
    d0 = it.get_input_details()[0]
    for trial in range(4):
        x = rng.integers(-128, 128, d0["shape"]).astype(np.int8)
        outs = fn({k: np.asarray(v) for k, v in prog.params.items()}, [x])
        it.set_tensor(d0["index"], x)
        it.invoke()
        ref = it.get_tensor(it.get_output_details()[0]["index"])
        d = np.abs(
            np.asarray(outs[0]).astype(np.int32) - ref.astype(np.int32)
        )
        assert d.max() <= 1, (trial, d.max())


MODEL_BI = os.path.join(DATA, "bilstm_seq.tflite")


@pytest.mark.skipif(not os.path.exists(MODEL_BI),
                    reason="generated model missing")
def test_bidirectional_lstm_matches_interpreter(rng):
    """Bidirectional(LSTM) converts to forward+reversed fused LSTMs
    plus REVERSE_V2/CONCAT — covered by existing lowerings."""
    g = parse_tflite_file(MODEL_BI)
    assert g.op_histogram().get("UNIDIRECTIONAL_SEQUENCE_LSTM", 0) == 4
    assert g.op_histogram().get("REVERSE_V2", 0) >= 2
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    it = make_tfl_interpreter(MODEL_BI)
    it.allocate_tensors()
    d0 = it.get_input_details()[0]
    x = rng.standard_normal(d0["shape"]).astype(np.float32)
    outs = fn({k: np.asarray(v) for k, v in prog.params.items()}, [x])
    it.set_tensor(d0["index"], x)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])
    np.testing.assert_allclose(np.asarray(outs[0]), ref,
                               rtol=2e-5, atol=2e-6)
