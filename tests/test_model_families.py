"""Converter-generated model families beyond the reference zoo:
residual CNN (bit-exact) and a self-attention block (BATCH_MATMUL,
TRANSPOSE, layer-norm float segments, <= 2 LSB)."""

import os

import numpy as np
import jax
import pytest

from band_tpu.backend.program import build_program
from band_tpu.tflite.parser import parse_tflite_file
from tests.conftest import make_tfl_interpreter, random_feeds

DATA = os.path.join(os.path.dirname(__file__), "data")


def run_pair(name, rng):
    path = os.path.join(DATA, f"{name}.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    it = make_tfl_interpreter(path)
    feeds = random_feeds(it, rng)
    it.allocate_tensors()
    for d in it.get_input_details():
        it.set_tensor(d["index"], feeds[d["index"]])
    it.invoke()
    ref = {d["index"]: it.get_tensor(d["index"])
           for d in it.get_output_details()}
    g = parse_tflite_file(path)
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    outs = fn({k: np.asarray(v) for k, v in prog.params.items()},
              [feeds[t] for t in prog.input_ids])
    got = {t: np.asarray(o) for t, o in zip(prog.output_ids, outs)}
    return ref, got, g


def test_resnetish_residual_cnn_bit_exact(rng):
    ref, got, g = run_pair("resnetish_int8", rng)
    assert g.op_histogram()["ADD"] >= 2  # residual adds present
    for tid, r in ref.items():
        np.testing.assert_array_equal(got[tid], r)


def test_effnetlite_mbconv_bit_exact(rng):
    """EfficientNet-Lite-style MBConv stack (expand/dw/project + ReLU6 +
    residual + MEAN head) — the model family of BASELINE milestone #2."""
    ref, got, g = run_pair("effnetlite_int8", rng)
    hist = g.op_histogram()
    assert hist.get("DEPTHWISE_CONV_2D", 0) >= 4
    assert hist.get("MEAN", 0) >= 1
    assert hist.get("SOFTMAX", 0) >= 1
    for tid, r in ref.items():
        np.testing.assert_array_equal(got[tid], r)


def test_attention_block_within_2_lsb(rng):
    ref, got, g = run_pair("attention_int8", rng)
    hist = g.op_histogram()
    assert hist.get("BATCH_MATMUL", 0) >= 2  # QK^T and AV matmuls
    assert hist.get("TRANSPOSE", 0) >= 2
    for tid, r in ref.items():
        d = np.abs(got[tid].astype(np.int64) - r.astype(np.int64))
        assert d.max() <= 2
        assert (d == 0).mean() > 0.85


def test_quantized_activations_bit_exact(rng):
    """Full-int8 model exercising the LUT quantized activations
    (LOGISTIC/TANH/ELU, activations.cc lookup tables) and the quantized
    SOFTMAX (exp LUT + float32 rows) — every output byte must equal the
    interpreter's (generator: tests/gen_quant_act_model.py)."""
    ref, got, g = run_pair("quant_act_int8", rng)
    hist = g.op_histogram()
    for opname in ("LOGISTIC", "TANH", "ELU", "SOFTMAX"):
        assert hist.get(opname, 0) >= 1
    for tid, r in ref.items():
        np.testing.assert_array_equal(got[tid], r)


def test_fp16_ptq_cnn(rng):
    """fp16 post-training quantization: weights stored float16 behind
    DEQUANTIZE ops, folded to f32 constants at parse time (the mobile
    fp16 deployment format; TFLite's runtime special-cases it too)."""
    path = os.path.join(DATA, "fp16_cnn.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    g = parse_tflite_file(path)
    assert "DEQUANTIZE" not in g.op_histogram()  # all folded
    ref, got, _ = run_pair("fp16_cnn", rng)
    for tid, r in ref.items():
        np.testing.assert_allclose(got[tid], r, rtol=1e-5, atol=1e-6)


def test_dynamic_range_hybrid(rng):
    """Dynamic-range ("hybrid") quantization: int8 weights with
    per-channel scales, float activations quantized per batch element
    at runtime (TFLite EvalHybrid semantics — asymmetric for FC with
    asymmetric_quantize_inputs, zero-point-corrected for convs)."""
    path = os.path.join(DATA, "dynrange.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    g = parse_tflite_file(path)
    hybrid_weights = [
        t for t in g.tensors
        if t.is_constant and t.dtype == np.int8 and t.quant is not None
    ]
    assert len(hybrid_weights) >= 2  # conv + dense actually hybrid
    ref, got, _ = run_pair("dynrange", rng)
    for tid, r in ref.items():
        np.testing.assert_allclose(got[tid], r, rtol=1e-4, atol=1e-5)


def test_dynamic_range_hybrid_degenerate_rows(rng):
    """All-zero input rows through the hybrid paths: TFLite's
    AsymmetricQuantizeFloats degenerate case (rmin == rmax) must yield
    the true zero output, not a zero-point artifact (regression: the FC
    rowsum correction once injected 128*rowsum)."""
    path = os.path.join(DATA, "dynrange.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    import tensorflow as tf  # noqa: F401 (oracle available check)

    it = make_tfl_interpreter(path)
    it.allocate_tensors()
    d0 = it.get_input_details()[0]
    x = np.zeros(d0["shape"], np.float32)
    it.set_tensor(d0["index"], x)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])

    g = parse_tflite_file(path)
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    outs = fn({k: np.asarray(v) for k, v in prog.params.items()}, [x])
    np.testing.assert_allclose(np.asarray(outs[0]), ref,
                               rtol=1e-4, atol=1e-5)
