"""Pallas fused int8 matmul+requant kernel vs the numpy oracle.

On the CPU test platform the kernel runs in the Pallas interpreter; on
TPU hardware it measured 360-367 int8 TOPS (91-93% of v5e peak) with
the requant epilogue fused (see bench notes in docs/performance.md)."""

import numpy as np
import pytest

from band_tpu.ops.pallas.qmatmul import qmatmul, qmatmul_reference


def test_qmatmul_matches_reference(rng):
    M, K, N = 256, 384, 256
    a = rng.integers(-128, 128, (M, K)).astype(np.int8)
    b = rng.integers(-128, 128, (K, N)).astype(np.int8)
    bias = rng.integers(-1000, 1000, (N,)).astype(np.int32)
    mult = (rng.random(N).astype(np.float32) * 1e-3)
    out = np.asarray(qmatmul(a, b, bias, mult, out_zp=3))
    ref = qmatmul_reference(a, b, bias, mult, out_zp=3)
    np.testing.assert_array_equal(out, ref)


def test_qmatmul_saturation(rng):
    M, K, N = 128, 128, 128
    a = np.full((M, K), 127, np.int8)
    b = np.full((K, N), 127, np.int8)
    bias = np.zeros(N, np.int32)
    mult = np.full(N, 1.0, np.float32)  # huge multiplier -> saturate
    out = np.asarray(qmatmul(a, b, bias, mult))
    assert (out == 127).all()


def test_qmatmul_exact_matches_requant_pipeline(rng):
    """The in-kernel ruy requant must be bit-identical to the plain
    requantize_exact over the same accumulator (per-channel qm/shift)."""
    import jax.numpy as jnp

    import band_tpu.ops.quant as Q
    from band_tpu.ops.pallas.qmatmul import qmatmul_exact

    M, K, N = 64, 96, 256
    a = rng.integers(-128, 128, (M, K)).astype(np.int8)
    b = rng.integers(-128, 128, (K, N)).astype(np.int8)
    bias = rng.integers(-5000, 5000, (N,)).astype(np.int32)
    qm, shift = Q.quantize_multipliers(
        rng.random(N).astype(np.float64) * 2e-4 + 1e-5
    )
    out = np.asarray(
        qmatmul_exact(a, b, bias.copy(), qm, shift, out_zp=-1,
                      rounding="ruy")
    )
    acc = a.astype(np.int64) @ b.astype(np.int64) + bias
    ref = np.asarray(
        Q.requantize_exact(jnp.asarray(acc.astype(np.int32)), qm, shift,
                           -1, -128, 127, np.int8, rounding="ruy")
    )
    np.testing.assert_array_equal(out, ref)


def test_fc_lowering_via_pallas_bit_exact(rng):
    """conv_mode=int8 routes quantized FULLY_CONNECTED through the
    Pallas fused kernel; the generated FC model must stay bit-exact
    against the TFLite oracle through that path."""
    import os

    import jax

    from band_tpu.backend.program import build_program
    from band_tpu.tflite.parser import parse_tflite_file
    from tests.conftest import make_tfl_interpreter

    path = os.path.join(os.path.dirname(__file__), "data", "fc_int8.tflite")
    if not os.path.exists(path):
        pytest.skip("generated model missing")
    g = parse_tflite_file(path)
    it = make_tfl_interpreter(path)
    x = rng.integers(-128, 128, (1, 16, 16, 8)).astype(np.int8)
    it.allocate_tensors()
    it.set_tensor(it.get_input_details()[0]["index"], x)
    it.invoke()
    ref = it.get_tensor(it.get_output_details()[0]["index"])

    prog = build_program(g, range(len(g.ops)), exact=True, conv_mode="int8")
    fn = jax.jit(prog.make_fn())
    out = np.asarray(
        fn({k: np.asarray(v) for k, v in prog.params.items()}, [x])[0]
    )
    np.testing.assert_array_equal(out, ref)


def test_pointwise_conv_via_pallas_bit_exact(rng):
    """1x1 convs route through the fused Pallas kernel in int8 mode;
    a retinaface pointwise conv must agree with the f32_split exact
    path (interpret mode on the CPU platform)."""
    from band_tpu.backend.program import build_program
    from band_tpu.tflite.parser import parse_tflite_file
    from tests.conftest import has_model, model_path

    if not has_model("retinaface_mbv2_quant_160"):
        pytest.skip("reference model not available")
    import jax

    g = parse_tflite_file(model_path("retinaface_mbv2_quant_160"))
    op = next(
        op for op in g.ops
        if op.opname == "CONV_2D" and g.tensor(op.inputs[1]).shape[1] == 1
        and g.tensor(op.inputs[1]).shape[2] == 1
    )
    prog = build_program(g, [op.index], exact=True, conv_mode="int8")
    params = {k: np.asarray(v) for k, v in prog.params.items()}
    xs = [rng.integers(-128, 128, s).astype(d) for s, d in prog.input_specs]
    a = np.asarray(jax.jit(prog.make_fn())(params, xs)[0])
    prog2 = build_program(g, [op.index], exact=True, conv_mode="f32_split")
    b = np.asarray(jax.jit(prog2.make_fn())(params, xs)[0])
    np.testing.assert_array_equal(a, b)


def test_uint8_pointwise_conv_via_pallas_bit_exact(rng):
    """uint8-era models: per-tensor weights (nonzero shifted w_zp,
    in-kernel row-sum correction) and uint8 outputs."""
    from band_tpu.backend.program import build_program
    from band_tpu.tflite.parser import parse_tflite_file
    from tests.conftest import has_model, model_path

    if not has_model("mobilenet_v2_1.0_224_quant"):
        pytest.skip("reference model not available")
    import jax

    g = parse_tflite_file(model_path("mobilenet_v2_1.0_224_quant"))
    op = next(
        op for op in g.ops
        if op.opname == "CONV_2D" and g.tensor(op.inputs[1]).shape[1] == 1
        and g.tensor(op.inputs[1]).shape[2] == 1
        and g.tensor(op.inputs[0]).shape[1] <= 14  # keep CPU int8 conv fast
    )
    prog = build_program(g, [op.index], exact=True, conv_mode="int8")
    params = {k: np.asarray(v) for k, v in prog.params.items()}
    xs = [rng.integers(0, 256, s).astype(d) for s, d in prog.input_specs]
    a = np.asarray(jax.jit(prog.make_fn())(params, xs)[0])
    prog2 = build_program(g, [op.index], exact=True, conv_mode="f32_split")
    b = np.asarray(jax.jit(prog2.make_fn())(params, xs)[0])
    assert a.dtype == b.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
