"""Bit-level tests of the fixed-point requantization arithmetic."""

import numpy as np
import jax.numpy as jnp
import pytest

from band_tpu.ops import quant as Q


def _ref_srdhm(a: int, b: int) -> int:
    ab = a * b
    nudge = (1 << 30) if ab >= 0 else (1 - (1 << 30))
    q = ab + nudge
    return q // (1 << 31) if q >= 0 else -((-q) >> 31)


def _ref_rdpot(x: int, e: int) -> int:
    mask = (1 << e) - 1
    rem = x & mask
    thr = (mask >> 1) + (1 if x < 0 else 0)
    return (x >> e) + (1 if rem > thr else 0)


def _ref_mbqm(x: int, qm: int, sh: int, rounding: str) -> int:
    if rounding == "single":
        t = 31 - sh
        return (x * qm + (1 << (t - 1))) >> t
    left = max(sh, 0)
    right = max(-sh, 0)
    high = _ref_srdhm(x * (1 << left), qm)
    if rounding == "ruy":
        if right == 0:
            return high
        return (high + (1 << (right - 1))) >> right
    return _ref_rdpot(high, right)


@pytest.mark.parametrize("rounding", ["single", "double", "ruy"])
def test_mbqm_matches_bigint(rounding, rng):
    n = 20000
    x = rng.integers(-(2**31), 2**31, n).astype(np.int32)
    qm = rng.integers(2**30, 2**31, n).astype(np.int32)
    sh = rng.integers(-20, 3, n).astype(np.int32)
    ref = np.array(
        [_ref_mbqm(int(a), int(b), int(c), rounding)
         for a, b, c in zip(x, qm, sh)],
        dtype=np.int64,
    )
    got = np.asarray(
        Q.multiply_by_quantized_multiplier(
            jnp.asarray(x), jnp.asarray(qm), jnp.asarray(sh), rounding
        )
    ).astype(np.int64)
    ok = (ref >= -(2**31)) & (ref < 2**31)
    # a positive shift pre-scales x by 2^shift in int32; exclude inputs that
    # would overflow there (real kernels only left-shift small accumulators)
    left = np.maximum(sh, 0).astype(np.int64)
    ok &= np.abs(x.astype(np.int64) << left) < 2**31
    assert (ref[ok] == got[ok]).all()


def test_quantize_multiplier_roundtrip():
    for m in [0.5, 0.25, 0.0078125, 0.123456, 0.9999, 1.7, 3.3e-5]:
        qm, sh = Q.quantize_multiplier(m)
        assert 2**30 <= qm < 2**31
        approx = qm * 2.0 ** (sh - 31)
        assert abs(approx - m) / m < 1e-9


def test_activation_range_uint8():
    qmin, qmax = Q.activation_range("RELU6", 0.023528, 0, np.dtype(np.uint8))
    assert qmin == 0 and qmax == 255
    qmin, qmax = Q.activation_range("NONE", 0.1, 10, np.dtype(np.int8))
    assert (qmin, qmax) == (-128, 127)


def test_round_ties_away():
    x = jnp.asarray([0.5, 1.5, -0.5, -1.5, 2.4, -2.4])
    got = np.asarray(Q.round_ties_away(x))
    assert got.tolist() == [1.0, 2.0, -1.0, -2.0, 2.0, -2.0]


def test_lut_softmax_bit_exact_vs_interpreter():
    """Quantized SOFTMAX must match the TFLite kernel byte-for-byte:
    the interpreter runs the attention model with all tensors
    preserved, and the softmax op's input/output pair is replayed
    through Q.lut_softmax (exp LUT + left-to-right float32 rows,
    truncate(prob + 0.5))."""
    import os

    import jax.numpy as jnp
    import tensorflow as tf

    from band_tpu.ops import quant as Q
    from band_tpu.tflite.parser import parse_tflite_file

    path = os.path.join(os.path.dirname(__file__), "data",
                        "attention_int8.tflite")
    if not os.path.exists(path):
        import pytest

        pytest.skip("generated model missing")
    g = parse_tflite_file(path)
    sm = next(op for op in g.ops if op.opname == "SOFTMAX")
    in_td = g.tensor(sm.inputs[0])
    out_td = g.tensor(sm.outputs[0])

    it = tf.lite.Interpreter(
        model_path=path,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType
            .BUILTIN_WITHOUT_DEFAULT_DELEGATES),
        experimental_preserve_all_tensors=True,
    )
    it.allocate_tensors()
    rng = np.random.default_rng(5)
    for d in it.get_input_details():
        dt = d["dtype"]
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            x = rng.integers(info.min, info.max + 1, d["shape"]).astype(dt)
        else:
            x = rng.standard_normal(d["shape"]).astype(dt)
        it.set_tensor(d["index"], x)
    it.invoke()
    sm_in = it.get_tensor(sm.inputs[0])
    sm_out = it.get_tensor(sm.outputs[0])

    table = Q.softmax_table(float(in_td.quant.scale[0]),
                            sm.options.get("beta", 1.0))
    ours = np.asarray(Q.lut_softmax(
        jnp.asarray(sm_in), table, float(out_td.quant.scale[0]),
        int(out_td.quant.zero_point[0]), out_td.dtype))
    np.testing.assert_array_equal(ours, sm_out)


def test_collapsed_pipeline_matches_two_step():
    """The collapsed one-add-one-shift requant (serving hot path) must
    equal the literal SRDHM+rounding-shift reference bit-for-bit over
    the full int32 range, both rounding flavors, all shifts."""
    import numpy as np

    from band_tpu.ops.quant import (
        _reference_two_step,
        multiply_by_quantized_multiplier,
    )

    rng = np.random.default_rng(0)
    for rounding in ("ruy", "double"):
        for shift in [0, -1, -2, -5, -9, -14, -21, -30, 1, 3]:
            x = rng.integers(-(1 << 31), 1 << 31, 20000).astype(np.int32)
            # include boundary accumulators
            x[:6] = [0, 1, -1, (1 << 31) - 1, -(1 << 31), -(1 << 29)]
            qm = rng.integers(1 << 30, 1 << 31, 20000).astype(np.int32)
            got = np.asarray(
                multiply_by_quantized_multiplier(x, qm, shift, rounding)
            )
            want = np.asarray(
                _reference_two_step(x, qm, np.int32(shift), rounding)
            )
            np.testing.assert_array_equal(got, want, err_msg=f"{rounding} shift={shift}")

    # per-channel shift arrays (the conv case)
    x = rng.integers(-(1 << 26), 1 << 26, (4, 8, 8, 16)).astype(np.int32)
    qm = rng.integers(1 << 30, 1 << 31, 16).astype(np.int32)
    shift = rng.integers(-12, 0, 16).astype(np.int32)
    for rounding in ("ruy", "double"):
        got = np.asarray(
            multiply_by_quantized_multiplier(x, qm, shift, rounding)
        )
        want = np.asarray(
            _reference_two_step(x, qm, shift, rounding)
        )
        np.testing.assert_array_equal(got, want)


def test_mbqm_small_operand_matches_general():
    """The ADD/SUB input-rescale fast path (two int32 multiplies) must
    be bit-identical to the general 64-bit MBQM for every 8-bit-domain
    operand value and a sweep of multipliers/shifts."""
    import jax.numpy as jnp

    from band_tpu.ops.quant import (
        mbqm_single_shifted_small,
        multiply_by_quantized_multiplier,
    )

    rng = np.random.default_rng(7)
    a = jnp.asarray(np.arange(-510, 511, dtype=np.int32))
    for _ in range(40):
        qm = int(rng.integers(1 << 30, 1 << 31))
        shift = int(rng.integers(-12, 1))
        for ls in (0, 15, 20):
            got = np.asarray(
                mbqm_single_shifted_small(a, qm, shift, ls)
            )
            want = np.asarray(
                multiply_by_quantized_multiplier(
                    a << ls, qm, shift, rounding="single"
                )
            )
            np.testing.assert_array_equal(got, want, err_msg=f"{qm} {shift} {ls}")


def test_addsub_linear_rescale_exhaustive():
    """The 5-op split-multiplier input rescale (round 4, the default
    quantized-ADD input path) must be bit-identical to the general
    64-bit MBQM for EVERY possible 8-bit-domain operand and a sweep of
    real (multiplier, shift) pairs produced by quantize_multiplier."""
    import jax.numpy as jnp

    from band_tpu.ops.quant import (
        addsub_input_rescale,
        addsub_input_rescale_plan,
        multiply_by_quantized_multiplier,
        quantize_multiplier,
    )

    rng = np.random.default_rng(11)
    a = jnp.asarray(np.arange(-255, 256, dtype=np.int32))
    planned = 0
    for _ in range(60):
        # the real ADD planning domain: value = s_i / twice_max in
        # (0.25, 0.5]; plus a few arbitrary magnitudes for robustness
        v = float(rng.uniform(0.25, 0.5)) if rng.random() < 0.7 else \
            float(rng.uniform(0.01, 0.99))
        qm, sh = quantize_multiplier(v)
        for ls in (20, 15):
            plan = addsub_input_rescale_plan(qm, sh, ls)
            if plan is None:
                continue
            planned += 1
            got = np.asarray(addsub_input_rescale(a, *plan))
            want = np.asarray(
                multiply_by_quantized_multiplier(
                    a << ls, qm, sh, rounding="single"
                )
            )
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"{qm} {sh} {ls}")
    assert planned > 50  # the plan must actually apply to real params
