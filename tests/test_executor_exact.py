"""End-to-end executor correctness against the TFLite oracle.

The integer-only models (mobilenet_v2 uint8, ICN int8) must be
BIT-EXACT; models with float segments or SIMD-path-dependent requantize
tails (retinaface) are held to <=1 LSB on quantized outputs.
"""

import numpy as np
import jax
import pytest

from band_tpu.backend.program import build_program
from band_tpu.tflite.parser import parse_tflite_file
from tests.conftest import has_model, make_tfl_interpreter, model_path, random_feeds


def run_both(name, rng):
    path = model_path(name)
    it = make_tfl_interpreter(path)
    feeds = random_feeds(it, rng)
    it.allocate_tensors()
    for d in it.get_input_details():
        it.set_tensor(d["index"], feeds[d["index"]])
    it.invoke()
    ref = {d["index"]: it.get_tensor(d["index"])
           for d in it.get_output_details()}

    g = parse_tflite_file(path)
    # f32_split is the conv mode engine uses on CPU backends; it must be
    # just as bit-exact as the native int8 path
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    params = {k: np.asarray(v) for k, v in prog.params.items()}
    outs = fn(params, [feeds[t] for t in prog.input_ids])
    got = {t: np.asarray(o) for t, o in zip(prog.output_ids, outs)}
    return ref, got


def max_int_diff(ref, got):
    worst = 0
    for tid, r in ref.items():
        o = got[tid]
        if np.issubdtype(r.dtype, np.integer):
            worst = max(worst,
                        int(np.abs(o.astype(np.int64)
                                   - r.astype(np.int64)).max()))
    return worst


def test_add_float_exact(rng):
    if not has_model("add"):
        pytest.skip("reference model not available")
    ref, got = run_both("add", rng)
    for tid, r in ref.items():
        np.testing.assert_array_equal(got[tid], r)


def test_mobilenet_v2_uint8_bit_exact(rng):
    if not has_model("mobilenet_v2_1.0_224_quant"):
        pytest.skip("reference model not available")
    ref, got = run_both("mobilenet_v2_1.0_224_quant", rng)
    assert max_int_diff(ref, got) == 0


def test_icn_int8_bit_exact(rng):
    if not has_model("ICN_quant"):
        pytest.skip("reference model not available")
    ref, got = run_both("ICN_quant", rng)
    assert max_int_diff(ref, got) == 0


def test_retinaface_int8_within_one_lsb(rng):
    if not has_model("retinaface_mbv2_quant_160"):
        pytest.skip("reference model not available")
    ref, got = run_both("retinaface_mbv2_quant_160", rng)
    assert max_int_diff(ref, got) <= 1
    # float outputs (if any) close
    for tid, r in ref.items():
        if not np.issubdtype(r.dtype, np.integer):
            np.testing.assert_allclose(got[tid], r, atol=1e-2, rtol=1e-2)


def test_magenta_style_transfer_bit_exact(rng):
    """295-op hybrid int8/float style-transfer network (instance norm:
    MEAN/SQUARED_DIFFERENCE/RSQRT, MIRROR_PAD, RESIZE_NEAREST_NEIGHBOR,
    broadcast MUL/ADD of style parameters) must match the oracle exactly
    — instance norm amplifies any 1-LSB requant divergence into visible
    output error, so this model is the sharpest rounding test we have."""
    name = "magenta_arbitrary-image-stylization-v1-256_int8_transfer_1"
    if not has_model(name):
        pytest.skip("reference model not available")
    ref, got = run_both(name, rng)
    for tid, r in ref.items():
        np.testing.assert_array_equal(got[tid], r)
