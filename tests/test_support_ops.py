"""Support-builtin tail vs the TFLite interpreter: comparisons, logical
ops, select, extra reductions, arg_min, floor div/mod, reverse,
gather_nd, space/batch moves, cumsum (incl. exclusive+reverse),
one-hot, top-k, and LRN — one converter-generated model
(tests/gen_support_ops_model.py) runs through both stacks and every
output is compared.

The reference gets these ops for free from the TFLite CPU kernels; our
equivalent surface is the lowering registry (docs/parity.md §2.4)."""

import os

import numpy as np
import pytest

import jax

from band_tpu.backend.program import build_program
from band_tpu.tflite.parser import parse_tflite_file
from tests.conftest import make_tfl_interpreter

DATA = os.path.join(os.path.dirname(__file__), "data")
PATH = os.path.join(DATA, "support_ops.tflite")
PATH2 = os.path.join(DATA, "support_ops2.tflite")

EXPECTED_OPS = {
    "EQUAL", "NOT_EQUAL", "GREATER", "GREATER_EQUAL", "LESS", "LESS_EQUAL",
    "LOGICAL_AND", "LOGICAL_OR", "SELECT", "REDUCE_MIN", "REDUCE_PROD",
    "REDUCE_ANY", "REDUCE_ALL", "ARG_MIN", "FLOOR_DIV", "FLOOR_MOD",
    "REVERSE_V2", "GATHER_ND", "SPACE_TO_BATCH_ND", "BATCH_TO_SPACE_ND",
    "CUMSUM", "ONE_HOT", "LOCAL_RESPONSE_NORMALIZATION", "TOPK_V2",
}

EXPECTED_OPS2 = {
    "SEGMENT_SUM", "UNSORTED_SEGMENT_SUM", "UNSORTED_SEGMENT_MAX",
    "UNSORTED_SEGMENT_MIN", "UNSORTED_SEGMENT_PROD", "REVERSE_SEQUENCE",
    "MATRIX_DIAG", "MATRIX_SET_DIAG", "ATAN2", "SIGN", "BITWISE_XOR",
    "RIGHT_SHIFT", "CONV_3D", "RFFT2D", "COMPLEX_ABS", "REAL", "IMAG",
}


def _run_both(path, rng):
    it = make_tfl_interpreter(path)
    it.allocate_tensors()
    feeds = {}
    for d in it.get_input_details():
        if np.issubdtype(d["dtype"], np.integer):
            feeds[d["index"]] = rng.integers(
                -40, 40, d["shape"]).astype(d["dtype"])
        else:
            feeds[d["index"]] = rng.standard_normal(d["shape"]).astype(
                d["dtype"])
        it.set_tensor(d["index"], feeds[d["index"]])
    it.invoke()
    ref = {}
    for d in it.get_output_details():
        ref[d["index"]] = it.get_tensor(d["index"])

    g = parse_tflite_file(path)
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    fn = jax.jit(prog.make_fn())
    outs = fn({k: np.asarray(v) for k, v in prog.params.items()},
              [feeds[t] for t in prog.input_ids])
    got = {t: np.asarray(o) for t, o in zip(prog.output_ids, outs)}
    return ref, got, g


@pytest.fixture(scope="module")
def pair(rng_module):
    if not os.path.exists(PATH):
        pytest.skip("generated model missing")
    return _run_both(PATH, rng_module)


@pytest.fixture(scope="module")
def pair2(rng_module):
    if not os.path.exists(PATH2):
        pytest.skip("generated model missing")
    return _run_both(PATH2, rng_module)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(11)


def _assert_match(pair):
    ref, got, g = pair
    assert set(ref) == set(got)
    for tid, r in ref.items():
        o = got[tid]
        name = g.tensor(tid).name
        assert o.shape == tuple(r.shape), name
        if r.dtype == np.bool_ or np.issubdtype(r.dtype, np.integer):
            np.testing.assert_array_equal(o, r, err_msg=name)
        else:
            np.testing.assert_allclose(o, r, rtol=2e-5, atol=2e-5,
                                       err_msg=name)


def test_op_coverage(pair):
    _, _, g = pair
    assert EXPECTED_OPS <= set(g.op_histogram())


def test_all_outputs_match(pair):
    _assert_match(pair)


def test_op_coverage2(pair2):
    _, _, g = pair2
    assert EXPECTED_OPS2 <= set(g.op_histogram())


def test_all_outputs_match2(pair2):
    _assert_match(pair2)
