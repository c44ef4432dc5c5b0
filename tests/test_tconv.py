"""TRANSPOSE_CONV lowering vs the TFLite interpreter.

Covers the sub-pixel decomposition's two interleave paths beyond ICN's
even-output cases (tests/test_executor_exact.py): odd VALID outputs
(unequal phase lengths -> scatter fallback) and stride-3. Oracle:
interpreter without XNNPACK (rounding parity, docs/dev-notes.md #9).
"""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
PATH = os.path.join(DATA, "tconv_int8.tflite")


@pytest.mark.skipif(not os.path.exists(PATH),
                    reason="run tests/gen_tconv_model.py")
def test_tconv_bit_exact_vs_interpreter():
    import tensorflow as tf

    from band_tpu.backend.program import build_program
    from band_tpu.tflite.parser import parse_tflite_file

    g = parse_tflite_file(PATH)
    prog = build_program(g, range(len(g.ops)), exact=True,
                         conv_mode="f32_split")
    import jax

    fn = jax.jit(prog.make_fn())
    params = {k: np.asarray(v) for k, v in prog.params.items()}

    it = tf.lite.Interpreter(
        model_path=PATH,
        experimental_op_resolver_type=(
            tf.lite.experimental.OpResolverType
            .BUILTIN_WITHOUT_DEFAULT_DELEGATES),
    )
    it.allocate_tensors()
    ind = it.get_input_details()[0]
    rng = np.random.default_rng(0)
    for trial in range(3):
        x = rng.integers(-128, 128, ind["shape"]).astype(np.int8)
        it.set_tensor(ind["index"], x)
        it.invoke()
        ref = {
            tuple(d["shape"]): it.get_tensor(d["index"])
            for d in it.get_output_details()
        }
        outs = fn(params, [x])
        for o in outs:
            o = np.asarray(o)
            np.testing.assert_array_equal(o, ref[o.shape])
