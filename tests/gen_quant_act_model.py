"""Generator for tests/data/quant_act_int8.tflite — a full-int8 model
exercising the LUT-based quantized activations (LOGISTIC, TANH, ELU)
plus a quantized SOFTMAX with a non-trivial input scale, so the
bit-exact table/LUT paths are verified against the interpreter.

Run: python tests/gen_quant_act_model.py
"""

import os

import numpy as np
import tensorflow as tf

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "quant_act_int8.tflite")


class M(tf.Module):
    @tf.function(input_signature=[tf.TensorSpec([1, 8, 8, 8], tf.float32)])
    def f(self, a):
        return {
            "logistic": tf.sigmoid(a),
            "tanh": tf.tanh(a * 0.7),
            "elu": tf.nn.elu(a - 0.3),
            "softmax": tf.nn.softmax(tf.reshape(a, [1, 64, 8]) * 1.3),
        }


def main() -> None:
    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.f.get_concrete_function()], m)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]

    def rep():
        rng = np.random.default_rng(0)
        for _ in range(16):
            yield [rng.standard_normal((1, 8, 8, 8)).astype(np.float32) * 2]

    conv.representative_dataset = rep
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.int8
    conv.inference_output_type = tf.int8
    data = conv.convert()
    with open(OUT, "wb") as f:
        f.write(data)
    print(f"wrote {OUT} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
