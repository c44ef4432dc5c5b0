"""Generators for tests/data/{while_loop,cond}.tflite — control-flow
models (WHILE/IF over sibling subgraphs) with static-shape bodies, the
regime XLA can compile as one computation.

Run: python tests/gen_control_flow_model.py   (writes tests/data/)
"""

import os

import numpy as np
import tensorflow as tf

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def gen_while() -> None:
    rng = np.random.default_rng(3)
    w = tf.constant(rng.standard_normal((8, 8)).astype(np.float32) * 0.3)

    class M(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec([1, 8], tf.float32)])
        def f(self, x):
            def cond(i, v):
                return i < 5

            def body(i, v):
                return i + 1, tf.tanh(tf.matmul(v, w)) + 0.1

            _, v = tf.while_loop(cond, body, [tf.constant(0), x])
            return v

    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.f.get_concrete_function()], m)
    data = conv.convert()
    out = os.path.join(DATA, "while_loop.tflite")
    with open(out, "wb") as f:
        f.write(data)
    print(f"wrote {out} ({len(data)} bytes)")


def gen_cond() -> None:
    rng = np.random.default_rng(4)
    w = tf.constant(rng.standard_normal((8, 8)).astype(np.float32) * 0.3)

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 8], tf.float32),
            tf.TensorSpec([], tf.bool),
        ])
        def f(self, x, flag):
            return tf.cond(
                flag,
                lambda: tf.matmul(x, w) + 1.0,
                lambda: -x,
            )

    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.f.get_concrete_function()], m)
    data = conv.convert()
    out = os.path.join(DATA, "cond.tflite")
    with open(out, "wb") as f:
        f.write(data)
    print(f"wrote {out} ({len(data)} bytes)")


if __name__ == "__main__":
    gen_while()
    gen_cond()
