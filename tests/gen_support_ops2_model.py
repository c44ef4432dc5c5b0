"""Generator for tests/data/support_ops2.tflite — second converter-
produced bundle widening the builtin tail: segment ops, reverse-
sequence, matrix diag ops, atan2/sign, bitwise int ops, 3-D convolution
/pooling, and spectral ops (RFFT2D + complex real/imag/abs).

Run: python tests/gen_support_ops2_model.py   (writes tests/data/)
"""

import os

import numpy as np
import tensorflow as tf

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "support_ops2.tflite")


class M(tf.Module):
    def __init__(self):
        super().__init__()
        init = tf.random.stateless_normal([3, 3, 3, 2, 4], seed=[7, 9])
        self.k3d = tf.Variable(init, trainable=False)

    @tf.function(input_signature=[
        tf.TensorSpec([2, 6, 8], tf.float32),
        tf.TensorSpec([2, 6, 8], tf.float32),
        tf.TensorSpec([1, 4, 6, 8, 2], tf.float32),
        tf.TensorSpec([2, 6, 8], tf.int32),
    ])
    def f(self, a, b, v, ai):
        outs = {}
        # segment reductions (sorted + unsorted families)
        seg = tf.constant([0, 0, 1, 2, 2, 2], tf.int32)
        # reshape pins the data-dependent segment count to its static
        # value so every graph shape stays static
        outs["segment_sum"] = tf.reshape(
            tf.math.segment_sum(a[0], seg), [3, 8])
        useg = tf.constant([1, 0, 1, 3, 0, 3], tf.int32)
        outs["unsorted_segment_sum"] = tf.math.unsorted_segment_sum(
            a[0], useg, num_segments=4)
        outs["unsorted_segment_max"] = tf.math.unsorted_segment_max(
            a[0], useg, num_segments=4)
        outs["unsorted_segment_min"] = tf.math.unsorted_segment_min(
            a[0], useg, num_segments=4)
        outs["unsorted_segment_prod"] = tf.math.unsorted_segment_prod(
            a[0], useg, num_segments=4)
        # sequence reversal with per-batch lengths
        lens = tf.constant([3, 6], tf.int32)
        outs["reverse_sequence"] = tf.reverse_sequence(
            a, lens, seq_axis=1, batch_axis=0)
        # matrix diag family
        outs["matrix_diag"] = tf.linalg.diag(a[:, :, 0])
        outs["matrix_set_diag"] = tf.linalg.set_diag(
            a[:, :6, :6], b[:, :, 0][:, :6])
        # pointwise tail
        outs["atan2"] = tf.math.atan2(a, b)
        outs["sign"] = tf.sign(a)
        # integer bitwise ops
        sh = tf.constant(np.full((2, 6, 8), 2, np.int32))
        outs["right_shift"] = tf.bitwise.right_shift(ai, sh)
        outs["bitwise_xor"] = tf.bitwise.bitwise_xor(ai, ai // 3)
        # 3-D convolution + pooling (video model family)
        c3 = tf.nn.conv3d(v, self.k3d, strides=[1, 1, 1, 1, 1],
                          padding="SAME")
        outs["conv3d"] = c3
        # (3-D max/avg pool are flex-only in TFLite — not builtins)
        # spectral: rfft2d + complex accessors
        spec = tf.signal.rfft2d(a, fft_length=[4, 8])
        outs["complex_abs"] = tf.abs(spec)
        outs["real"] = tf.math.real(spec)
        outs["imag"] = tf.math.imag(spec)
        return outs


def main() -> None:
    m = M()
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.f.get_concrete_function()], m)
    data = conv.convert()
    with open(OUT, "wb") as f:
        f.write(data)
    print(f"wrote {OUT} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
