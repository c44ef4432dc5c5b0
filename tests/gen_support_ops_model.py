"""Generator for tests/data/support_ops.tflite — a converter-produced
model bundling the long tail of TFLite support builtins (comparisons,
logical ops, select, extra reductions, batch/space moves, gather_nd,
cumsum, one-hot, top-k, LRN) so the lowering registry is exercised
against the real interpreter.

Run: python tests/gen_support_ops_model.py   (writes tests/data/)
"""

import os

import numpy as np
import tensorflow as tf

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "support_ops.tflite")


class M(tf.Module):
    @tf.function(input_signature=[
        tf.TensorSpec([1, 6, 6, 4], tf.float32),
        tf.TensorSpec([1, 6, 6, 4], tf.float32),
    ])
    def f(self, a, b):
        outs = {}
        outs["equal"] = tf.equal(tf.round(a), tf.round(b))
        outs["not_equal"] = tf.not_equal(tf.round(a), tf.round(b))
        outs["greater"] = tf.greater(a, b)
        outs["greater_equal"] = tf.greater_equal(a, b)
        outs["less"] = tf.less(a, b)
        outs["less_equal"] = tf.less_equal(a, b)
        gt0 = tf.greater(a, 0.0)
        lt0 = tf.less(b, 0.0)
        outs["logical_and"] = tf.logical_and(gt0, lt0)
        outs["logical_or"] = tf.logical_or(gt0, lt0)
        outs["logical_not"] = tf.logical_not(gt0)
        outs["select"] = tf.where(gt0, a, b)
        outs["reduce_min"] = tf.reduce_min(a, axis=3)
        outs["reduce_prod"] = tf.reduce_prod(a, axis=[1], keepdims=True)
        outs["reduce_any"] = tf.reduce_any(gt0, axis=2)
        outs["reduce_all"] = tf.reduce_all(gt0, axis=[1, 2])
        outs["arg_min"] = tf.argmin(a, axis=3)
        outs["floor_div"] = tf.math.floordiv(a, 0.5)
        outs["floor_mod"] = tf.math.floormod(a, 0.5)
        outs["reverse"] = tf.reverse(a, axis=[2])
        idx = tf.constant([[0, 1, 2], [0, 3, 0], [0, 5, 5]], tf.int32)
        outs["gather_nd"] = tf.gather_nd(a, idx)
        s2b = tf.space_to_batch(a, block_shape=[2, 2],
                                paddings=[[0, 0], [0, 0]])
        outs["space_to_batch"] = s2b
        outs["batch_to_space"] = tf.batch_to_space(
            s2b, block_shape=[2, 2], crops=[[0, 0], [0, 0]])
        outs["cumsum"] = tf.cumsum(a, axis=2)
        outs["cumsum_ex_rev"] = tf.cumsum(a, axis=1, exclusive=True,
                                          reverse=True)
        hot_idx = tf.cast(tf.clip_by_value(a[:, :, :, 0] * 2.0 + 2.0,
                                           0.0, 4.0), tf.int32)
        outs["one_hot"] = tf.one_hot(hot_idx, depth=5)
        outs["lrn"] = tf.nn.local_response_normalization(
            a, depth_radius=2, bias=1.5, alpha=0.7, beta=0.6)
        values, indices = tf.math.top_k(a, k=2)
        outs["topk_values"] = values
        outs["topk_indices"] = indices
        sc_idx = tf.constant([[0], [2], [5]], tf.int32)
        outs["scatter_nd"] = tf.scatter_nd(
            sc_idx, a[0, :3, :, 0], [8, 6])
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
