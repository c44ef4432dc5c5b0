"""Generator for tests/data/tconv_int8.tflite — int8 TRANSPOSE_CONV
coverage beyond ICN's even-output cases: a VALID stride-2 deconv whose
output size is ODD ((in-1)*s + k = 11), so the sub-pixel phases have
unequal lengths and the lowering's scatter-interleave fallback path is
exercised (the even SAME case rides the pixel-shuffle path; both in
one model, plus a stride-3 mixed case).

Reference kernel: TFLite TransposeConv (band delegates to it,
band/backend/tfl/model_executor.cc:249-255).

Run: python tests/gen_tconv_model.py   (writes tests/data/)
"""

import os

import numpy as np
import tensorflow as tf

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "tconv_int8.tflite")


def build():
    inp = tf.keras.Input((5, 5, 8))
    # odd output: VALID, (5-1)*2 + 3 = 11 -> unequal phase lengths
    a = tf.keras.layers.Conv2DTranspose(
        16, 3, strides=2, padding="valid", use_bias=True)(inp)
    # even output: SAME, 5*2 = 10 -> pixel-shuffle interleave
    b = tf.keras.layers.Conv2DTranspose(
        16, 4, strides=2, padding="same", use_bias=True)(inp)
    # stride 3, kernel 5, VALID: (5-1)*3 + 5 = 17
    c = tf.keras.layers.Conv2DTranspose(
        8, 5, strides=3, padding="valid", use_bias=True)(inp)
    a = tf.keras.layers.ReLU()(a)
    return tf.keras.Model(inp, [a, b, c])


def main():
    rng = np.random.default_rng(23)
    model = build()

    def rep():
        for _ in range(8):
            yield [rng.standard_normal((1, 5, 5, 8)).astype(np.float32)]

    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = rep
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.int8
    conv.inference_output_type = tf.int8
    flat = conv.convert()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(flat)
    print("wrote", OUT, len(flat), "bytes")


if __name__ == "__main__":
    main()
