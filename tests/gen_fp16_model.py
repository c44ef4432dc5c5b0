"""Generator for tests/data/fp16_cnn.tflite — an fp16 post-training-
quantized CNN (every weight stored float16 behind a DEQUANTIZE op, the
standard mobile fp16 deployment format).

Run: python tests/gen_fp16_model.py   (writes tests/data/)
"""

import os

import tensorflow as tf
import tf_keras as keras

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "fp16_cnn.tflite")


def main() -> None:
    keras.utils.set_random_seed(2)
    m = keras.Sequential([
        keras.layers.Input(shape=(16, 16, 3), batch_size=1),
        keras.layers.Conv2D(8, 3, padding="same", activation="relu"),
        keras.layers.DepthwiseConv2D(3, padding="same", activation="relu"),
        keras.layers.GlobalAveragePooling2D(),
        keras.layers.Dense(5),
    ])
    conv = tf.lite.TFLiteConverter.from_keras_model(m)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.target_spec.supported_types = [tf.float16]
    data = conv.convert()
    with open(OUT, "wb") as f:
        f.write(data)
    print(f"wrote {OUT} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
