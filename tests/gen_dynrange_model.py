"""Generator for tests/data/dynrange.tflite — a dynamic-range
("hybrid") quantized model: int8 weights with per-channel scales, float
activations quantized per batch at runtime (TFLite EvalHybrid).

Run: python tests/gen_dynrange_model.py   (writes tests/data/)
"""

import os

import tensorflow as tf
import tf_keras as keras

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "dynrange.tflite")


def main() -> None:
    keras.utils.set_random_seed(6)
    m = keras.Sequential([
        keras.layers.Input(shape=(16, 16, 8), batch_size=1),
        keras.layers.Conv2D(32, 3, padding="same", activation="relu"),
        keras.layers.DepthwiseConv2D(3, padding="same"),
        keras.layers.Flatten(),
        keras.layers.Dense(64, activation="relu"),
        keras.layers.Dense(10),
    ])
    conv = tf.lite.TFLiteConverter.from_keras_model(m)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    data = conv.convert()
    with open(OUT, "wb") as f:
        f.write(data)
    print(f"wrote {OUT} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
