"""Generator for tests/data/effnetlite_int8.tflite — an
EfficientNet-Lite-style int8 classifier (MBConv blocks: 1x1 expand →
3x3 depthwise → 1x1 project, ReLU6, residual on stride-1 blocks, no
squeeze-excite — the lite variant's op mix) for the BASELINE milestone
config #2 (EfficientNet-Lite + ResNet-50 class mix under round-robin).

Run: python tests/gen_effnet_model.py   (writes tests/data/)
"""

import os

import numpy as np
import tensorflow as tf

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "effnetlite_int8.tflite")


def mbconv(x, expand, out_ch, stride):
    inp_ch = x.shape[-1]
    y = x
    if expand != 1:
        y = tf.keras.layers.Conv2D(inp_ch * expand, 1, padding="same",
                                   use_bias=True)(y)
        y = tf.keras.layers.ReLU(max_value=6.0)(y)
    y = tf.keras.layers.DepthwiseConv2D(3, strides=stride, padding="same",
                                        use_bias=True)(y)
    y = tf.keras.layers.ReLU(max_value=6.0)(y)
    y = tf.keras.layers.Conv2D(out_ch, 1, padding="same", use_bias=True)(y)
    if stride == 1 and inp_ch == out_ch:
        y = tf.keras.layers.Add()([x, y])
    return y


def build():
    inp = tf.keras.Input(shape=(64, 64, 3), batch_size=1)
    x = tf.keras.layers.Conv2D(16, 3, strides=2, padding="same")(inp)
    x = tf.keras.layers.ReLU(max_value=6.0)(x)
    x = mbconv(x, expand=1, out_ch=16, stride=1)
    x = mbconv(x, expand=4, out_ch=24, stride=2)
    x = mbconv(x, expand=4, out_ch=24, stride=1)
    x = mbconv(x, expand=4, out_ch=40, stride=2)
    x = tf.keras.layers.Conv2D(96, 1, padding="same")(x)
    x = tf.keras.layers.ReLU(max_value=6.0)(x)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    x = tf.keras.layers.Dense(10)(x)
    x = tf.keras.layers.Softmax()(x)
    return tf.keras.Model(inp, x)


def main():
    rng = np.random.default_rng(11)
    model = build()

    def rep():
        for _ in range(8):
            yield [rng.standard_normal((1, 64, 64, 3)).astype(np.float32)]

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

    it = tf.lite.Interpreter(model_path=OUT)
    it.allocate_tensors()
    d = it.get_input_details()[0]
    it.set_tensor(d["index"],
                  rng.integers(-128, 128, d["shape"]).astype(np.int8))
    it.invoke()
    print("ops:", sorted({o["op_name"] for o in it._get_ops_details()}))


if __name__ == "__main__":
    main()
