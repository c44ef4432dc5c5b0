"""Generator for tests/data/lstm_seq.tflite — a keras sequence model
the converter fuses into UNIDIRECTIONAL_SEQUENCE_LSTM ops (stacked
LSTMs + dense head), extending coverage to the recurrent model family.

Run: python tests/gen_lstm_model.py   (writes tests/data/)
"""

import os

import numpy as np
import tensorflow as tf
# Keras 3 (tf.keras in TF>=2.16) broke the converter's LSTM fusion
# pattern (it emits WHILE loops); the Keras 2 compat package still
# produces the fused UNIDIRECTIONAL_SEQUENCE_LSTM ops this generator is
# about.  tests/gen's keras-3 fallback would exercise the WHILE path
# instead (see lstm_seq_while below).
import tf_keras as keras

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "lstm_seq.tflite")
OUT_WHILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "lstm_seq_while.tflite")


def main() -> None:
    keras.utils.set_random_seed(7)
    model = keras.Sequential([
        keras.layers.Input(shape=(12, 16), batch_size=1),
        keras.layers.LSTM(24, return_sequences=True),
        keras.layers.LSTM(16),
        keras.layers.Dense(10),
        keras.layers.Softmax(),
    ])
    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    data = conv.convert()
    with open(OUT, "wb") as f:
        f.write(data)
    print(f"wrote {OUT} ({len(data)} bytes)")

    # same architecture through Keras 3: the converter lowers the
    # recurrence as WHILE ops over body/cond subgraphs (control flow)
    tf.keras.utils.set_random_seed(7)
    model3 = tf.keras.Sequential([
        tf.keras.layers.Input(shape=(12, 16), batch_size=1),
        tf.keras.layers.LSTM(24, return_sequences=True),
        tf.keras.layers.LSTM(16),
        tf.keras.layers.Dense(10),
        tf.keras.layers.Softmax(),
    ])
    conv3 = tf.lite.TFLiteConverter.from_keras_model(model3)
    data3 = conv3.convert()
    with open(OUT_WHILE, "wb") as f:
        f.write(data3)
    print(f"wrote {OUT_WHILE} ({len(data3)} bytes)")

    # GRU: keras-3 converts it the same WHILE-loop way (there is no
    # fused GRU builtin), exercising the TensorArray rewrite on a
    # different cell body
    tf.keras.utils.set_random_seed(9)
    gru = tf.keras.Sequential([
        tf.keras.layers.Input(shape=(10, 12), batch_size=1),
        tf.keras.layers.GRU(20, return_sequences=True),
        tf.keras.layers.GRU(14),
        tf.keras.layers.Dense(6),
    ])
    data4 = tf.lite.TFLiteConverter.from_keras_model(gru).convert()
    out4 = OUT_WHILE.replace("lstm_seq_while", "gru_seq_while")
    with open(out4, "wb") as f:
        f.write(data4)
    print(f"wrote {out4} ({len(data4)} bytes)")

    # full-integer LSTM (the 8x8_16 kernel: int8 gates/weights/output
    # state, int16 cell state) via post-training quantization
    keras.utils.set_random_seed(7)
    mq = keras.Sequential([
        keras.layers.Input(shape=(12, 16), batch_size=1),
        keras.layers.LSTM(24, return_sequences=True),
        keras.layers.LSTM(16),
        keras.layers.Dense(10),
        keras.layers.Softmax(),
    ])
    convq = tf.lite.TFLiteConverter.from_keras_model(mq)
    convq.optimizations = [tf.lite.Optimize.DEFAULT]
    rng = np.random.default_rng(0)

    def rep():
        for _ in range(8):
            yield [rng.standard_normal((1, 12, 16)).astype(np.float32)]

    convq.representative_dataset = rep
    convq.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    convq.inference_input_type = tf.int8
    convq.inference_output_type = tf.int8
    data5 = convq.convert()
    out5 = OUT.replace("lstm_seq", "lstm_seq_int8")
    with open(out5, "wb") as f:
        f.write(data5)
    print(f"wrote {out5} ({len(data5)} bytes)")



def gen_bilstm() -> None:
    # Bidirectional(LSTM) decomposes into forward+reversed fused LSTMs
    # plus REVERSE_V2/CONCAT — no dedicated lowering needed
    keras.utils.set_random_seed(3)
    m = keras.Sequential([
        keras.layers.Input(shape=(10, 12), batch_size=1),
        keras.layers.Bidirectional(
            keras.layers.LSTM(14, return_sequences=True)),
        keras.layers.Bidirectional(keras.layers.LSTM(8)),
        keras.layers.Dense(5),
    ])
    data = tf.lite.TFLiteConverter.from_keras_model(m).convert()
    out = OUT.replace("lstm_seq", "bilstm_seq")
    with open(out, "wb") as f:
        f.write(data)
    print(f"wrote {out} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
    gen_bilstm()
