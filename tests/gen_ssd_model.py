"""Generator for tests/data/ssd_int8.tflite + ssd_regular_int8.tflite —
int8 SSD-style detectors ending in the TFLite_Detection_PostProcess
custom op (the op the reference's models like efficientdet_lite0_int8
and ssd_mobilenet use, handled via CPU fallback partitioning there:
band/model_analyzer.cc:627-789).

Built as: a small quantized conv backbone + box/class heads converted
with the regular TFLite PTQ pipeline, then post-edited with the TFLite
flatbuffer object API to append the custom op (anchors constant +
flexbuffer options), exactly how real SSD exports are laid out.

Run: python tests/gen_ssd_model.py   (writes tests/data/)
"""

import os

import numpy as np
import tensorflow as tf
from flatbuffers import flexbuffers
from tensorflow.lite.python import schema_py_generated as schema
from tensorflow.lite.tools import flatbuffer_utils

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
H = W = 32
GRID = 8          # backbone downsamples 32 -> 8
NUM_BOXES = GRID * GRID
NUM_CLASSES = 3   # excludes background
MAX_DET = 10


def build_backbone() -> bytes:
    rng = np.random.default_rng(7)
    inp = tf.keras.Input(shape=(H, W, 3), batch_size=1)
    x = tf.keras.layers.Conv2D(16, 3, strides=2, padding="same",
                               activation="relu")(inp)
    x = tf.keras.layers.Conv2D(32, 3, strides=2, padding="same",
                               activation="relu")(x)
    loc = tf.keras.layers.Conv2D(4, 1)(x)
    loc = tf.keras.layers.Reshape((NUM_BOXES, 4))(loc)
    cls = tf.keras.layers.Conv2D(NUM_CLASSES + 1, 1)(x)
    cls = tf.keras.layers.Reshape((NUM_BOXES, NUM_CLASSES + 1))(cls)
    cls = tf.keras.layers.Activation("sigmoid")(cls)
    model = tf.keras.Model(inp, [loc, cls])

    def rep():
        for _ in range(8):
            yield [rng.standard_normal((1, H, W, 3)).astype(np.float32)]

    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = rep
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    # float I/O: postprocess consumes dequantized head outputs, like
    # shipped SSD exports
    return conv.convert()


def make_anchors() -> np.ndarray:
    """One center-size anchor per grid cell (ycenter, xcenter, h, w)."""
    ys, xs = np.meshgrid(
        (np.arange(GRID) + 0.5) / GRID, (np.arange(GRID) + 0.5) / GRID,
        indexing="ij",
    )
    h = np.full_like(ys, 1.5 / GRID)
    w = np.full_like(ys, 1.5 / GRID)
    return np.stack([ys, xs, h, w], axis=-1).reshape(NUM_BOXES, 4).astype(
        np.float32
    )


def append_postprocess(flat: bytes, use_regular_nms: bool) -> bytearray:
    model = flatbuffer_utils.convert_bytearray_to_object(bytearray(flat))
    sg = model.subgraphs[0]

    def tensor_shape(i):
        return list(sg.tensors[i].shape)

    outs = list(sg.outputs)
    loc_t = next(i for i in outs if tensor_shape(i)[-1] == 4)
    cls_t = next(i for i in outs if tensor_shape(i)[-1] == NUM_CLASSES + 1)

    def add_buffer(data: bytes) -> int:
        buf = schema.BufferT()
        buf.data = np.frombuffer(data, dtype=np.uint8)
        model.buffers.append(buf)
        return len(model.buffers) - 1

    def add_tensor(name, shape, ttype, buffer_idx=0) -> int:
        t = schema.TensorT()
        t.name = name.encode()
        t.shape = shape
        t.type = ttype
        t.buffer = buffer_idx
        sg.tensors.append(t)
        return len(sg.tensors) - 1

    anchors = make_anchors()
    anchors_t = add_tensor(
        "anchors", [NUM_BOXES, 4], schema.TensorType.FLOAT32,
        add_buffer(anchors.tobytes()),
    )
    boxes_t = add_tensor("detection_boxes", [1, MAX_DET, 4],
                         schema.TensorType.FLOAT32)
    classes_t = add_tensor("detection_classes", [1, MAX_DET],
                           schema.TensorType.FLOAT32)
    scores_t = add_tensor("detection_scores", [1, MAX_DET],
                          schema.TensorType.FLOAT32)
    num_t = add_tensor("num_detections", [1], schema.TensorType.FLOAT32)

    code = schema.OperatorCodeT()
    code.deprecatedBuiltinCode = schema.BuiltinOperator.CUSTOM
    code.builtinCode = schema.BuiltinOperator.CUSTOM
    code.customCode = b"TFLite_Detection_PostProcess"
    code.version = 1
    model.operatorCodes.append(code)

    op = schema.OperatorT()
    op.opcodeIndex = len(model.operatorCodes) - 1
    op.inputs = [loc_t, cls_t, anchors_t]
    op.outputs = [boxes_t, classes_t, scores_t, num_t]
    op.customOptions = np.frombuffer(
        bytes(
            flexbuffers.Dumps(
                {
                    "max_detections": MAX_DET,
                    "max_classes_per_detection": 1,
                    "detections_per_class": 4,
                    "use_regular_nms": use_regular_nms,
                    "nms_score_threshold": 0.35,
                    "nms_iou_threshold": 0.5,
                    "num_classes": NUM_CLASSES,
                    "y_scale": 10.0,
                    "x_scale": 10.0,
                    "h_scale": 5.0,
                    "w_scale": 5.0,
                }
            )
        ),
        dtype=np.uint8,
    )
    op.customOptionsFormat = 0
    sg.operators.append(op)
    sg.outputs = [boxes_t, classes_t, scores_t, num_t]
    return flatbuffer_utils.convert_object_to_bytearray(model)


def main():
    os.makedirs(DATA_DIR, exist_ok=True)
    flat = build_backbone()
    for name, regular in (("ssd_int8.tflite", False),
                          ("ssd_regular_int8.tflite", True)):
        out = os.path.join(DATA_DIR, name)
        with open(out, "wb") as f:
            f.write(append_postprocess(flat, regular))
        print("wrote", out)
        # smoke: the real interpreter must run it
        it = tf.lite.Interpreter(model_path=out)
        it.allocate_tensors()
        d = it.get_input_details()[0]
        it.set_tensor(d["index"],
                      np.random.default_rng(0)
                      .standard_normal(d["shape"]).astype(np.float32))
        it.invoke()
        shapes = [tuple(o["shape"]) for o in it.get_output_details()]
        print("  interpreter outputs:", shapes)


if __name__ == "__main__":
    main()
