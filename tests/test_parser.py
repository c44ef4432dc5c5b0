"""Parser tests against the reference INT8 model zoo."""

import numpy as np
import pytest

from band_tpu.tflite.parser import parse_tflite_file
from band_tpu.tflite.schema import TensorType
from tests.conftest import has_model, model_path

MODELS = {
    "add": (2, 3),
    "mobilenet_v2_1.0_224_quant": (65, 173),
    "retinaface_mbv2_quant_160": (131, 277),
    "ICN_quant": (77, 185),
}


@pytest.mark.parametrize("name", list(MODELS))
def test_parse_counts(name):
    if not has_model(name):
        pytest.skip("reference model not available")
    g = parse_tflite_file(model_path(name))
    ops, tensors = MODELS[name]
    assert len(g.ops) == ops
    assert len(g.tensors) == tensors
    assert g.inputs and g.outputs


def test_mobilenet_quant_params():
    if not has_model("mobilenet_v2_1.0_224_quant"):
        pytest.skip("reference model not available")
    g = parse_tflite_file(model_path("mobilenet_v2_1.0_224_quant"))
    t_in = g.tensor(g.inputs[0])
    assert t_in.ttype == TensorType.UINT8
    assert t_in.shape == (1, 224, 224, 3)
    assert abs(float(t_in.quant.scale[0]) - 0.0078125) < 1e-9
    assert int(t_in.quant.zero_point[0]) == 128
    # weights exist and are constant
    conv0 = g.ops[0]
    assert conv0.opname == "CONV_2D"
    w = g.tensor(conv0.inputs[1])
    assert w.is_constant and w.data.dtype == np.uint8


def test_parse_against_tf_oracle():
    """Cross-check tensor shapes/dtypes with the TF interpreter."""
    if not has_model("retinaface_mbv2_quant_160"):
        pytest.skip("reference model not available")
    tf = pytest.importorskip("tensorflow")
    path = model_path("retinaface_mbv2_quant_160")
    g = parse_tflite_file(path)
    it = tf.lite.Interpreter(model_path=path)
    for d in it.get_input_details():
        td = g.tensor(d["index"])
        assert tuple(d["shape"]) == td.shape
        assert np.dtype(d["dtype"]) == td.dtype
    for d in it.get_output_details():
        td = g.tensor(d["index"])
        assert tuple(d["shape"]) == td.shape
