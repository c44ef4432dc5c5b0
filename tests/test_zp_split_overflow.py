"""Zero-point weight-fold splits must stay inside int8 (ADVICE r4).

The stem split (w - wzp into w_split_a + w_split_b, ops/lowerings.py
_prepare_conv2d) and the dense-diagonal depthwise split (w_dense +
w_dense_b, _prepare_dwconv2d) both decompose w_i = w - wzp (range
[-255, 255]) into two int8 tensors.  w_i == 255 — an int8 weight 127
with recentered wzp == -128, i.e. a uint8 model with weight
zero_point 0 — has NO exact two-int8 split; the old clip-to-[-128,127]
code silently wrapped the remainder 128 -> -128, corrupting that tap
by 256.  The fix clips the first tensor to [-127, 127] (exact for
|w_i| <= 254) and skips the fold entirely at 255.
"""

import numpy as np
import pytest

from band_tpu.ir.graph import Graph, OpNode, QuantParams, TensorDef
from band_tpu.ops.lowerings import _prepare_conv2d, _prepare_dwconv2d
from band_tpu.tflite.schema import TensorType


def _qp(scale, zp):
    return QuantParams(
        scale=np.array([scale], np.float32),
        zero_point=np.array([zp], np.int64),
    )


def _dw_graph(c, w_val, w_zp):
    """1-op DEPTHWISE_CONV_2D graph, uint8, weight filled with w_val."""
    x = TensorDef(0, "x", (1, 8, 8, c), TensorType.UINT8,
                  quant=_qp(0.5, 128))
    w = TensorDef(1, "w", (1, 3, 3, c), TensorType.UINT8,
                  quant=_qp(0.1, w_zp),
                  data=np.full((1, 3, 3, c), w_val, np.uint8))
    b = TensorDef(2, "b", (c,), TensorType.INT32,
                  data=np.zeros(c, np.int32))
    y = TensorDef(3, "y", (1, 8, 8, c), TensorType.UINT8,
                  quant=_qp(1.0, 128))
    op = OpNode(0, "DEPTHWISE_CONV_2D", [0, 1, 2], [3],
                options={"padding": "SAME", "stride_h": 1, "stride_w": 1,
                         "depth_multiplier": 1, "activation": "NONE"})
    return Graph("g", [x, w, b, y], [op], [0], [3]), op


def _stem_graph(w_val, w_zp):
    """1-op CONV_2D stem graph (ci=3), uint8 weights."""
    x = TensorDef(0, "x", (1, 16, 16, 3), TensorType.UINT8,
                  quant=_qp(0.5, 128))
    w = TensorDef(1, "w", (8, 3, 3, 3), TensorType.UINT8,  # OHWI
                  quant=_qp(0.1, w_zp),
                  data=np.full((8, 3, 3, 3), w_val, np.uint8))
    b = TensorDef(2, "b", (8,), TensorType.INT32,
                  data=np.zeros(8, np.int32))
    y = TensorDef(3, "y", (1, 8, 8, 8), TensorType.UINT8,
                  quant=_qp(1.0, 128))
    op = OpNode(0, "CONV_2D", [0, 1, 2], [3],
                options={"padding": "SAME", "stride_h": 2, "stride_w": 2,
                         "activation": "NONE"})
    return Graph("g", [x, w, b, y], [op], [0], [3]), op


def test_dense_dw_split_exact_at_extreme():
    # uint8 weight 254, zero_point 0 -> w_i = 254: split must exist and
    # reconstruct w - wzp exactly on the diagonal
    g, op = _dw_graph(c=64, w_val=254, w_zp=0)
    out = _prepare_dwconv2d(g, op, exact=True)
    assert "w_dense" in out and "w_dense_b" in out
    idx = np.arange(64)
    diag = (out["w_dense"][:, :, idx, idx].astype(np.int32)
            + out["w_dense_b"][:, :, idx, idx].astype(np.int32))
    w_i = (np.full((3, 3, 64), 254, np.int32) - 128) - (0 - 128)
    np.testing.assert_array_equal(diag, w_i)


def test_dense_dw_split_skipped_at_255():
    # uint8 weight 255, zero_point 0 -> w_i = 255: no exact split; the
    # dense path must be skipped (taps handle it), never wrapped
    g, op = _dw_graph(c=64, w_val=255, w_zp=0)
    out = _prepare_dwconv2d(g, op, exact=True)
    assert "w_dense" not in out and "w_dense_b" not in out


def test_dense_dw_split_negative_extreme():
    # uint8 weight 0, zero_point 255 -> w_i = -255: representable as
    # (-127) + (-128); the split must survive and stay exact
    g, op = _dw_graph(c=64, w_val=0, w_zp=255)
    out = _prepare_dwconv2d(g, op, exact=True)
    assert "w_dense" in out and "w_dense_b" in out
    idx = np.arange(64)
    diag = (out["w_dense"][:, :, idx, idx].astype(np.int32)
            + out["w_dense_b"][:, :, idx, idx].astype(np.int32))
    np.testing.assert_array_equal(diag, np.full((3, 3, 64), -255))


def test_stem_split_exact_at_extreme():
    g, op = _stem_graph(w_val=254, w_zp=0)
    out = _prepare_conv2d(g, op, exact=True)
    assert "w_split_a" in out and "w_split_b" in out
    total = (out["w_split_a"].astype(np.int32)
             + out["w_split_b"].astype(np.int32))
    np.testing.assert_array_equal(total, np.full(total.shape, 254))


def test_stem_split_skipped_at_255():
    g, op = _stem_graph(w_val=255, w_zp=0)
    out = _prepare_conv2d(g, op, exact=True)
    assert "w_split_a" not in out and "w_split_b" not in out
    assert "edge_plane" not in out  # belongs to the split path only
