"""Dense block-diagonal depthwise (round 4) vs the tap/grouped path.

The serving-bucket dw lowering runs as a DENSE conv with
delta-diagonal int8 weights (w_dense / w_dense_b, ops/lowerings.py
_prepare_dwconv2d) — bit-exact because off-diagonal zeros contribute
exactly 0 to the int32 accumulator.  The engine's CPU tier uses
conv_mode="f32_split" where this routing is off, so this test builds
the programs with conv_mode="int8" directly (int8 lax conv is exact on
CPU too, docs/dev-notes.md item 8) and checks the dense path against
the oracle-verified tap path on real model layers:

 * ICN ops (int8, wzp == 0, stride 2): single-tensor diagonal
 * mobilenet-v2 ops (uint8, wzp != 0): zp-folded two-tensor diagonal
"""

import os

import numpy as np
import pytest

from band_tpu.backend.program import build_program
from band_tpu.tflite.parser import parse_tflite_file

DATA = "/root/reference/band/test/data"


def _dw_ops(graph, n=2):
    out = [op.index for op in graph.ops
           if op.opname == "DEPTHWISE_CONV_2D"]
    return out[:n]


def _run(graph, op_idx, batch_hint, rng):
    import jax

    prog = build_program(graph, [op_idx], exact=True, conv_mode="int8")
    fn = jax.jit(prog.make_fn(batch_hint=batch_hint))
    ins = []
    for shape, dtype in prog.input_specs:
        shape = [max(s, 1) for s in shape]
        info = np.iinfo(dtype)
        ins.append(rng.integers(info.min, info.max + 1,
                                shape).astype(dtype))
    outs = fn(prog.params, ins)
    return [np.asarray(o) for o in outs]


@pytest.mark.parametrize("model,needs_split", [
    ("ICN_quant", False),
    ("mobilenet_v2_1.0_224_quant", True),
])
def test_dense_dw_matches_tap_path(model, needs_split, monkeypatch):
    path = f"{DATA}/{model}.tflite"
    if not os.path.exists(path):
        pytest.skip("reference model not available")
    g = parse_tflite_file(path)
    checked = 0
    for oi in _dw_ops(g, n=3):
        key = f"op{oi}/w_dense"
        prog = build_program(g, [oi], exact=True, conv_mode="int8")
        if key not in prog.params:
            continue  # C outside the dense gate for this layer
        if needs_split:
            assert f"op{oi}/w_dense_b" in prog.params
        rng = np.random.default_rng(oi)
        monkeypatch.setenv("BAND_DW_DENSE", "1")
        got = _run(g, oi, 8, np.random.default_rng(oi))
        monkeypatch.setenv("BAND_DW_DENSE", "0")
        want = _run(g, oi, 8, np.random.default_rng(oi))
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)
        checked += 1
    assert checked >= 1, "no dw layer hit the dense gate"


