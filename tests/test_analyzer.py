"""ModelAnalyzer partitioning tests over synthetic graphs (the
partitioning-integration analogue of tfl_subgraph_test.cc, but directly
against the analyzer)."""

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.config import SubgraphConfig
from band_tpu.ir.analyzer import ModelAnalyzer, build_model_spec
from band_tpu.ir.graph import Graph, OpNode, TensorDef
from band_tpu.ir.model_spec import compute_unit_dependencies
from band_tpu.ops.host_ops import HOST_OPS, register_host_op
from band_tpu.tflite.schema import TensorType


@pytest.fixture(autouse=True)
def _host_op():
    @register_host_op("CUSTOM:X")
    def _x(graph, op, inputs):
        return [inputs[0]]

    yield
    HOST_OPS.pop("CUSTOM:X", None)


def linear_graph(opnames):
    """t0 -> op0 -> t1 -> op1 -> ... (unary chain, ABS used for builtins)."""
    shape = (1, 4)
    tensors = [TensorDef(0, "t0", shape, TensorType.FLOAT32)]
    ops = []
    for i, name in enumerate(opnames):
        tensors.append(TensorDef(i + 1, f"t{i+1}", shape, TensorType.FLOAT32))
        ops.append(OpNode(i, name, [i], [i + 1], {}))
    return Graph("g", tensors, ops, [0], [len(opnames)])


def test_single_unit_when_fully_supported():
    g = linear_graph(["ABS"] * 5)
    spec = build_model_spec(g, [False, False])
    assert spec.num_unit_subgraphs == 1
    assert spec.unit_subgraph_ops[0] == frozenset(range(5))


def test_units_split_on_support_boundary():
    g = linear_graph(["ABS", "ABS", "CUSTOM:X", "ABS"])
    spec = build_model_spec(g, [False, True])
    assert spec.num_unit_subgraphs == 3
    assert spec.unit_subgraph_ops[1] == frozenset({2})
    deps = spec.unit_dependencies
    assert deps[2] == frozenset({0, 1})


def test_prep_types_produce_expected_defs():
    g = linear_graph(["ABS", "ABS", "CUSTOM:X", "ABS"])
    spec = build_model_spec(g, [False, True])

    def defs_for(prep, min_size=1, fallback=True):
        cfg = SubgraphConfig(
            minimum_subgraph_size=min_size, subgraph_preparation_type=prep
        )
        return ModelAnalyzer(g, spec, 2, cfg, fallback).create_subgraphs()

    unit = defs_for(bt.SubgraphPreparationType.UNIT_SUBGRAPH)
    # host worker supports all 3 units; tpu worker units 0 and 2
    assert len(unit) == 5

    merged = defs_for(bt.SubgraphPreparationType.MERGE_UNIT_SUBGRAPH)
    host_ranges = {
        tuple(sorted(d.unit_indices)) for d in merged if d.worker_id == 1
    }
    assert (0, 1, 2) in host_ranges  # whole chain on host
    tpu_ranges = {
        tuple(sorted(d.unit_indices)) for d in merged if d.worker_id == 0
    }
    assert tpu_ranges == {(0,), (2,)}

    # no-fallback: only workers supporting every op get the whole model
    cfg = SubgraphConfig(
        subgraph_preparation_type=bt.SubgraphPreparationType.NO_FALLBACK_SUBGRAPH
    )
    nf = ModelAnalyzer(g, spec, 2, cfg, False).create_subgraphs()
    assert {d.worker_id for d in nf} == {1}


def test_minimum_subgraph_size_prunes_merges():
    g = linear_graph(["ABS"] * 6 + ["CUSTOM:X"] + ["ABS"] * 6)
    spec = build_model_spec(g, [False, True])
    assert spec.num_unit_subgraphs == 3
    cfg = SubgraphConfig(
        minimum_subgraph_size=4,
        subgraph_preparation_type=bt.SubgraphPreparationType.MERGE_UNIT_SUBGRAPH,
    )
    defs = ModelAnalyzer(g, spec, 2, cfg, True).create_subgraphs()
    # the 1-op custom unit survives as an anchor (single units are kept),
    # but no merged range smaller than 4 ops exists
    for d in defs:
        if len(d.unit_indices) > 1:
            assert len(d.op_indices) >= 4


def test_unsupported_everywhere_raises():
    g = linear_graph(["ABS", "CUSTOM:X"])
    with pytest.raises(bt.ModelError):
        build_model_spec(g, [False, False])  # no host worker


def test_unit_dependency_transitive_closure():
    g = linear_graph(["ABS", "CUSTOM:X", "ABS", "CUSTOM:X", "ABS"])
    spec = build_model_spec(g, [False, True])
    assert spec.num_unit_subgraphs == 5
    assert spec.unit_dependencies[4] == frozenset({0, 1, 2, 3})
