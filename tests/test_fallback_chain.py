"""Fallback partitioning + multi-hop subgraph chain end-to-end.

A synthetic model with a custom (host-only) op in the middle forces the
analyzer to split the graph into unit subgraphs: [TPU-able][host-only]
[TPU-able].  Scheduling must chain the hops across workers, handing
boundary activations along (the reference's following_jobs pipeline,
planner.cc:385-409 + engine.cc:1261-1285)."""

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.ir.graph import Graph, OpNode, TensorDef
from band_tpu.ir.model import Model
from band_tpu.ops.host_ops import HOST_OPS, register_host_op
from band_tpu.tflite.schema import TensorType


@pytest.fixture(autouse=True)
def _test_host_op():
    @register_host_op("CUSTOM:TestPlusOne")
    def _plus_one(graph, op, inputs):
        return [inputs[0] + 1.0]

    yield
    HOST_OPS.pop("CUSTOM:TestPlusOne", None)


def make_chain_graph() -> Graph:
    """x -> MUL(x, 2) -> CUSTOM:TestPlusOne -> ADD(+3) -> y"""
    shape = (1, 8)
    t = [
        TensorDef(0, "x", shape, TensorType.FLOAT32),
        TensorDef(1, "two", (1,), TensorType.FLOAT32,
                  data=np.asarray([2.0], np.float32)),
        TensorDef(2, "mul_out", shape, TensorType.FLOAT32),
        TensorDef(3, "custom_out", shape, TensorType.FLOAT32),
        TensorDef(4, "three", (1,), TensorType.FLOAT32,
                  data=np.asarray([3.0], np.float32)),
        TensorDef(5, "y", shape, TensorType.FLOAT32),
    ]
    ops = [
        OpNode(0, "MUL", [0, 1], [2], {"activation": "NONE"}),
        OpNode(1, "CUSTOM:TestPlusOne", [2], [3], {}),
        OpNode(2, "ADD", [3, 4], [5], {"activation": "NONE"}),
    ]
    return Graph(name="chain", tensors=t, ops=ops, inputs=[0], outputs=[5])


def make_engine(scheduler):
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(scheduler)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.TPU, device_ids=(0,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .minimum_subgraph_size(1)
        .subgraph_preparation_type(
            bt.SubgraphPreparationType.MERGE_UNIT_SUBGRAPH
        )
        .profile_warmups(1)
        .profile_runs(1)
        .build()
    )
    return bt.Engine.create(cfg)


def test_analyzer_splits_around_custom_op():
    from band_tpu.ir.analyzer import ModelAnalyzer, build_model_spec
    from band_tpu.config import SubgraphConfig

    g = make_chain_graph()
    spec = build_model_spec(g, worker_is_host=[False, True])
    assert spec.num_unit_subgraphs == 3
    assert spec.unsupported_ops[0] == {1}  # custom op not on TPU worker
    assert spec.unsupported_ops[1] == set()
    assert spec.unit_dependencies[1] == frozenset({0})
    assert spec.unit_dependencies[2] == frozenset({0, 1})

    analyzer = ModelAnalyzer(
        g, spec, 2, SubgraphConfig(minimum_subgraph_size=1), True
    )
    defs = analyzer.create_subgraphs()
    tpu_units = {tuple(sorted(d.unit_indices)) for d in defs
                 if d.worker_id == 0}
    host_units = {tuple(sorted(d.unit_indices)) for d in defs
                  if d.worker_id == 1}
    assert (0,) in tpu_units and (2,) in tpu_units
    assert (1,) not in tpu_units
    assert (0, 1, 2) in host_units  # host can run the whole chain


@pytest.mark.parametrize(
    "scheduler",
    [
        bt.SchedulerType.SHORTEST_EXPECTED_LATENCY,
        bt.SchedulerType.HETEROGENEOUS_EARLIEST_FINISH_TIME,
        bt.SchedulerType.LEAST_SLACK_TIME_FIRST,
    ],
)
def test_chain_end_to_end(scheduler, rng):
    eng = make_engine(scheduler)
    try:
        mid = eng.register_model(Model(graph=make_chain_graph(), path="chain"))
        rec = eng.model_record(mid)
        # the custom unit must only ever be prepared on the host worker
        for key in rec.subgraph_keys:
            if 1 in key.unit_indices:
                assert key.worker_id == 1
        x = rng.standard_normal((1, 8)).astype(np.float32)
        out = eng.request_sync(mid, [x])
        np.testing.assert_allclose(out[0], x * 2.0 + 1.0 + 3.0, rtol=1e-6)
        # a few concurrent requests keep working
        ids = eng.request_async_batch([mid] * 6, [[x]] * 6)
        statuses = eng.wait_all(ids)
        assert all(s == bt.JobStatus.SUCCESS for s in statuses.values())
    finally:
        eng.shutdown()


def test_chain_executes_multiple_hops(rng):
    """With the host worker slowed, SEL should still produce correct
    results through whichever path it picks, and the finished job must
    have accumulated resolved units."""
    eng = make_engine(bt.SchedulerType.SHORTEST_EXPECTED_LATENCY)
    try:
        mid = eng.register_model(Model(graph=make_chain_graph(), path="chain"))
        x = np.ones((1, 8), np.float32)
        jid = eng.request_async(mid, [x])
        eng.wait_all([jid])
        job = eng.planner.get_finished_job(jid)
        assert job.status == bt.JobStatus.SUCCESS
        total_units = eng.model_record(mid).spec.num_unit_subgraphs
        covered = job.resolved_unit_subgraphs | job.subgraph_key.unit_indices
        assert len(covered) == total_units
    finally:
        eng.shutdown()
