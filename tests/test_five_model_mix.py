"""Milestone config #4 (BASELINE.md): a 5-model concurrent mix under
least-slack-first with SLOs — classification + detection-ish +
super-res + FC + a custom-op chain, all terminating with correct SLO
accounting."""

import os

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.ir.graph import Graph, OpNode, TensorDef
from band_tpu.ir.model import Model
from band_tpu.ops.host_ops import HOST_OPS, register_host_op
from band_tpu.tflite.schema import TensorType
from tests.conftest import has_model, model_path

FC = os.path.join(os.path.dirname(__file__), "data", "fc_int8.tflite")


@pytest.fixture(autouse=True)
def _host_op():
    @register_host_op("CUSTOM:MixPostproc")
    def _pp(graph, op, inputs):
        return [inputs[0] * 0.5]

    yield
    HOST_OPS.pop("CUSTOM:MixPostproc", None)


def chain_model():
    shape = (1, 16)
    t = [
        TensorDef(0, "x", shape, TensorType.FLOAT32),
        TensorDef(1, "c", (1,), TensorType.FLOAT32,
                  data=np.asarray([1.5], np.float32)),
        TensorDef(2, "m", shape, TensorType.FLOAT32),
        TensorDef(3, "y", shape, TensorType.FLOAT32),
    ]
    ops = [
        OpNode(0, "MUL", [0, 1], [2], {"activation": "NONE"}),
        OpNode(1, "CUSTOM:MixPostproc", [2], [3], {}),
    ]
    return Model(graph=Graph("mix_chain", t, ops, [0], [3]), path="mix_chain")


def test_five_model_mix_lsf_with_slos(rng):
    needed = ["add", "ICN_quant", "retinaface_mbv2_quant_160"]
    if not all(has_model(m) for m in needed) or not os.path.exists(FC):
        pytest.skip("models unavailable")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.LEAST_SLACK_TIME_FIRST)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(2,)))
        .minimum_subgraph_size(1)
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mids = [
            eng.register_model(bt.Model.from_path(model_path("add"))),
            eng.register_model(bt.Model.from_path(FC)),
            eng.register_model(bt.Model.from_path(model_path("ICN_quant"))),
            eng.register_model(
                bt.Model.from_path(model_path("retinaface_mbv2_quant_160"))
            ),
            eng.register_model(chain_model()),
        ]
        feeds = []
        for mid in mids:
            g = eng.model_record(mid).model.graph
            ins = []
            for t in g.inputs:
                td = g.tensor(t)
                shape = [max(s, 1) for s in td.shape]
                if np.issubdtype(td.dtype, np.integer):
                    info = np.iinfo(td.dtype)
                    ins.append(
                        rng.integers(info.min, info.max + 1, shape).astype(
                            td.dtype
                        )
                    )
                else:
                    ins.append(rng.standard_normal(shape).astype(td.dtype))
            feeds.append(ins)

        # generous SLOs (CPU latencies are hundreds of ms) + one model
        # with an impossible SLO to exercise the drop path
        opts = [bt.RequestOption(slo_scale=50.0) for _ in mids]
        ids = []
        for round_ in range(3):
            for mid, ins, opt in zip(mids, feeds, opts):
                ids.append(eng.request_async(mid, ins, opt))
        impossible = eng.request_async(
            mids[3], feeds[3], bt.RequestOption(slo_us=1)
        )
        statuses = eng.wait_all(ids + [impossible], timeout=300)
        assert len(statuses) == 16
        ok = [j for j in ids if statuses.get(j) == bt.JobStatus.SUCCESS]
        assert len(ok) == 15, {j: s.value for j, s in statuses.items()}
        assert statuses[impossible] == bt.JobStatus.SLO_VIOLATION
        counts = eng.get_model_execution_counts()
        assert sum(counts.values()) == 16
        # spot-check one output of the chain model (mul 1.5 then *0.5)
        chain_jobs = [j for j, m in zip(ids, (mids * 3)) if m == mids[4]]
        out = eng.get_outputs(ids[4])
        np.testing.assert_allclose(out[0], feeds[4][0] * 0.75, rtol=1e-5)
    finally:
        eng.shutdown()
