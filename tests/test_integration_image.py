"""End-to-end integration: JPEG -> preprocessing pipeline -> engine ->
classification, plus chrome-trace + resource-monitor wiring (the
analogue of the reference's tfl_minimal_test.cc image flows)."""

import json
import os

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.buffer.buffer import Buffer
from band_tpu.buffer.processor import ImageProcessorBuilder
from tests.conftest import has_model, model_path

CAT = "/root/reference/band/test/data/cat.jpg"


def test_classify_cat_through_pipeline(tmp_path):
    if not (has_model("mobilenet_v2_1.0_224_quant") and os.path.exists(CAT)):
        pytest.skip("reference data unavailable")
    from PIL import Image

    trace_path = str(tmp_path / "trace.json")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .profile_warmups(0)
        .profile_runs(1)
        .planner_log_path(trace_path)
        .enable_monitor(interval_ms=100)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid = eng.register_model(
            bt.Model.from_path(model_path("mobilenet_v2_1.0_224_quant"))
        )
        img = np.asarray(Image.open(CAT).convert("RGB"))
        proc = (
            ImageProcessorBuilder()
            .add_auto_convert((1, 224, 224, 3), np.uint8)
            .build()
        )
        tensor = proc.to_tensor(Buffer.from_numpy(img))
        assert tensor.shape == (1, 224, 224, 3) and tensor.dtype == np.uint8
        out = eng.request_sync(mid, [tensor])
        probs = out[0].ravel()
        top = int(np.argmax(probs))
        # ImageNet+background labels: cat classes sit in 282-294
        # (tabby/tiger/persian/siamese/egyptian/lynx...)
        assert 280 <= top <= 295, f"top-1 class {top} is not a cat"
        # monitor produced at least one snapshot
        import time

        time.sleep(0.25)
        assert eng.resource_monitor is not None
        snap = eng.resource_monitor.status()
        assert "ts" in snap or snap == {}
    finally:
        eng.shutdown()
    # trace dumped with our job events
    with open(trace_path) as f:
        trace = json.load(f)
    names = [e.get("name", "") for e in trace["traceEvents"]]
    assert any("m0" in n for n in names)
