"""Multi-host tier units: distributed config, host-major global mesh,
and DCN-aware transfer costing (SURVEY §5.8 obligations).  True
multi-process bring-up needs a cluster; these tests pin the local
semantics the multi-host path relies on."""

import numpy as np
import pytest

import jax

import band_tpu as bt
from band_tpu.config import DistributedConfig, config_from_dict
from band_tpu.parallel.distributed import global_mesh, process_span
from tests.conftest import has_model, model_path


def test_distributed_config_from_json():
    cfg = config_from_dict({
        "schedulers": ["fixed_worker"],
        "workers": [{"device": "cpu", "device_ids": [0]}],
        "distributed": {
            "coordinator_address": "10.0.0.1:8476",
            "num_processes": 4,
            "process_id": 2,
            "local_device_ids": [0, 1],
        },
    })
    assert cfg.distributed.enabled
    assert cfg.distributed.coordinator_address == "10.0.0.1:8476"
    assert cfg.distributed.num_processes == 4
    assert cfg.distributed.process_id == 2
    assert cfg.distributed.local_device_ids == (0, 1)
    assert not DistributedConfig().enabled


def test_global_mesh_auto_sizes_and_orders_host_major():
    devices = jax.devices("cpu")[:8]
    mesh = global_mesh(devices=devices)
    # single process: tp = all local devices, dp = 1
    assert mesh.shape["tp"] == 8 and mesh.shape["dp"] == 1

    mesh = global_mesh(dp=4, tp=2, devices=devices)
    assert mesh.shape == {"dp": 4, "tp": 2}
    assert process_span(devices) == 1

    with pytest.raises(ValueError):
        global_mesh(dp=8, tp=2, devices=devices)


class _FakeDev:
    def __init__(self, pid):
        self.process_index = pid


def test_transfer_cost_classes_ici_vs_dcn():
    if not has_model("add"):
        pytest.skip("reference model not available")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,)))
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(1,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid = eng.register_model(bt.Model.from_path(model_path("add")))
        rec = eng.model_record(mid)
        unit = sorted(rec.boundary_bytes)[0] if rec.boundary_bytes else 0
        nbytes = rec.boundary_bytes.get(unit, 0)

        # same-process devices: ICI class (pretend both are chips)
        eng.config.worker.workers[0].device = bt.DeviceFlag.TPU
        eng.config.worker.workers[1].device = bt.DeviceFlag.TPU
        eng._worker_devices = [[_FakeDev(0)], [_FakeDev(0)]]
        ici = eng.get_transfer_cost_us(mid, unit, 0, 1)
        # cross-process devices: DCN class, strictly more expensive
        eng._worker_devices = [[_FakeDev(0)], [_FakeDev(1)]]
        dcn = eng.get_transfer_cost_us(mid, unit, 0, 1)
        assert dcn > ici
        assert ici == 5 + nbytes // 45_000
        assert dcn == 50 + nbytes // 3_000
        # same worker is free
        assert eng.get_transfer_cost_us(mid, unit, 1, 1) == 0
    finally:
        eng.shutdown()
