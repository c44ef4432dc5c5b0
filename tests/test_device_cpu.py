"""Host CPU affinity layer (reference: band/device/cpu.{h,cc},
band/test/cpu_test.cc) + config wiring of cpu_masks/planner_cpu_masks."""

import os
import threading

import pytest

from band_tpu.device import cpu as cpu_dev
from band_tpu.device.cpu import CPUMaskFlag, CpuSet

HAVE_SCHED = hasattr(os, "sched_setaffinity")


def test_cpuset_ops():
    s = CpuSet()
    assert s.num_enabled() == 0
    s.enable(0)
    s.enable(3)
    assert s.is_enabled(3) and not s.is_enabled(1)
    assert s.num_enabled() == 2
    s.disable(3)
    assert s.num_enabled() == 1
    s.disable_all()
    assert s.num_enabled() == 0
    assert CpuSet([1, 2]) == CpuSet([2, 1])


def test_mask_setup_invariants():
    n = cpu_dev.cpu_count()
    all_set = cpu_dev.cpu_mask_set(CPUMaskFlag.ALL)
    little = cpu_dev.cpu_mask_set(CPUMaskFlag.LITTLE)
    big = cpu_dev.cpu_mask_set(CPUMaskFlag.BIG)
    primary = cpu_dev.cpu_mask_set(CPUMaskFlag.PRIMARY)
    assert all_set == CpuSet(range(n))
    # every cluster is a subset of ALL and clusters are disjoint
    for s in (little, big, primary):
        assert s.cpus <= all_set.cpus
    assert not (little.cpus & big.cpus)
    assert not (little.cpus & primary.cpus)
    assert not (big.cpus & primary.cpus)
    # reference invariant (cpu.cc:352-358, 370-374): on a homogeneous
    # host LITTLE is empty and BIG == ALL; on big.LITTLE hosts both
    # non-empty
    if little.num_enabled() == 0 and primary.num_enabled() == 0:
        assert big == all_set


def test_parse_cpu_mask():
    assert cpu_dev.parse_cpu_mask("ALL") == cpu_dev.cpu_mask_set(CPUMaskFlag.ALL)
    assert cpu_dev.parse_cpu_mask("big") == cpu_dev.cpu_mask_set(CPUMaskFlag.BIG)
    assert cpu_dev.parse_cpu_mask("0") == CpuSet([0])
    assert cpu_dev.parse_cpu_mask("0,2-3") == CpuSet([0, 2, 3])
    assert cpu_dev.parse_cpu_mask("") is None
    assert cpu_dev.parse_cpu_mask("bogus") is None
    # a flag resolving to an empty cluster falls back to ALL at the
    # config level (PRIMARY on homogeneous hosts)
    resolved = cpu_dev.resolve_configured_mask("PRIMARY")
    assert resolved is not None and resolved.num_enabled() > 0


@pytest.mark.skipif(not HAVE_SCHED, reason="no sched_setaffinity")
def test_affinity_set_get_roundtrip():
    # reference: cpu_test.cc AffinitySetTest/EnableTest/DisableTest
    saved = cpu_dev.get_thread_affinity()
    try:
        target = CpuSet([0])
        assert cpu_dev.set_thread_affinity(target)
        assert cpu_dev.get_thread_affinity() == target
        # empty set must fail (DisableTest)
        assert not cpu_dev.set_thread_affinity(CpuSet())
        full = cpu_dev.cpu_mask_set(CPUMaskFlag.ALL)
        assert cpu_dev.set_thread_affinity(full)
        assert cpu_dev.get_thread_affinity() == full
    finally:
        cpu_dev.set_thread_affinity(saved)


@pytest.mark.skipif(not HAVE_SCHED, reason="no sched_setaffinity")
def test_affinity_is_per_thread():
    saved = cpu_dev.get_thread_affinity()
    seen = {}

    def child():
        cpu_dev.set_thread_affinity(CpuSet([0]))
        seen["child"] = cpu_dev.get_thread_affinity()

    t = threading.Thread(target=child)
    t.start()
    t.join()
    assert seen["child"] == CpuSet([0])
    # the caller thread's mask is untouched
    assert cpu_dev.get_thread_affinity() == saved


def test_config_parses_reference_mask_keys():
    from band_tpu.config import config_from_dict

    cfg = config_from_dict(
        {
            "schedulers": ["round_robin"],
            "cpu_masks": "ALL",
            "planner_cpu_masks": "PRIMARY",
            "workers": [
                {"device": "CPU", "num_threads": 2, "cpu_masks": "BIG"},
                {"device": "CPU", "num_threads": 2, "cpu_masks": "LITTLE"},
            ],
        }
    )
    assert cfg.cpu_mask == "ALL"
    assert cfg.planner.cpu_mask == "PRIMARY"
    assert [w.cpu_mask for w in cfg.worker.workers] == ["BIG", "LITTLE"]
    assert [w.num_threads for w in cfg.worker.workers] == [2, 2]


def test_config_rejects_bad_mask():
    from band_tpu.config import WorkerSpec
    from band_tpu.errors import ConfigError

    with pytest.raises(ConfigError):
        WorkerSpec(cpu_mask="not-a-mask").validate()


@pytest.mark.skipif(not HAVE_SCHED, reason="no sched_setaffinity")
def test_worker_and_planner_threads_pinned():
    """Engine wiring: worker dispatch threads and the planner thread
    apply their configured masks (reference: worker.cc:61-91,
    planner_cpu_masks)."""
    import band_tpu as bt

    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(
            bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,), cpu_mask="0")
        )
        .planner_cpu_mask("0")
        .profile_online(False)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        # exercise the loops so both threads have run their prologue
        import numpy as np

        mid = eng.register_model(_tiny_model())
        g = eng.model_record(mid).model.graph
        ins = [
            np.zeros([max(s, 1) for s in g.tensor(t).shape], g.tensor(t).dtype)
            for t in g.inputs
        ]
        eng.request_sync(mid, ins, timeout=60)
        worker_tid = eng.workers[0]._thread.native_id
        planner_tid = eng.planner._thread.native_id
        assert os.sched_getaffinity(worker_tid) == {0}
        assert os.sched_getaffinity(planner_tid) == {0}
    finally:
        eng.shutdown()


def _tiny_model():
    import band_tpu as bt

    path = os.path.join(os.path.dirname(__file__), "data", "add_f32.tflite")
    if os.path.exists(path):
        return bt.Model.from_path(path)
    return bt.Model.from_path("/root/reference/band/test/data/add.tflite")
