"""Throughput-numerics mode (RuntimeConfig.numerics == "fast").

VERDICT r4 next-round #2: the bit-exact VPU requant/ADD epilogues are
the measured single-chip gap at serving batches; the fast mode swaps
them for float32 forms.  Contract: every fast-mode op output stays
within ±1 quant unit of the exact pipeline per op, the knob plumbs
from config JSON through Engine.register_model, and the accuracy gate
(tools/evaluate --fast) certifies whole-model agreement.
"""

import numpy as np
import pytest

import band_tpu as bt
from band_tpu.backend.program import build_program
from band_tpu.tflite.parser import parse_tflite_file
from tests.conftest import has_model, model_path


def _run_prog(g, ops, exact, rng, batch_hint=1):
    import jax

    prog = build_program(g, ops, exact=exact, conv_mode="f32_split")
    fn = jax.jit(prog.make_fn(batch_hint=batch_hint))
    ins = []
    for shape, dtype in prog.input_specs:
        shape = [max(s, 1) for s in shape]
        if np.issubdtype(dtype, np.integer):
            info = np.iinfo(dtype)
            ins.append(rng.integers(info.min, info.max + 1,
                                    shape).astype(dtype))
        else:
            ins.append(rng.standard_normal(shape).astype(dtype))
    return [np.asarray(o) for o in fn(prog.params, ins)]


@pytest.mark.parametrize("model", [
    "mobilenet_v2_1.0_224_quant",
    "retinaface_mbv2_quant_160",
    "ICN_quant",
])
def test_fast_ops_within_one_quant_unit(model):
    """Per-op: fast vs exact differ by at most 1 quant unit on every
    quantized CONV/DW/FC/ADD/SUB/MUL (the ops with fast epilogues)."""
    if not has_model(model):
        pytest.skip("reference model not available")
    g = parse_tflite_file(model_path(model))
    targets = [
        op.index for op in g.ops
        if op.opname in ("CONV_2D", "DEPTHWISE_CONV_2D", "FULLY_CONNECTED",
                         "ADD", "SUB", "MUL")
    ]
    # spread samples across the model (first/middle/last few)
    picks = sorted(set(targets[:3] + targets[len(targets) // 2:
                                            len(targets) // 2 + 3]
                       + targets[-3:]))
    checked = 0
    for oi in picks:
        rng_a = np.random.default_rng(1000 + oi)
        rng_b = np.random.default_rng(1000 + oi)
        want = _run_prog(g, [oi], True, rng_a)
        got = _run_prog(g, [oi], False, rng_b)
        for a, b in zip(want, got):
            if np.issubdtype(a.dtype, np.integer):
                diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
                assert diff.max() <= 1, (model, oi, diff.max())
            else:
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        checked += 1
    assert checked >= 3


def test_config_numerics_knob():
    cfg = bt.RuntimeConfigBuilder().numerics("fast").add_worker(
        bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,))
    ).build()
    assert cfg.numerics == "fast"
    from band_tpu.config import config_from_dict, config_hash

    d = {"schedulers": ["round_robin"], "workers": ["cpu"],
         "numerics": "FAST"}
    cfg2 = config_from_dict(d)
    assert cfg2.numerics == "fast"
    # fast/exact profiles must not share a persisted-profile key
    d["numerics"] = "exact"
    assert config_hash(cfg2) != config_hash(config_from_dict(d))
    with pytest.raises(bt.ConfigError):
        bt.RuntimeConfigBuilder().numerics("approximate").add_worker(
            bt.WorkerSpec(device=bt.DeviceFlag.CPU, device_ids=(0,))
        ).build()


def test_per_model_numerics_override():
    """register_model(numerics=...) overrides the engine default per
    model — a mix serves fast and exact models side by side."""
    model = "tests/data/quant_act_int8.tflite"
    import os

    if not os.path.exists(model):
        pytest.skip("generated model not present")
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU,
                                  device_ids=(0,)))
        .profile_warmups(0)
        .profile_runs(1)
        .build()
    )
    eng = bt.Engine.create(cfg)
    try:
        mid_exact = eng.register_model(bt.Model.from_path(model))
        mid_fast = eng.register_model(bt.Model.from_path(model),
                                      numerics="fast")
        ex_e = eng.model_record(mid_exact).executors[0]
        ex_f = eng.model_record(mid_fast).executors[0]
        assert ex_e.exact and not ex_f.exact
        with pytest.raises(bt.ConfigError):
            eng.register_model(bt.Model.from_path(model),
                               numerics="sloppy")
    finally:
        eng.shutdown()
    # the benchmark tool schema carries the same per-model key
    from band_tpu.tools.benchmark import ModelLoadConfig

    mc = ModelLoadConfig.from_dict({"graph": model, "numerics": "fast"})
    assert mc.numerics == "fast"


def test_engine_serves_fast_numerics():
    """End-to-end: a fast-numerics engine serves a quantized model with
    outputs within a few quant units of the exact engine (per-op ±1
    drift can compound across layers; classification agreement is the
    deployment gate, tools/evaluate --fast)."""
    model = "tests/data/quant_act_int8.tflite"
    import os

    if not os.path.exists(model):
        pytest.skip("generated model not present")
    outs = {}
    rng = np.random.default_rng(7)
    g = parse_tflite_file(model)
    td = g.tensor(g.inputs[0])
    info = np.iinfo(td.dtype)
    x = rng.integers(info.min, info.max + 1,
                     [max(s, 1) for s in td.shape]).astype(td.dtype)
    for mode in ("exact", "fast"):
        cfg = (
            bt.RuntimeConfigBuilder()
            .add_scheduler(bt.SchedulerType.FIXED_WORKER)
            .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.CPU,
                                      device_ids=(0,)))
            .numerics(mode)
            .profile_warmups(0)
            .profile_runs(1)
            .build()
        )
        eng = bt.Engine.create(cfg)
        try:
            mid = eng.register_model(bt.Model.from_path(model))
            outs[mode] = eng.request_sync(mid, [x], timeout=120)
        finally:
            eng.shutdown()
    for a, b in zip(outs["exact"], outs["fast"]):
        if np.issubdtype(a.dtype, np.integer):
            diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
            assert diff.max() <= 4, diff.max()
        else:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
