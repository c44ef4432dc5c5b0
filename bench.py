#!/usr/bin/env python
"""Benchmark: multi-DNN INT8 serving throughput on one chip.

Serves the reference's INT8 model mix (mobilenet_v2-uint8, retinaface
int8, ICN int8 — the models in band/test/data) through the band_tpu
engine on a single TPU chip and reports requests/second, with the
TFLite CPU interpreter (the reference's execution engine) as the
baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "req/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DATA = "/root/reference/band/test/data"
MODELS = [
    "mobilenet_v2_1.0_224_quant",
    "retinaface_mbv2_quant_160",
    "ICN_quant",
]
N_REQUESTS = int(os.environ.get("BENCH_REQUESTS", "400"))
# continuous batching is the engine's serving mode (the mix roofline
# assumes filled windows); override to 1 to measure serial dispatch.
# 32 measured 484 (b8) -> 754 (b16) -> 1139 req/s (b32); 64's extra
# bucket compiles risk the bench budget on a cold cache.
MAX_BATCH = int(os.environ.get("BENCH_MAX_BATCH", "32"))
# workers per chip (dispatch threads share the device; >1 overlaps host
# staging of one model with device execution of another) and dispatch
# pipeline depth per worker
N_WORKERS = int(os.environ.get("BENCH_WORKERS", "1"))
DEPTH = int(os.environ.get("BENCH_DEPTH", "4"))


def model_paths():
    return [f"{DATA}/{m}.tflite" for m in MODELS]


def random_inputs(graph, rng):
    out = []
    for t in graph.inputs:
        td = graph.tensor(t)
        shape = [max(s, 1) for s in td.shape]
        if np.issubdtype(td.dtype, np.integer):
            info = np.iinfo(td.dtype)
            out.append(rng.integers(info.min, info.max + 1, shape).astype(td.dtype))
        else:
            out.append(rng.standard_normal(shape).astype(td.dtype))
    return out


def bench_band_tpu(force_cpu: bool = False) -> dict:
    import jax

    # persistent compilation cache: repeat bench runs skip the (highly
    # variable) XLA compile times of the model set
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import band_tpu as bt

    on_tpu = (not force_cpu) and jax.default_backend() != "cpu"
    flag = bt.DeviceFlag.TPU if on_tpu else bt.DeviceFlag.CPU
    b = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(
            bt.SchedulerType.FIXED_WORKER
            if N_WORKERS == 1
            else bt.SchedulerType.SHORTEST_EXPECTED_LATENCY
        )
        .profile_warmups(2)
        .profile_runs(3)
    )
    for _ in range(max(N_WORKERS, 1)):
        # watchdog: if the tunneled transport wedges one dispatch, fail
        # those requests and keep measuring instead of losing the run
        b.add_worker(bt.WorkerSpec(device=flag, device_ids=(0,),
                                   max_batch=MAX_BATCH,
                                   dispatch_depth=DEPTH,
                                   stuck_timeout_ms=120_000))
    cfg = b.build()
    eng = bt.Engine.create(cfg)
    rng = np.random.default_rng(0)
    mids, feeds = [], []
    device = jax.devices()[0] if on_tpu else jax.devices("cpu")[0]
    for path in model_paths():
        mid = eng.register_model(bt.Model.from_path(path))
        mids.append(mid)
        # stage inputs on-device once: serving-path measurement should not
        # be dominated by this dev environment's tunneled host transfers
        ins = random_inputs(eng.model_record(mid).model.graph, rng)
        from band_tpu.runtime.tensor import StagedInput

        feeds.append([StagedInput(a).stage(device) for a in ins])

    # warmup through the full engine path (also absorbs the transport's
    # pathological first device->host fetch)
    warm = [
        eng.request_async(mids[i % 3], feeds[i % 3]) for i in range(9)
    ]
    eng.wait_all(warm, timeout=120)
    for mid, ins in zip(mids, feeds):
        eng.request_sync(mid, ins, timeout=300)

    def stream(n):
        """Fire n requests in per-model bursts, wait, barrier-fetch the
        last job's output so the clock includes on-chip completion."""
        t0 = time.perf_counter()
        ids = []
        burst = max(8, MAX_BATCH)  # bursts must fill the batching window
        while len(ids) < n:
            m = (len(ids) // burst) % 3
            k = min(burst, n - len(ids))
            ids += eng.request_async_batch([mids[m]] * k, [feeds[m]] * k)
        st = eng.wait_all(ids, timeout=600)
        last = eng.planner.get_finished_job(ids[-1])
        if last is not None and last.final_outputs:
            _ = np.asarray(next(iter(last.final_outputs.values()))).ravel()[0]
        return time.perf_counter() - t0, st

    # the dev transport's dispatch/fetch overheads are unpredictable per
    # call; difference two run lengths so fixed costs cancel
    profiled = {}
    for name, mid in zip(MODELS, mids):
        rec = eng.model_record(mid)
        profiled[name] = {
            str(k): eng.latency_estimator.get_profiled(k)
            for k in rec.subgraph_keys
        }

    t1, st1 = stream(N_REQUESTS)
    t2, st2 = stream(2 * N_REQUESTS)
    dt = t2 - t1
    if dt < 0.05 * t2:
        # differencing degenerated (fixed costs didn't cancel — seen
        # when scheduling interleaves the two runs differently): fall
        # back to the conservative absolute rate of the longer run
        dt = t2 / 2.0
    statuses = st2
    ok1 = sum(1 for v in st1.values() if v == bt.JobStatus.SUCCESS)
    ok2 = sum(1 for v in statuses.values() if v == bt.JobStatus.SUCCESS)
    # correctness spot check: fetch one output per model
    for mid, ins in zip(mids, feeds):
        out = eng.request_sync(mid, ins, timeout=120)
        assert all(np.isfinite(o).all() or o.dtype.kind in "iu" for o in out)
    eng.shutdown()
    return {
        "req_s": N_REQUESTS / dt,
        "ok": ok1 + ok2,
        "total": 3 * N_REQUESTS,
        "secs": dt,
        "platform": "tpu" if on_tpu else "cpu",
        "profiled_subgraph_latency_us": profiled,
    }


def bench_tflite_cpu_baseline(budget_s: float = 20.0) -> float:
    """Reference baseline: same mix through the TFLite interpreter
    (XNNPACK enabled, i.e. the reference's fastest CPU path)."""
    try:
        import tensorflow as tf
    except Exception:
        return -1.0
    rng = np.random.default_rng(0)
    its = []
    for path in model_paths():
        it = tf.lite.Interpreter(model_path=path, num_threads=os.cpu_count())
        it.allocate_tensors()
        feeds = {}
        for d in it.get_input_details():
            dt_, shape = d["dtype"], d["shape"]
            if np.issubdtype(dt_, np.integer):
                info = np.iinfo(dt_)
                feeds[d["index"]] = rng.integers(
                    info.min, info.max + 1, shape
                ).astype(dt_)
            else:
                feeds[d["index"]] = rng.standard_normal(shape).astype(dt_)
        for idx, arr in feeds.items():
            it.set_tensor(idx, arr)
        it.invoke()  # warmup
        its.append(it)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s:
        its[n % 3].invoke()
        n += 1
    return n / (time.perf_counter() - t0)


def _run_tpu_subprocess(timeout_s: float):
    """Run the TPU measurement in a child process so a stalled device
    service cannot wedge the benchmark; returns the result dict or None."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("INNER_RESULT:"):
            return json.loads(line[len("INNER_RESULT:"):])
    return None


def main():
    if "--inner" in sys.argv:
        print("INNER_RESULT:" + json.dumps(bench_band_tpu()), flush=True)
        return
    # must stay under the driver's outer `timeout 1400 python bench.py`
    # so a stalled TPU still yields the CPU-fallback JSON line
    timeout_s = float(os.environ.get("BENCH_TPU_TIMEOUT", "1150"))
    result = _run_tpu_subprocess(timeout_s)
    if result is None:
        # device service stalled: measure the engine on CPU instead and
        # label it so the number is never mistaken for a chip result
        result = bench_band_tpu(force_cpu=True)
        result["platform"] = "cpu_fallback_tpu_stalled"
    baseline = bench_tflite_cpu_baseline()
    vs = result["req_s"] / baseline if baseline > 0 else -1.0
    print(
        json.dumps(
            {
                "metric": "multi_dnn_int8_mix_throughput_1chip",
                "value": round(result["req_s"], 2),
                "unit": "req/s",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "platform": result["platform"],
                    "profiled_subgraph_latency_us": result.get(
                        "profiled_subgraph_latency_us", {}
                    ),
                    "ok": result["ok"],
                    "total": result["total"],
                    "wall_s": round(result["secs"], 3),
                    "baseline_tflite_cpu_req_s": round(baseline, 2),
                    "models": MODELS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
