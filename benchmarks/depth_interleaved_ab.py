"""Interleaved depth A/B: serving rate at dispatch_depth {4, 8, 16}
(max_batch 32), cycling depths round-robin inside ONE process so every
depth samples every transport phase — the sequential sweep's points
were 3.5x apart purely by phase (benchmarks/depth_window_sweep.py).  Medians per
depth over 3 cycles.  Run SOLO on the chip.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np
import jax

import band_tpu as bt
from band_tpu.runtime.tensor import StagedInput

DATA = "/root/reference/band/test/data"
MODELS = [
    f"{DATA}/mobilenet_v2_1.0_224_quant.tflite",
    f"{DATA}/retinaface_mbv2_quant_160.tflite",
    f"{DATA}/ICN_quant.tflite",
]
N = int(os.environ.get("AB_REQUESTS", "3000"))
DEPTHS = [int(x) for x in os.environ.get("AB_DEPTHS", "4,8,16").split(",")]
CYCLES = int(os.environ.get("AB_CYCLES", "3"))
MAXB = int(os.environ.get("AB_MAX_BATCH", "32"))
# round-5: optionally sweep depth UNDER window fusion (each fused
# dispatch consumes co_dispatch records of the depth budget)
CODISPATCH = int(os.environ.get("AB_CODISPATCH", "1"))


def measure_depth(depth: int, device) -> float:
    cfg = (
        bt.RuntimeConfigBuilder()
        .add_scheduler(bt.SchedulerType.FIXED_WORKER)
        .add_worker(bt.WorkerSpec(device=bt.DeviceFlag.TPU,
                                  device_ids=(0,), max_batch=MAXB,
                                  dispatch_depth=depth,
                                  co_dispatch=CODISPATCH,
                                  stuck_timeout_ms=120_000))
        .profile_warmups(1)
        .profile_runs(1)
        .build()
    )
    cfg.compilation_cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    eng = bt.Engine.create(cfg)
    try:
        rng = np.random.default_rng(0)
        mids, feeds = [], []
        for p in MODELS:
            mid = eng.register_model(bt.Model.from_path(p))
            mids.append(mid)
            g = eng.model_record(mid).model.graph
            ins = []
            for t in g.inputs:
                td = g.tensor(t)
                shape = [max(s, 1) for s in td.shape]
                info = np.iinfo(td.dtype)
                arr = rng.integers(info.min, info.max + 1,
                                   shape).astype(td.dtype)
                ins.append(StagedInput(arr).stage(device))
            feeds.append(ins)
        eng.wait_buckets_ready(timeout=900)
        if CODISPATCH > 1:
            eng.warm_co_dispatch(mids, batch=MAXB, timeout=900)
        warm = [eng.request_async(mids[i % 3], feeds[i % 3])
                for i in range(9)]
        eng.wait_all(warm, timeout=300)

        def stream(n):
            t0 = time.perf_counter()
            ids = []
            while len(ids) < n:
                m = (len(ids) // MAXB) % 3
                k = min(MAXB, n - len(ids))
                ids += eng.request_async_batch([mids[m]] * k,
                                               [feeds[m]] * k)
            eng.wait_all(ids, timeout=600)
            last = eng.planner.get_finished_job(ids[-1])
            if last is not None and last.final_outputs:
                _ = np.asarray(
                    next(iter(last.final_outputs.values()))).ravel()[0]
            return time.perf_counter() - t0

        stream(max(N // 4, 256))  # warm the stream path
        t1 = stream(N)
        t2 = stream(2 * N)
        dt = t2 - t1
        if dt < 0.05 * t2:
            dt = t2 / 2.0
        return N / dt
    finally:
        eng.shutdown()


def main():
    device = jax.devices()[0]
    results = {d: [] for d in DEPTHS}
    for c in range(CYCLES):
        for d in DEPTHS:
            r = measure_depth(d, device)
            results[d].append(round(r, 1))
            print(f"cycle {c} depth {d}: {r:.1f} req/s",
                  file=sys.stderr, flush=True)
    out = {
        str(d): {"runs": v, "median": statistics.median(v)}
        for d, v in results.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
